"""Chunking + sequence packing (operators/packing.py)."""

import pytest
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.packing import (
    chunk_documents, pack_sequences)


def test_chunk_windows_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_id"], r["chunk_start"], r["n_chunk_tokens"],
         r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=4,
                                 overlap=1).collect())
    # step 3: starts 0,3,6,9 — last is a 1-token tail
    assert [(c, s, n) for c, s, n, _ in rows] == [
        (0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1)]
    assert rows[0][3] == "w0 w1 w2 w3"
    assert rows[1][3] == "w3 w4 w5 w6"
    assert rows[3][3] == "w9"


def test_chunk_coverage_property(spark):
    # every token position is covered by at least one chunk
    text = " ".join(f"t{i}" for i in range(57))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    covered = set()
    for r in chunk_documents(df, chunk_tokens=16, overlap=4).collect():
        covered |= set(range(r["chunk_start"],
                             r["chunk_start"] + r["n_chunk_tokens"]))
    assert covered == set(range(57))


def test_chunk_overlap_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=-1)


def test_chunk_plan_has_no_exchange(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_packing_bins_by_first_token(spark):
    # shard 0: docs of 60/50/20 tokens, seq_len 100:
    #   doc 0 starts at 0 -> bin 0; doc 2 starts at 60 -> bin 0;
    #   doc 4 starts at 110 -> bin 1
    rows = [(0, 0, 60), (0, 2, 50), (0, 4, 20),
            (1, 1, 100), (1, 3, 1)]
    df = spark.createDataFrame(rows,
                               "shard long, doc_id long, n_tokens long")
    got = {(r["shard"], r["bin"]): (r["n_docs"], r["tokens_total"])
           for r in pack_sequences(df, seq_len=100).collect()}
    assert got == {(0, 0): (2, 110), (0, 1): (1, 20),
                   (1, 0): (1, 100), (1, 1): (1, 1)}


def test_packing_boundary_doc_starts_next_bin(spark):
    # doc whose first token lands exactly at seq_len goes to bin 1
    df = spark.createDataFrame([(0, 0, 100), (0, 1, 5)],
                               "shard long, doc_id long, n_tokens long")
    got = {r["bin"]: r["n_docs"]
           for r in pack_sequences(df, seq_len=100).collect()}
    assert got == {0: 1, 1: 1}


def test_packing_deterministic_across_runs(spark):
    rows = [(i % 4, i, 10 + (i * 7) % 50) for i in range(200)]
    df = spark.createDataFrame(rows,
                               "shard long, doc_id long, n_tokens long")
    a = sorted(map(tuple, pack_sequences(df, seq_len=256).collect()))
    b = sorted(map(tuple, pack_sequences(
        df.repartition(13), seq_len=256).collect()))
    assert a == b


def test_assign_shards_deterministic_partition_invariant(spark):
    import hashlib
    from osc_geo_h3grid_srv_spark.operators.packing import assign_shards
    rows = [(i, f"d{i}") for i in range(200)]
    d1 = spark.createDataFrame(rows, "doc_id long, text string")
    d8 = spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(8)
    a = sorted((r["doc_id"], r["shard"], r["pos"])
               for r in assign_shards(d1, 4).collect())
    b = sorted((r["doc_id"], r["shard"], r["pos"])
               for r in assign_shards(d8, 4).collect())
    assert a == b  # layout-invariant and re-run stable
    # brute-force replay of the assignment rule
    def key(i):
        return hashlib.md5(f"shuf1|{i}".encode()).hexdigest()
    want = {}
    for i, _ in rows:
        want[i] = int(key(i)[:8], 16) % 4
    per = {}
    for doc, shard, pos in a:
        assert shard == want[doc]
        per.setdefault(shard, []).append((pos, doc))
    for shard, lst in per.items():
        lst.sort()
        # positions dense 0..n-1 and ordered by md5 digest
        assert [p for p, _ in lst] == list(range(len(lst)))
        docs_by_hash = sorted((key(d), d) for _, d in lst)
        assert [d for _, d in docs_by_hash] == [d for _, d in lst]


def test_assign_shards_salt_and_validation(spark):
    import pytest
    from osc_geo_h3grid_srv_spark.operators.packing import assign_shards
    d = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    a = {r["doc_id"]: (r["shard"], r["pos"])
         for r in assign_shards(d, 4, salt="s1").collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in assign_shards(d, 4, salt="s2").collect()}
    assert any(a[i] != b[i] for i in a)  # salt redraws the order
    with pytest.raises(ValueError):
        assign_shards(d, 0)
