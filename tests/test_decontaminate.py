"""Benchmark-contamination detection (operators/decontaminate.py).

Brute-force Python oracle over hand-built corpora, plus the edge cases
the driver fixture can't hit: docs too short to form an n-gram, a
benchmark with zero overlap, and threshold boundary behavior.
"""

import pytest
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.decontaminate import (
    contamination_stats)


def _brute(docs, bench, n, threshold):
    def grams(text):
        t = text.split(" ")
        return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}
    bg = set()
    for b in bench:
        bg |= grams(b)
    out = {}
    for did, text in docs:
        g = grams(text)
        hits = len(g & bg)
        frac = round(hits / len(g), 6) if g else 0.0
        out[did] = (len(g), hits, frac, int(frac >= threshold))
    return out


def _run(spark, docs, bench, n=3, threshold=0.5):
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    bdf = spark.createDataFrame([(t,) for t in bench], "text string")
    got = {r["doc_id"]: (r["n_grams"], r["n_contam"], r["contam_frac"],
                         r["is_contaminated"])
           for r in contamination_stats(ddf, bdf, n=n,
                                        threshold=threshold).collect()}
    assert got == _brute(docs, bench, n, threshold)
    return got


def test_overlap_counts_match_brute_force(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a completely different sentence with no shared grams"),
        (3, "quick brown fox jumps again and again and again"),
        (4, "the quick brown fox"),
    ]
    bench = ["the quick brown fox jumps", "lazy dog sat"]
    got = _run(spark, docs, bench, n=3, threshold=0.3)
    assert got[2][1] == 0 and got[2][3] == 0
    assert got[1][1] > 0 and got[4][3] == 1


def test_short_docs_kept_with_zero_grams(spark):
    docs = [(1, "one two"), (2, "solo"), (3, "a b c d")]
    got = _run(spark, docs, ["a b c"], n=3, threshold=0.5)
    assert got[1] == (0, 0, 0.0, 0)
    assert got[2] == (0, 0, 0.0, 0)
    assert got[3][0] == 2


def test_zero_overlap_benchmark(spark):
    docs = [(i, f"w{i} x{i} y{i} z{i}") for i in range(10)]
    got = _run(spark, docs, ["totally unrelated benchmark text"], n=2,
               threshold=0.1)
    assert all(v[1] == 0 and v[3] == 0 for v in got.values())


def test_threshold_boundary_inclusive(spark):
    # doc has exactly 4 distinct 2-grams, 2 contaminated -> frac 0.5
    docs = [(1, "a b c d e")]
    bench = ["a b", "c d"]
    got = _run(spark, docs, bench, n=2, threshold=0.5)
    assert got[1] == (4, 2, 0.5, 1)
    got = _run(spark, docs, bench, n=2, threshold=0.500001)
    assert got[1][3] == 0


def test_duplicate_grams_counted_once(spark):
    # repeated n-grams in the doc must not inflate counts (distinct set)
    docs = [(1, "a b a b a b")]
    got = _run(spark, docs, ["a b"], n=2, threshold=0.1)
    # distinct 2-grams: {"a b", "b a"} -> 2 total, 1 contaminated
    assert got[1] == (2, 1, 0.5, 1)


def test_plan_is_broadcast_and_single_agg(spark):
    ddf = spark.createDataFrame([(1, "a b c d e f g")],
                                "doc_id long, text string")
    bdf = spark.createDataFrame([("a b c",)], "text string")
    plan = contamination_stats(ddf, bdf, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
