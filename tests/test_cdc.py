"""Content-defined chunking (operators/cdc.py): scalar-loop parity,
edit resynchronization, reassembly identity, dedup ledger."""

import hashlib

import numpy as np
import pytest

from osc_geo_h3grid_srv_spark.operators import cdc


def _brute_ends(text, mask_bits):
    """per-character scalar Gear loop — the definitional recurrence."""
    g = cdc.gear_table()
    h = 0
    ends = []
    for i, c in enumerate(text):
        h = ((h << 1) + int(g[ord(c) % 256])) & 0xFFFFFFFF
        if h & ((1 << mask_bits) - 1) == 0:
            ends.append(i)
    if not ends or ends[-1] != len(text) - 1:
        ends.append(len(text) - 1)
    return ends


def _words(rs, n):
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    return " ".join(vocab[rs.randint(0, len(vocab))] for _ in range(n))


def test_vectorized_matches_scalar_recurrence():
    rs = np.random.RandomState(5)
    for mb in (3, 5, 8):
        for n in (1, 5, 31, 32, 33, 200, 700):
            text = _words(rs, max(n // 5, 1))[:n]
            codes = np.frombuffer(text.encode("utf-32-le"),
                                  np.uint32) % np.uint32(256)
            got = cdc._chunk_positions(codes, mb).tolist()
            assert got == _brute_ends(text, mb), (mb, n)


def test_chunks_reassemble_and_resync(spark):
    rs = np.random.RandomState(9)
    base = _words(rs, 120)  # ~700 chars
    # flip one character in the middle
    mid = len(base) // 2
    edited = base[:mid] + ("X" if base[mid] != "X" else "Y") \
        + base[mid + 1:]
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string")
    ch = cdc.cdc_chunks(df, mask_bits=5).toPandas()
    # chunks reassemble each document exactly
    for did, text in ((1, base), (2, edited)):
        rows = ch[ch.doc_id == did].sort_values("chunk_idx")
        assert (rows.chunk_start.iloc[0] == 1
                and rows.chunk_len.sum() == len(text))
        joined = "".join(
            text[s - 1:s - 1 + ln]
            for s, ln in zip(rows.chunk_start, rows.chunk_len))
        assert joined == text
        for s, ln, hx in zip(rows.chunk_start, rows.chunk_len,
                             rows.chunk_hash):
            assert hashlib.md5(
                text[s - 1:s - 1 + ln].encode()).hexdigest() == hx
    # content-defined resync: the two docs share most chunk hashes —
    # only the chunks overlapping the edit (plus <=1 window of drift)
    # differ. Fixed-size chunking would share NOTHING after the edit
    # if lengths shifted.
    h1 = set(ch[ch.doc_id == 1].chunk_hash)
    h2 = set(ch[ch.doc_id == 2].chunk_hash)
    shared = len(h1 & h2)
    assert shared >= max(len(h1), len(h2)) - 4
    assert h1 != h2  # the edited chunk itself differs


def test_dedup_stats_ledger(spark):
    df = spark.createDataFrame(
        [(1, "aaaa bbbb"), (2, "aaaa bbbb"), (3, "cccc dddd")],
        "doc_id long, text string")
    ch = cdc.cdc_chunks(df, mask_bits=2)
    stats = cdc.cdc_dedup_stats(ch).toPandas()
    dup = stats[stats.n_copies > 1]
    # identical docs 1/2 must share at least one cross-doc dup chunk
    # (repeated runs WITHIN a doc may also dup with n_docs == 1)
    assert (dup.n_docs >= 2).any()
    assert (dup.saved_chars
            == (dup.n_copies - 1) * dup.chunk_len).all()
    # doc 3 shares nothing with docs 1/2
    total = stats.n_copies.sum()
    n_chunks = ch.count()
    assert total == n_chunks


def test_empty_and_null_texts(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "xyz")], "doc_id long, text string")
    ch = cdc.cdc_chunks(df).toPandas()
    assert set(ch.doc_id) == {3}


def test_mask_bits_domain(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="mask_bits"):
        cdc.cdc_chunks(df, mask_bits=0)
    with pytest.raises(ValueError, match="mask_bits"):
        cdc.cdc_chunks(df, mask_bits=21)
