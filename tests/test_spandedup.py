"""Span-level k-gram dedup coverage (operators/spandedup.py).

Hand-computed fixture: with k=3 and min_docs=2, only grams shared by
two or more DISTINCT docs mark positions; intra-doc repeats don't.
"""

import pandas as pd
import pytest

from osc_geo_h3grid_srv_spark.operators.spandedup import span_dedup_stats


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "text"]))


def test_hand_computed_coverage(spark):
    # doc 0 and 1 share the 5-token prefix "a b c d e":
    #   k=3 grams of the prefix: (a b c), (b c d), (c d e) -> 3 dup
    #   positions in each doc.
    # doc 0: "a b c d e x y"   -> 5 grams, 3 dup -> cov 0.6
    # doc 1: "a b c d e p q r" -> 6 grams, 3 dup -> cov 0.5
    # doc 2: unique text, 4 grams, 0 dup -> cov 0.0
    # doc 3: "t t t t" intra-doc repeat only -> 2 grams ("t t t" twice
    #   in the SAME doc) -> NOT duplicated (needs 2 distinct docs).
    d = _df(spark, [
        (0, "en", "a b c d e x y"),
        (1, "en", "a b c d e p q r"),
        (2, "en", "u v w x y z"),
        (3, "en", "t t t t"),
    ])
    out = span_dedup_stats(d, k=3, min_docs=2).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["n_docs"] == 4
    assert r["total_grams"] == 5 + 6 + 4 + 2
    assert r["dup_grams"] == 3 + 3
    assert r["avg_dup_cov"] == pytest.approx(
        (0.6 + 0.5 + 0.0 + 0.0) / 4, abs=1e-6)


def test_short_docs_excluded_and_grouping(spark):
    # < k tokens -> no grams -> excluded entirely; groups roll up
    # independently.
    d = _df(spark, [
        (0, "en", "only two"),            # 2 tokens < k=3: excluded
        (1, "en", "one two three four"),  # 2 grams, no dup
        (2, "de", "eins zwei drei"),      # 1 gram
        (3, "de", "eins zwei drei"),      # same gram -> both dup
    ])
    out = {r["lang"]: r.asDict()
           for r in span_dedup_stats(d, k=3, min_docs=2).collect()}
    assert out["en"]["n_docs"] == 1
    assert out["en"]["dup_grams"] == 0
    assert out["de"]["n_docs"] == 2
    assert out["de"]["total_grams"] == 2
    assert out["de"]["dup_grams"] == 2
    assert out["de"]["avg_dup_cov"] == pytest.approx(1.0)


def test_stride_samples_positions(spark):
    # stride=2 keeps positions 0 and 2 of doc 0's 3 grams; position 1's
    # gram ("b c d") is never emitted, so totals count only sampled
    # positions on BOTH sides of the ratio.
    d = _df(spark, [
        (0, "en", "a b c d e"),
        (1, "en", "a b c d e"),
    ])
    out = span_dedup_stats(d, k=3, min_docs=2, stride=2).collect()
    r = out[0].asDict()
    # n_grams column still reports the full span count (denominator
    # semantics documented: coverage of *sampled* positions uses the
    # unsampled total, a conservative lower bound)
    assert r["total_grams"] == 6
    assert r["dup_grams"] == 4  # positions 0 and 2 in each doc


def test_removal_keep_first_semantics(spark):
    # k=3, min_docs=2. docs 0 and 1 share the 5-token prefix
    # "a b c d e"; doc 0 (min doc_id) is the winner of all three shared
    # grams and keeps its text verbatim; doc 1 loses the union of the
    # three gram spans = positions 0..4 and keeps only its tail.
    from osc_geo_h3grid_srv_spark.operators.spandedup import (
        remove_duplicated_spans)
    d = _df(spark, [
        (0, "en", "a b c d e x y"),
        (1, "en", "a b c d e p q r"),
        (2, "en", "u v w x y z"),
        (3, "en", "hi"),               # < k tokens: untouched
    ])
    out = {r["doc_id"]: r.asDict()
           for r in remove_duplicated_spans(d, k=3, min_docs=2).collect()}
    assert len(out) == 4
    assert out[0]["clean_text"] == "a b c d e x y"
    assert out[0]["n_removed"] == 0
    assert out[1]["clean_text"] == "p q r"
    assert out[1]["n_removed"] == 5
    assert out[1]["n_tokens"] == 8
    assert out[2]["clean_text"] == "u v w x y z"
    assert out[3]["clean_text"] == "hi"
    assert out[3]["n_removed"] == 0


def test_removal_overlapping_wins_and_losses(spark):
    # A doc can WIN one gram and LOSE an overlapping one: the union of
    # losing spans is removed regardless of wins.
    #   doc 0: "a b c x"   doc 1: "a b c y"   doc 2: "z a b c y"
    # gram "a b c": docs {0,1,2}, winner 0 -> docs 1,2 cut its span.
    # gram "b c y": docs {1,2}, winner 1 -> doc 2 cuts positions 2..4.
    # doc 1 loses (a b c)=pos 0..2 even though it wins (b c y).
    # doc 2 loses (a b c)=pos 1..3 and (b c y)=pos 2..4 -> keeps "z".
    from osc_geo_h3grid_srv_spark.operators.spandedup import (
        remove_duplicated_spans)
    d = _df(spark, [
        (0, "en", "a b c x"),
        (1, "en", "a b c y"),
        (2, "en", "z a b c y"),
    ])
    out = {r["doc_id"]: r.asDict()
           for r in remove_duplicated_spans(d, k=3, min_docs=2).collect()}
    assert out[0]["clean_text"] == "a b c x"
    assert out[1]["clean_text"] == "y"
    assert out[1]["n_removed"] == 3
    assert out[2]["clean_text"] == "z"
    assert out[2]["n_removed"] == 4


def test_removal_lowercases_tokens(spark):
    # tokenization is lowercase-whitespace (shared with the stats op):
    # "A B C" and "a b c" are the same gram; rebuilt text is lowercase.
    from osc_geo_h3grid_srv_spark.operators.spandedup import (
        remove_duplicated_spans)
    d = _df(spark, [
        (0, "en", "A B C x"),
        (1, "en", "a b c y"),
    ])
    out = {r["doc_id"]: r.asDict()
           for r in remove_duplicated_spans(d, k=3, min_docs=2).collect()}
    assert out[0]["clean_text"] == "a b c x"
    assert out[1]["clean_text"] == "y"
