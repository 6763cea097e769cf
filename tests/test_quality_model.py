"""Model-based quality scoring (operators/quality.py).

Brute-force Python replay of the feature extraction + sigmoid, and the
plan-shape guarantee the 100 TB story rests on: scoring is one
map-side projection — no exchange, no Python nodes.
"""

import math
import re

import pytest

from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.quality import (
    QUALITY_BIAS, QUALITY_WEIGHTS, STOPWORDS, quality_classifier)


def _brute(doc):
    t = doc.lower().split(" ")
    n = len(t)
    feats = {
        "log_tokens": round(math.log(n + 1.0), 6),
        "type_token_ratio": round(len(set(t)) / max(n, 1), 6),
        "stopword_ratio": round(
            sum(1 for x in t if x in STOPWORDS) / max(n, 1), 6),
        "digit_ratio": round(
            len(re.sub(r"[^0-9]", "", doc)) / max(len(doc), 1), 6),
        "punct_ratio": round(
            len(re.sub(r"[^.,;:!?]", "", doc)) / max(len(doc), 1), 6),
    }
    z = QUALITY_BIAS + sum(feats[k] * w for k, w in
                           QUALITY_WEIGHTS.items())
    score = round(1.0 / (1.0 + math.exp(-z)), 6)
    return feats, score


def test_scores_match_brute_force(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog near the barn"),
        (2, "buy now 555-1234 call 555-9999 win 1000000 dollars !!!!"),
        (3, "a a a a a a a a a a a a"),
        (4, "short"),
        (5, "this is a readable sentence with a normal mix of common "
            "words and it keeps going for a while to gain length ."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            quality_classifier(df).collect()}
    for did, text in docs:
        feats, score = _brute(text)
        r = rows[did]
        for k, v in feats.items():
            assert abs(r[k] - v) < 1e-9, (did, k, r[k], v)
        assert abs(r["quality_score"] - score) < 1e-9
        assert r["keep"] == int(score >= 0.5)


def test_spam_scores_below_prose(spark):
    df = spark.createDataFrame(
        [(1, "this is a readable sentence with a normal mix of common "
             "words that keeps going for a while and reads like prose"),
         (2, "1234 5678 9999 0000 1111 2222 3333 4444 5555 6666")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["quality_score"]
           for r in quality_classifier(df).collect()}
    assert got[1] > got[2]


def test_plan_is_single_mapside_projection(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = quality_classifier(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    for bad in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert bad not in plan


def test_top_fraction_by_group(spark):
    from osc_geo_h3grid_srv_spark.operators.quality import (
        top_fraction_by_group)
    rows = [(i, "a", float(i)) for i in range(10)] + \
           [(100 + i, "b", 5.0) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, g string, s double")
    # group a: 10 rows, frac 0.25 -> ceil(2.5)=3 kept: scores 9,8,7
    # group b: 3 equal scores -> ceil(0.75)=1 kept: tie -> lowest id
    kept = {(r["g"], r["doc_id"]) for r in
            top_fraction_by_group(df, 0.25, "g", "s").collect()}
    assert kept == {("a", 9), ("a", 8), ("a", 7), ("b", 100)}
    # frac=1.0 keeps everything; helper columns dropped
    out = top_fraction_by_group(df, 1.0, "g", "s")
    assert out.count() == 13
    assert set(out.columns) == {"doc_id", "g", "s"}
    # invalid fraction rejected
    import pytest
    with pytest.raises(ValueError):
        top_fraction_by_group(df, 0.0, "g", "s")


def test_top_fraction_approx_matches_exact_within_tolerance(spark):
    # scale-path parity (VERDICT r3 Next #7): at high sketch accuracy
    # the approx threshold selection agrees with the exact rank form on
    # distinct scores; with ties it is a deterministic superset.
    from osc_geo_h3grid_srv_spark.operators.quality import (
        top_fraction_by_group, top_fraction_by_group_approx)
    rows = [(i, "a", float((i * 37) % 1000)) for i in range(1000)] + \
           [(10_000 + i, "b", float((i * 11) % 500)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, g string, s double")
    for frac in (0.25, 0.5, 0.1):
        exact = {(r["g"], r["doc_id"]) for r in
                 top_fraction_by_group(df, frac, "g", "s").collect()}
        approx = {(r["g"], r["doc_id"]) for r in
                  top_fraction_by_group_approx(
                      df, frac, "g", "s", accuracy=100_000).collect()}
        # tolerance band: within eps*|group| of the exact selection
        sym = exact ^ approx
        assert len(sym) <= max(2, int(0.01 * len(exact))), \
            (frac, len(exact), len(approx), len(sym))
    # frac=1.0 keeps everything, helper column dropped
    out = top_fraction_by_group_approx(df, 1.0, "g", "s")
    assert out.count() == 1500
    assert set(out.columns) == {"doc_id", "g", "s"}
    # every non-empty group keeps >= 1 row even at tiny frac
    tiny = top_fraction_by_group_approx(df, 0.001, "g", "s")
    gs = {r["g"] for r in tiny.select("g").distinct().collect()}
    assert gs == {"a", "b"}
    import pytest
    with pytest.raises(ValueError):
        top_fraction_by_group_approx(df, 0.0, "g", "s")


def test_top_fraction_approx_plan_has_no_window(spark):
    # plan audit (the point of the approx mode): no full-group window
    # sort — one sketch aggregate + broadcast join + codegen filter
    from osc_geo_h3grid_srv_spark.operators.quality import (
        top_fraction_by_group_approx)
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0)], "doc_id long, g string, s double")
    plan = top_fraction_by_group_approx(df, 0.5, "g", "s") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "rangepartitioning" not in plan.lower()
    assert "BroadcastHashJoin" in plan
    for bad in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                "CartesianProduct"):
        assert bad not in plan


def _brute_gopher(docs):
    import re
    stop = ("the", "be", "to", "of", "and", "that", "have", "with")
    out = {}
    for did, text in docs:
        toks = text.split(" ")
        nw = len(toks)
        nzw = max(nw, 1)
        ml = round(sum(len(x) for x in toks) / nzw, 6)
        sym = round((text.count("#") + text.count("…")) / nzw, 6)
        al = round(sum(1 for x in toks
                       if re.search("[a-zA-Z]", x)) / nzw, 6)
        lo = text.lower().split(" ")
        st = sum(1 for s in stop if s in lo)
        flags = (50 <= nw <= 100000, 3.0 <= ml <= 10.0, sym <= 0.1,
                 al >= 0.8, st >= 2)
        out[did] = (nw, ml, sym, al, st, *flags, all(flags))
    return out


def test_gopher_flags_match_brute(spark):
    from osc_geo_h3grid_srv_spark.operators.quality import (
        gopher_quality_flags)
    docs = [
        (1, " ".join(["the to of and word okay fine"] * 10)),  # passes
        (2, "too short to pass the word count rule"),
        (3, " ".join(["#!?"] * 60)),                # symbol+alpha fail
        (4, " ".join(["supercalifragilistic"] * 60)),  # mean len fail
        (5, " ".join(["zz qq ww ee rr"] * 12)),     # no stopwords
        (6, " ".join(["123 456"] * 30)),            # alpha fail
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["mean_word_len"],
                         r["symbol_ratio"], r["alpha_word_frac"],
                         r["n_stop_hits"], r["pass_word_count"],
                         r["pass_mean_len"], r["pass_symbol"],
                         r["pass_alpha"], r["pass_stopwords"],
                         r["gopher_pass"])
           for r in gopher_quality_flags(df).collect()}
    want = _brute_gopher(docs)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        for gi, wi in zip(got[d][1:5], want[d][1:5]):
            assert gi == pytest.approx(wi, abs=1e-9), d
        assert got[d][5:] == want[d][5:], d
    assert got[1][-1] and not any(got[d][-1] for d in (2, 3, 4, 5, 6))


def test_gopher_plan_is_mapside(spark):
    from osc_geo_h3grid_srv_spark.operators.quality import (
        gopher_quality_flags)
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = gopher_quality_flags(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    for bad in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert bad not in plan
