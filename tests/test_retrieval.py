"""BM25 (operators/retrieval.py) vs a hand-rolled reference on a tiny
corpus, plus ranking-semantics edge cases."""

import math

from osc_geo_h3grid_srv_spark.operators.retrieval import bm25_topk


def _ref_bm25(corpus, terms, k1=1.2, b=0.75):
    n = len(corpus)
    toks = {d: t.lower().split(" ") for d, t in corpus.items()}
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {q: sum(1 for v in toks.values() if q in v) for q in terms}
    out = {}
    for d, v in toks.items():
        s, m = 0.0, 0
        for q in terms:
            tf = v.count(q)
            if not tf:
                continue
            m += 1
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(v) / avgdl))
        if m:
            out[d] = (round(s, 6), m)
    return out


def test_bm25_matches_reference(spark):
    corpus = {
        0: "spark runs fast spark scales",
        1: "hash join and hash agg",
        2: "spark hash window functions",
        3: "nothing relevant here at all",
        4: "window window window",
        5: "spark",
    }
    terms = ["spark", "hash", "window"]
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string")
    got = [(r["doc_id"], r["score"], r["n_matched"])
           for r in bm25_topk(df, terms, k=10).collect()]
    ref = _ref_bm25(corpus, terms)
    # doc 3 matches nothing -> absent
    assert [d for d, _, _ in got] == sorted(
        ref, key=lambda d: (-ref[d][0], d))
    for d, s, m in got:
        assert (s, m) == ref[d], d


def test_bm25_topk_cutoff_and_rare_term_weight(spark):
    # a rare term must outscore a common one at equal tf/dl
    corpus = {i: "common filler words here" for i in range(20)}
    corpus[100] = "rare common filler here"
    for i in range(21, 30):
        corpus[i] = "common stuff and more"
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string")
    got = bm25_topk(df, ["rare", "common"], k=3).collect()
    assert got[0]["doc_id"] == 100  # the rare-term doc ranks first
    assert len(got) == 3


def test_deterministic_sample_properties(spark):
    from osc_geo_h3grid_srv_spark.operators.sampling import (
        deterministic_sample, stratified_mix)
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    a1 = {r["id"] for r in deterministic_sample(df, 0.3, "id").collect()}
    a2 = {r["id"] for r in deterministic_sample(df, 0.3, "id").collect()}
    assert a1 == a2  # deterministic across runs
    # ~binomial(2000, 0.3): allow 5 sigma
    assert abs(len(a1) - 600) < 5 * (2000 * 0.3 * 0.7) ** 0.5
    # nested: smaller fraction is a subset of the larger, same salt
    a_small = {r["id"]
               for r in deterministic_sample(df, 0.1, "id").collect()}
    assert a_small <= a1
    # different salt draws an independent (different) sample
    b1 = {r["id"]
          for r in deterministic_sample(df, 0.3, "id", salt="x").collect()}
    assert b1 != a1
    # keep-all / keep-none edges
    assert len(deterministic_sample(df, 1.0, "id").collect()) == 2000
    assert len(deterministic_sample(df, 0.0, "id").collect()) == 0


def test_stratified_mix_drops_unlisted_strata(spark):
    from osc_geo_h3grid_srv_spark.operators.sampling import stratified_mix
    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "xx"))
            for i in range(900)]
    df = spark.createDataFrame(rows, "id long, lang string")
    out = stratified_mix(df, "lang", {"en": 1.0, "de": 0.5}, "id")
    got = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert got == {"en", "de"}  # 'xx' dropped
    n_en = out.filter("lang = 'en'").count()
    assert n_en == 300  # fraction 1.0 keeps every en row


def test_build_postings_gaps_and_ids(spark):
    from osc_geo_h3grid_srv_spark.operators.retrieval import build_postings
    d = spark.createDataFrame(
        [(3, "a b a"), (10, "a c"), (25, "a b")],
        "doc_id long, text string")
    got = {r["term"]: r.asDict()
           for r in build_postings(d, encode="gaps").collect()}
    # 'a': docs 3(tf2),10,25 -> gaps 3, 7, 15
    assert got["a"]["postings"] == "3:2,7:1,15:1"
    assert (got["a"]["df"], got["a"]["total_tf"]) == (3, 4)
    # 'b': docs 3, 25 -> gaps 3, 22
    assert got["b"]["postings"] == "3:1,22:1"
    # singleton list: absolute id only
    assert got["c"]["postings"] == "10:1"
    ids = {r["term"]: r["postings"]
           for r in build_postings(d, encode="ids").collect()}
    assert ids["a"] == "3:2,10:1,25:1"
    # min_df prunes the hapax tail
    vocab = {r["term"]
             for r in build_postings(d, min_df=2).collect()}
    assert vocab == {"a", "b"}
    import pytest
    with pytest.raises(ValueError):
        build_postings(d, encode="varint")


def test_build_postings_gap_roundtrip(spark):
    # cumulative sum of gaps reconstructs the absolute ids exactly
    from osc_geo_h3grid_srv_spark.operators.retrieval import build_postings
    rows = [(i * 7 + 1, "x y" if i % 3 else "x") for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    for r in build_postings(d, encode="gaps").collect():
        acc, docs = 0, []
        for p in r["postings"].split(","):
            gap, tf = p.split(":")
            acc += int(gap)
            docs.append(acc)
        assert docs == sorted(docs)
        assert len(docs) == r["df"]
        want = sorted(i * 7 + 1 for i in range(40)
                      if r["term"] in rows[i][1].split())
        assert docs == want


def test_phrase_search_hand_cases(spark):
    from osc_geo_h3grid_srv_spark.operators.retrieval import phrase_search
    d = spark.createDataFrame([
        (1, "a b c a b"),        # 'a b' at 0 and 3
        (2, "b a b a"),          # 'a b' at 1
        (3, "c c c"),            # no hit
        (4, "A B x"),            # case-folded hit at 0
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_hits"], r["first_pos"])
           for r in phrase_search(d, ["a", "b"]).collect()}
    assert got == {1: (2, 0), 2: (1, 1), 4: (1, 0)}


def test_phrase_search_repeated_term_and_overlap(spark):
    from osc_geo_h3grid_srv_spark.operators.retrieval import phrase_search
    d = spark.createDataFrame([
        (1, "t t t t"),    # 't t' at 0,1,2 (overlapping occurrences)
        (2, "t x t"),      # none
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_hits"], r["first_pos"])
           for r in phrase_search(d, ["t", "t"]).collect()}
    assert got == {1: (3, 0)}
    # three-term phrase spanning the repeated token
    got3 = {r["doc_id"]: (r["n_hits"], r["first_pos"])
            for r in phrase_search(d, ["t", "t", "t"]).collect()}
    assert got3 == {1: (2, 0)}


def test_phrase_search_single_term_and_validation(spark):
    import pytest
    from osc_geo_h3grid_srv_spark.operators.retrieval import phrase_search
    d = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    got = phrase_search(d, ["x"]).collect()[0]
    assert (got["n_hits"], got["first_pos"]) == (2, 0)
    with pytest.raises(ValueError):
        phrase_search(d, [])


def test_normalize_text_expr_folds(spark):
    from pyspark.sql import functions as F
    from osc_geo_h3grid_srv_spark.functions.text import (
        normalize_text_expr)
    cases = [
        (1, "\u2018a\u2019 \u201cb\u201d", "'a' \"b\""),
        (2, "x\u2013y\u2014z\u2212w", "x-y-z-w"),
        (3, "a\u00a0b\u2002c\u3000d", "a b c d"),
        (4, "z\u200bw\u200c\ufeffv\u00adu", "zwvu"),
        (5, "end\u2026", "end..."),
        (6, "ctl\u0007\u0001x", "ctlx"),
        (7, "  a \t\r\n b  ", "a b"),
        (8, "plain ascii stays", "plain ascii stays"),
    ]
    df = spark.createDataFrame([(i, s) for i, s, _ in cases],
                               "id long, t string")
    got = {r["id"]: r["c"] for r in df.select(
        "id", normalize_text_expr("t").alias("c")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, repr(got[i]), repr(want))


def test_weighted_sample_by_group_properties(spark):
    """A-ES weighted sampling: exact k per group, determinism across
    re-runs, weight monotonicity in aggregate (heavier rows win far
    more often across independent salts), zero/negative weights never
    selected."""
    import hashlib
    import math

    from osc_geo_h3grid_srv_spark.operators.sampling import (
        weighted_sample_by_group)
    rows = [(i, "g", 100.0 if i < 5 else 1.0) for i in range(50)]
    rows += [(100 + i, "h", 1.0) for i in range(3)]  # group smaller than k
    rows += [(200, "z", 0.0), (201, "z", -2.0), (202, "z", 5.0)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    out = weighted_sample_by_group(df, 4, "lang", "w", "doc_id")
    got = {(r["lang"], r["doc_id"]): r["sample_rank"]
           for r in out.collect()}
    by_g = sorted(d for (g, d) in got if g == "g")
    assert len(by_g) == 4
    assert len([1 for (g, _) in got if g == "h"]) == 3  # all of small grp
    assert [(d) for (g, d) in got if g == "z"] == [202]  # w<=0 dropped
    # deterministic re-run
    got2 = {(r["lang"], r["doc_id"]): r["sample_rank"]
            for r in weighted_sample_by_group(
                df, 4, "lang", "w", "doc_id").collect()}
    assert got == got2
    # python replica: same winners (engine parity of the exact formula)
    def key(i, w, salt="wrs1"):
        h = int(hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8], 16)
        return round(math.log((h + 1) / 16 ** 8) / w, 9)
    want = sorted(((i, w) for i, g, w in rows if g == "g"),
                  key=lambda t: (-key(t[0], t[1]), t[0]))[:4]
    assert by_g == sorted(i for i, _ in want)
    # heavy rows dominate across 30 independent salts
    heavy_wins = 0
    for s in range(30):
        sel = {r["doc_id"] for r in weighted_sample_by_group(
            df.filter("lang = 'g'"), 4, "lang", "w", "doc_id",
            salt=f"s{s}").collect()}
        heavy_wins += len(sel & {0, 1, 2, 3, 4})
    assert heavy_wins > 30 * 4 * 0.6  # 100x weight ≈ always wins


class TestRRF:
    def test_hand_computed_fusion(self, spark):
        from osc_geo_h3grid_srv_spark.operators.retrieval import rrf_fuse
        # system 1 ranks: a(1) b(2) c(3); system 2 ranks: b(1) a(2) d(3)
        s1 = spark.createDataFrame(
            [("a", 3.0), ("b", 2.0), ("c", 1.0)], ["doc_id", "score"])
        s2 = spark.createDataFrame(
            [("b", 9.0), ("a", 8.0), ("d", 7.0)], ["doc_id", "score"])
        got = {r.doc_id: (r.rrf_score, r.n_systems)
               for r in rrf_fuse([s1, s2], k0=60, k=10).collect()}
        assert got == {
            "a": (round(1 / 61 + 1 / 62, 6), 2),
            "b": (round(1 / 62 + 1 / 61, 6), 2),
            "c": (round(1 / 63, 6), 1),
            "d": (round(1 / 63, 6), 1),
        }

    def test_rank_ties_break_by_id(self, spark):
        from osc_geo_h3grid_srv_spark.operators.retrieval import rrf_fuse
        s = spark.createDataFrame(
            [("z", 5.0), ("a", 5.0)], ["doc_id", "score"])
        got = [(r.doc_id, r.rrf_score)
               for r in rrf_fuse([s], k0=60, k=10).collect()]
        # equal scores: id asc wins rank 1
        assert got == [("a", round(1 / 61, 6)), ("z", round(1 / 62, 6))]

    def test_validation(self, spark):
        from osc_geo_h3grid_srv_spark.operators.retrieval import rrf_fuse
        import pytest as _pt
        with _pt.raises(ValueError):
            rrf_fuse([])
        s = spark.createDataFrame([("a", 1.0)], ["doc_id", "score"])
        with _pt.raises(ValueError):
            rrf_fuse([s], k0=0)

    def test_hybrid_beats_single_system_on_planted_doc(self, spark):
        from osc_geo_h3grid_srv_spark.operators.retrieval import rrf_fuse
        # doc x is rank 3 lexically and rank 3 densely; y/z are rank 1
        # in ONE system only — x's fused score must come out on top
        lex = spark.createDataFrame(
            [("y", 9.0), ("m", 8.0), ("x", 7.0), ("n", 6.0)],
            ["doc_id", "score"])
        den = spark.createDataFrame(
            [("z", 9.0), ("p", 8.0), ("x", 7.0), ("q", 6.0)],
            ["doc_id", "score"])
        top = rrf_fuse([lex, den], k0=60, k=1).collect()
        assert top[0].doc_id == "x"
