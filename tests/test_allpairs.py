"""All-pairs exact similarity search (operators/allpairs.py) —
prefix+size prune completeness/effectiveness vs a brute-force
quadratic baseline, on both synthetic text and the sf0.001 documents
table. No reference counterpart (the reference has no text
similarity); the bounds are from Bayardo, Ma & Srikant, WWW 2007.
"""

import itertools

import pytest

from osc_geo_h3grid_srv_spark.operators.allpairs import (
    _gram_array, allpairs_candidate_pairs, allpairs_cosine_pairs,
    containment_pairs)

SF = "/root/testdata/sf0.001"


def _brute_pairs(rows, threshold, n=2):
    """Quadratic python oracle over distinct word-n-gram sets."""
    sets = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        if len(toks) < n:
            continue
        grams = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        if grams:
            sets[doc_id] = grams
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        cos = inter / (len(sets[a]) * len(sets[b])) ** 0.5
        if cos >= threshold:
            out[(a, b)] = round(cos, 6)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_exact_vs_brute_documents(spark, docs):
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    for t in (0.5, 0.8):
        want = _brute_pairs(rows, t)
        got = {(r.id_a, r.id_b): r.cosine
               for r in allpairs_cosine_pairs(docs, t).collect()}
        assert got == want
        assert want, f"fixture must plant near-dup pairs at t={t}"


def test_candidates_complete_and_pruned(spark, docs):
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    # completeness: the prune may never drop a qualifying pair, at a
    # mid threshold where the prefixes are long and overlap-prone
    true_pairs = set(_brute_pairs(rows, 0.7))
    cand_mid = {(r.id_a, r.id_b)
                for r in allpairs_candidate_pairs(docs, 0.7).collect()}
    assert true_pairs <= cand_mid
    # effectiveness: at a realistic near-dup threshold the prefix+size
    # prune must collapse the unpruned postings join (every pair
    # sharing >= 1 bigram) by an order of magnitude — Zipf-common
    # bigrams make nearly every doc pair share SOMETHING, so this is
    # the property that keeps the join from going quadratic
    sets = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        sets[doc_id] = {" ".join(toks[i:i + 2])
                        for i in range(max(0, len(toks) - 1))}
    unpruned = sum(
        1 for a, b in itertools.combinations(sorted(sets), 2)
        if sets[a] & sets[b])
    cand_hi = allpairs_candidate_pairs(docs, 0.9).count()
    assert cand_hi < unpruned / 10, (cand_hi, unpruned)
    # tightening the threshold must never grow the candidate set
    assert cand_hi <= len(cand_mid)


def test_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "a b a b"), (4, "a b a b c")],
        ["doc_id", "text"])
    got = {(r.id_a, r.id_b): r.cosine
           for r in allpairs_cosine_pairs(df, 0.5).collect()}
    # docs 1, 2 contribute no bigrams; 3={a b, b a}, 4={a b, b a, b c}
    assert set(got) == {(3, 4)}
    assert got[(3, 4)] == round(2 / (2 * 3) ** 0.5, 6)


def _brute_containment(rows, threshold, n=2):
    sets = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        if len(toks) < n:
            continue
        grams = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        if grams:
            sets[doc_id] = grams
    out = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            c = len(sets[a] & sets[b]) / len(sets[a])
            if c >= threshold:
                out[(a, b)] = round(c, 6)
    return out


def test_containment_vs_brute(spark, docs):
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    for t in (0.5, 0.8):
        want = _brute_containment(rows, t)
        got = {(r.id_a, r.id_b): r.containment
               for r in containment_pairs(docs, t).collect()}
        assert got == want
        assert want, f"fixture must plant containment pairs at t={t}"


def test_containment_is_directional(spark):
    # a 3-bigram quote inside a much longer doc: containment(quote ->
    # host) = 1.0, the reverse direction far below threshold, and
    # symmetric cosine would miss it entirely
    quote = "alpha beta gamma delta"
    host = quote + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame([(1, quote), (2, host)],
                               ["doc_id", "text"])
    got = {(r.id_a, r.id_b): r.containment
           for r in containment_pairs(df, 0.9).collect()}
    assert got == {(1, 2): 1.0}
    cos = allpairs_cosine_pairs(df, 0.9).collect()
    assert cos == []


def test_threshold_validation(spark, docs):
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            allpairs_candidate_pairs(docs, bad)


def test_unigram_mode(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x y w"), (3, "p q r")], ["doc_id", "text"])
    got = {(r.id_a, r.id_b): r.cosine
           for r in allpairs_cosine_pairs(df, 0.5, ngram=1).collect()}
    assert got == {(1, 2): round(2 / 3, 6)}


def test_gram_array_short_doc_is_empty(spark):
    # regression guard: F.sequence(0, -1) DESCENDS in Spark — a one-word
    # doc must yield [] bigrams, not a crash or a descending range
    df = spark.createDataFrame([(1, "solo")], ["doc_id", "text"])
    out = df.select(_gram_array("text", 2).alias("g")).collect()
    assert out[0].g == []


def _brute_knn(rows, k, threshold, n=2):
    pairs = _brute_pairs(rows, threshold, n)
    sym = {}
    for (a, b), cos in pairs.items():
        sym.setdefault(a, []).append((b, cos))
        sym.setdefault(b, []).append((a, cos))
    out = {}
    for src, nbrs in sym.items():
        nbrs.sort(key=lambda t: (-t[1], t[0]))
        for rank, (dst, cos) in enumerate(nbrs[:k], start=1):
            out[(src, dst)] = (cos, rank)
    return out


def test_knn_graph_matches_brute(spark):
    from osc_geo_h3grid_srv_spark.operators.allpairs import knn_graph
    import numpy as np
    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choice(vocab, size=12)))
            for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for k in (1, 3, 7):
        got = {(r.src, r.dst): (r.cosine, r.rank)
               for r in knn_graph(df, k=k, threshold=0.2).collect()}
        assert got == _brute_knn(rows, k, 0.2), f"k={k}"


def test_knn_graph_tie_breaks_by_id(spark):
    from osc_geo_h3grid_srv_spark.operators.allpairs import knn_graph
    # docs 2 and 3 are identical texts -> both cosine 1.0 to doc 1;
    # with k=1 the smaller id must win, deterministically
    rows = [(1, "a b c d"), (2, "a b c d"), (3, "a b c d")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.src: (r.dst, r.rank)
           for r in knn_graph(df, k=1, threshold=0.5).collect()}
    assert got == {1: (2, 1), 2: (1, 1), 3: (1, 1)}


def test_knn_graph_bad_k_raises(spark):
    from osc_geo_h3grid_srv_spark.operators.allpairs import knn_graph
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="k must be"):
        knn_graph(df, k=0, threshold=0.5)


def test_count_and_prefix_strategies_agree(spark, docs):
    # the two exact plans must return identical rows at any floor —
    # 'count' (postings self-join + groupBy overlap) vs 'prefix'
    # (WWW'07 prune + array_intersect verify)
    for t in (0.3, 0.6):
        want = {(r.id_a, r.id_b): r.cosine
                for r in allpairs_cosine_pairs(
                    docs, t, strategy="prefix").collect()}
        got = {(r.id_a, r.id_b): r.cosine
               for r in allpairs_cosine_pairs(
                   docs, t, strategy="count").collect()}
        assert got == want and want, f"t={t}"


def test_auto_strategy_resolution(spark, docs):
    from osc_geo_h3grid_srv_spark.operators.allpairs import (
        _COUNT_FANOUT_MAX, _gram_sets, _hash_sets, _pick_strategy)
    sets = _hash_sets(_gram_sets(docs, "doc_id", "text", 2))
    # high floor -> always prefix, no df scan needed
    assert _pick_strategy(sets, 0.5, "auto") == "prefix"
    assert _pick_strategy(sets, 0.9, "auto") == "prefix"
    # low floor on this small-vocab corpus: fan-out is bounded -> count
    assert _pick_strategy(sets, 0.35, "auto") == "count"
    # explicit strategies pass through; unknown rejected
    assert _pick_strategy(sets, 0.35, "prefix") == "prefix"
    with pytest.raises(ValueError, match="unknown strategy"):
        _pick_strategy(sets, 0.35, "bogus")
