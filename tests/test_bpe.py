"""Distributed BPE merge learning (operators/bpe.py)."""

from collections import Counter

from osc_geo_h3grid_srv_spark.operators.bpe import (
    learn_bpe_merges, word_table)


def _apply(s, a, b):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _brute(texts, n):
    """reference BPE trainer: greedy left-to-right merges, ties broken
    by (count desc, left asc, right asc)."""
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    syms = {w: list(w) for w in wf}
    merges = []
    for rank in range(1, n + 1):
        pc = Counter()
        for w, f in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = min(pc.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, cnt))
        syms = {w: _apply(s, a, b) for w, s in syms.items()}
    return merges


def test_sennrich_teaching_corpus(spark):
    texts = ["low low low low low lower lower newest newest newest",
             "newest newest newest widest widest widest"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = [tuple(r) for r in learn_bpe_merges(df, 6).collect()]
    assert got == [(1, "e", "s", 9), (2, "es", "t", 9),
                   (3, "l", "o", 7), (4, "lo", "w", 7),
                   (5, "e", "w", 6), (6, "ew", "est", 6)]
    assert got == _brute(texts, 6)


def test_brute_force_parity_random_corpus(spark):
    import random
    rng = random.Random(11)
    words = ["abab", "aab", "banana", "bandana", "abba", "cab",
             "a", "bb", "dada", "abcabc"]
    texts = [" ".join(rng.choice(words) for _ in range(20))
             for _ in range(25)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = [tuple(r) for r in learn_bpe_merges(df, 8).collect()]
    assert got == _brute(texts, 8)


def test_consecutive_pair_merge(spark):
    # [a,b,a,b] must become [ab,ab] in ONE pass (the wrapped-replace
    # boundary property), so (ab,ab) is countable at rank 2
    df = spark.createDataFrame([(0, "abab abab abab")],
                               "doc_id long, text string")
    got = [tuple(r) for r in learn_bpe_merges(df, 2).collect()]
    assert got == [(1, "a", "b", 6), (2, "ab", "ab", 3)]


def test_word_table_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "x yy x zzz yy x") for i in range(30)],
        "doc_id long, text string")
    wt = dict((r["word"], r["freq"]) for r in word_table(df).collect())
    assert wt == {"x": 90, "yy": 60, "zzz": 30}
    a = [tuple(r) for r in learn_bpe_merges(df, 3).collect()]
    b = [tuple(r) for r in
         learn_bpe_merges(df.repartition(7), 3).collect()]
    assert a == b


def _brute_encode(text, merges):
    """reference encoder: per word, greedy non-overlapping left-to-right
    application of the merges in rank order."""
    total_w = total_s = 0
    for w in text.split(" "):
        if not w:
            continue
        s = list(w)
        for a, b in merges:
            s = _apply(s, a, b)
        total_w += 1
        total_s += len(s)
    return total_w, total_s


def test_encode_hand_computed(spark):
    from osc_geo_h3grid_srv_spark.operators.bpe import encode_symbol_counts
    df = spark.createDataFrame([(0, "the cat"), (1, "the  hat")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in encode_symbol_counts(
        df, [("t", "h"), ("th", "e")]).collect()}
    # "the" -> th,e -> the : 1 symbol; "cat"/"hat": 3 symbols each;
    # double space yields no empty word
    assert out[0]["n_words"] == 2 and out[0]["n_bpe_symbols"] == 4
    assert out[1]["n_words"] == 2 and out[1]["n_bpe_symbols"] == 4


def test_encode_overlap_and_consecutive(spark):
    from osc_geo_h3grid_srv_spark.operators.bpe import encode_symbol_counts
    df = spark.createDataFrame([(0, "aaa abab")],
                               "doc_id long, text string")
    # "aaa" + (a,a): greedy non-overlapping -> [aa, a] = 2 symbols
    out = encode_symbol_counts(df, [("a", "a")]).collect()[0]
    assert out["n_bpe_symbols"] == 2 + 4
    # "abab" + (a,b) then (ab,ab): both occurrences merge in one pass,
    # then the consecutive pair merges -> 1 symbol
    out = encode_symbol_counts(
        df, [("a", "b"), ("ab", "ab")]).collect()[0]
    assert out["n_bpe_symbols"] == 3 + 1


def test_learn_then_encode_consistency(spark):
    """encode with the learner's own merges must equal the brute
    encoder, and symbol totals must be monotone non-increasing in the
    number of merges applied (each replace only ever joins symbols)."""
    from osc_geo_h3grid_srv_spark.operators.bpe import encode_symbol_counts
    import random
    rng = random.Random(7)
    words = ["lower", "newest", "widest", "low", "banana", "abab"]
    texts = [" ".join(rng.choice(words) for _ in range(12))
             for _ in range(10)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    learned = [(a, b) for _, a, b, _ in
               (tuple(r) for r in learn_bpe_merges(df, 5).collect())]
    prev = None
    for k in range(len(learned) + 1):
        enc = encode_symbol_counts(df, learned[:k])
        tot = enc.groupBy().sum("n_bpe_symbols").collect()[0][0]
        want = sum(_brute_encode(t, learned[:k])[1] for t in texts)
        assert tot == want
        if prev is not None:
            assert tot <= prev
        prev = tot
