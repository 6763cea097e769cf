"""C4 page cleaning (operators/c4rules.py) and per-doc TF-IDF top
terms (operators/tfidf.py) vs hand-built references."""

import math

import pytest

from osc_geo_h3grid_srv_spark.operators.c4rules import c4_clean
from osc_geo_h3grid_srv_spark.operators.tfidf import tfidf_top_terms


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_c4_line_rules(spark):
    page = "\n".join([
        "this line ends properly.",          # kept
        "short.",                             # < 3 words
        "no terminal punctuation here",       # no . ! ?
        "enable javascript to continue.",     # javascript
        "is this a question?",                # kept
        "yes it is!",                         # kept
        "another good line right here.",      # kept
        "and one more to pass.",              # kept
    ])
    out = c4_clean(_docs(spark, [(1, page)]), min_words=3,
                   min_lines=5).collect()[0]
    assert (out.n_lines, out.n_kept) == (8, 5)
    assert out.page_ok
    assert out.clean_text.split("\n") == [
        "this line ends properly.", "is this a question?",
        "yes it is!", "another good line right here.",
        "and one more to pass."]


def test_c4_page_rules(spark):
    good = "\n".join(["a good enough line."] * 5)
    rows = [
        (1, good),
        (2, good + "\nLorem Ipsum dolor."),    # case-insensitive
        (3, good + "\nfunction() { return }"),
        (4, "\n".join(["a good enough line."] * 4)),  # < 5 kept
    ]
    out = {r.doc_id: r for r in
           c4_clean(_docs(spark, rows), min_words=3,
                    min_lines=5).collect()}
    assert out[1].page_ok and out[1].clean_text == good
    assert out[2].has_lorem and not out[2].page_ok
    assert out[2].clean_text is None
    assert out[3].has_brace and not out[3].page_ok
    assert not out[4].page_ok and out[4].n_kept == 4
    with pytest.raises(ValueError):
        c4_clean(_docs(spark, rows), min_words=0)
    with pytest.raises(ValueError):
        c4_clean(_docs(spark, rows), min_lines=0)


def test_tfidf_top_terms_matches_brute(spark):
    rows = [(1, "apple banana apple cherry"),
            (2, "banana banana date"),
            (3, "apple date date cherry cherry cherry")]
    out = tfidf_top_terms(_docs(spark, rows), k=2, min_df=1)
    got = {(r.doc_id, r.rank): (r.term, r.tf, r.df, r.tfidf)
           for r in out.collect()}
    texts = {i: t.split() for i, t in rows}
    n = len(rows)
    df = {}
    for toks in texts.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    for d, toks in texts.items():
        scored = sorted(
            ((-toks.count(t) * (math.log((n + 1) / (df[t] + 1)) + 1), t)
             for t in set(toks)))
        for rank, (negw, t) in enumerate(scored[:2], start=1):
            term, tf, dfv, w = got[(d, rank)]
            assert term == t
            assert (tf, dfv) == (toks.count(t), df[t])
            assert w == pytest.approx(-negw, abs=1e-6)


def test_tfidf_min_df_filters_rare_terms(spark):
    rows = [(1, "common rare1"), (2, "common rare2")]
    out = tfidf_top_terms(_docs(spark, rows), k=5, min_df=2).collect()
    assert {r.term for r in out} == {"common"}
    with pytest.raises(ValueError):
        tfidf_top_terms(_docs(spark, rows), k=0)
    with pytest.raises(ValueError):
        tfidf_top_terms(_docs(spark, rows), k=1, min_df=0)
