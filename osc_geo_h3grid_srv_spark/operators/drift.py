"""Corpus drift monitoring: token-distribution divergence between two
document sets (e.g. two crawl snapshots, or a new ingest batch vs the
served corpus). A 100 TB pipeline re-crawls continuously; before a new
snapshot replaces the old one you want a cheap, distributed answer to
"did the language shift?" — the standard measure is the KL divergence
(and its symmetric/bounded cousin Jensen-Shannon) between smoothed
unigram distributions (public practice in corpus linguistics and
dataset monitoring; Kilgarriff, "Comparing Corpora").

Scale shape: both corpora reduce to vocab-sized count tables in ONE
shared pass — the input is a single relation with a side flag, so the
fit is one tokenize+groupBy(term) with conditional sums (map-side
combined; the shuffle carries vocab-sized partials, never the token
stream). Totals are a one-row broadcast. Per-term contributions are a
codegen projection over the vocab table; the headline number is its
one-row sum. No Python, no window, no join keyed by anything bigger
than the vocabulary.

Smoothing: add-alpha over the UNION vocabulary (size V), so q(term)>0
everywhere and KL is finite:
    p(t) = (c_a(t) + alpha) / (n_a + alpha*V)   (same for q/b)
    KL(a||b)   = sum_t p(t) * ln(p(t) / q(t))   over the union vocab
    JS(a,b)    = (KL(a||m) + KL(b||m)) / 2,  m = (p+q)/2
Terms absent from one side still contribute (they sit in the union
vocab with count 0), which is exactly the drift you're looking for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def term_counts_two_sided(docs: DataFrame, is_a: Column,
                          text_col: str = "text") -> DataFrame:
    """(term, ca, cb) over the union vocabulary of a single relation
    carrying both corpora; is_a marks side A rows."""
    toks = docs.select(is_a.alias("__a"),
                       F.explode(F.split(F.lower(F.col(text_col)), " "))
                       .alias("term"))
    return toks.groupBy("term").agg(
        F.sum(F.col("__a").cast("long")).cast("double").alias("ca"),
        F.sum((~F.col("__a")).cast("long")).cast("double").alias("cb"))


def _probs(cnt: DataFrame, alpha: float):
    tot = cnt.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"),
                  F.count("*").cast("double").alias("v"))
    j = cnt.crossJoin(F.broadcast(tot))
    a = F.lit(float(alpha))
    p = (F.col("ca") + a) / (F.col("na") + a * F.col("v"))
    q = (F.col("cb") + a) / (F.col("nb") + a * F.col("v"))
    return j, p, q


def vocab_divergence(docs: DataFrame, is_a: Column,
                     text_col: str = "text",
                     alpha: float = 0.5) -> DataFrame:
    """one row: (n_terms, kl_ab, kl_ba, js) in nats between the two
    smoothed unigram distributions."""
    j, p, q = _probs(term_counts_two_sided(docs, is_a, text_col), alpha)
    m = (p + q) / F.lit(2.0)
    return j.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum(p * F.log(p / q)).alias("kl_ab"),
        F.sum(q * F.log(q / p)).alias("kl_ba"),
        ((F.sum(p * F.log(p / m)) + F.sum(q * F.log(q / m)))
         / F.lit(2.0)).alias("js"))


def drifted_terms(docs: DataFrame, is_a: Column, k: int = 20,
                  text_col: str = "text",
                  alpha: float = 0.5) -> DataFrame:
    """top-k terms by |KL(a||b) contribution| — the words driving the
    drift, signed: positive = overrepresented in A. Compiles to
    TakeOrderedAndProject over the vocab table."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    j, p, q = _probs(term_counts_two_sided(docs, is_a, text_col), alpha)
    contrib = p * F.log(p / q)
    return (j.select("term", F.col("ca").cast("long").alias("ca"),
                     F.col("cb").cast("long").alias("cb"),
                     contrib.alias("kl_contrib"))
            .orderBy(F.abs(F.col("kl_contrib")).desc(),
                     F.col("term").asc())
            .limit(k))
