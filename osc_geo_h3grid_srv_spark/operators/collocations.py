"""Collocation statistics over corpus bigrams: pointwise mutual
information and Dunning's log-likelihood ratio G^2 (Dunning, CL 1993
"Accurate Methods for the Statistics of Surprise and Coincidence") —
the standard tests for "these two words co-occur more than chance",
used for multiword-expression mining and tokenizer-merge candidate
scoring in web-text pipelines.

Events are adjacent-bigram occurrences. For a bigram (a, b) the 2x2
contingency table over the N bigram events is

    k11 = c(a b)          k12 = c(a *) - c(a b)
    k21 = c(* b) - c(a b) k22 = N - c(a *) - c(* b) + c(a b)

    pmi = ln(k11 * N / (c(a *) * c(* b)))
    g2  = 2 * sum over cells of k ln(k N / (row * col)), 0 ln 0 := 0

Scale design: one corpus-token-stream shuffle builds the (left, right,
n) bigram relation (map-side combined hash agg — the same shape as
bigram_counts); the two marginal tables are vocab-sized groupBys of
THAT relation, never a second pass over the corpus; the scoring join
keys on single words (vocab-sized, Zipf-skewed — AQE handles the
head); top-k is TakeOrderedAndProject on the rounded statistic with a
lexicographic tie-break, never a full sort.

No reference counterpart (the reference has no text statistics); the
formulas are from the public Dunning paper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bigram_relation(docs: DataFrame, text_col: str) -> DataFrame:
    """(left, right, n) adjacent-bigram counts, single-space split,
    empty tokens dropped (matches the bigram_counts entry's filter)."""
    words = F.split(F.col(text_col), " ")
    prs = F.arrays_zip(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))))
    p = docs.select(F.explode(prs).alias("p")).select(
        F.col("p")["0"].alias("left"), F.col("p")["1"].alias("right"))
    return (p.filter((F.col("left") != "") & (F.col("right") != ""))
            .groupBy("left", "right").agg(F.count("*").alias("n")))


def _xlx(k: Column, n: Column, row: Column, col: Column) -> Column:
    """k * ln(k * N / (row * col)) with the 0 ln 0 := 0 convention."""
    return F.when(k > 0, k * F.log(k * n / (row * col))).otherwise(
        F.lit(0.0))


def collocations(docs: DataFrame, min_count: int = 5, k: int = 30,
                 text_col: str = "text") -> DataFrame:
    """-> (left, right, n, pmi round 6, g2 round 6): the top-k corpus
    collocations by G^2 among bigrams with n >= min_count, ordered by
    (g2 desc, left, right). Ordering uses the ROUNDED statistic so an
    oracle replay ranks identically."""
    if min_count < 1:
        raise ValueError(f"min_count {min_count} must be >= 1")
    bg = _bigram_relation(docs, text_col)
    lm = bg.groupBy("left").agg(F.sum("n").alias("c_left"))
    rm = bg.groupBy("right").agg(F.sum("n").alias("c_right"))
    tot = bg.agg(F.sum("n").cast("double").alias("n_total"))
    j = (bg.filter(F.col("n") >= min_count)
         .join(lm, "left").join(rm, "right")
         .crossJoin(F.broadcast(tot)))
    k11 = F.col("n").cast("double")
    row = F.col("c_left").cast("double")
    col = F.col("c_right").cast("double")
    n = F.col("n_total")
    k12 = row - k11
    k21 = col - k11
    k22 = n - row - col + k11
    pmi = F.log(k11 * n / (row * col))
    g2 = 2.0 * (_xlx(k11, n, row, col)
                + _xlx(k12, n, row, n - col)
                + _xlx(k21, n, n - row, col)
                + _xlx(k22, n, n - row, n - col))
    return (j.select("left", "right", F.col("n").cast("long").alias("n"),
                     F.round(pmi, 6).alias("pmi"),
                     F.round(g2, 6).alias("g2"))
            .orderBy(F.col("g2").desc(), F.col("left").asc(),
                     F.col("right").asc())
            .limit(k))
