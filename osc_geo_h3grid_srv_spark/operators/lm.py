"""Bigram language-model perplexity scoring (CCNet-style quality signal).

Web-text curation pipelines score documents with a small LM trained on
a trusted corpus and keep the low-perplexity tail (Wenzek et al.,
"CCNet", use a KenLM 5-gram; the distributed shape is identical for any
n). This module implements the order-2 case end-to-end IN Spark:

  train:  bigram counts c(w1,w2) and context counts c(w1) are two
          map-side-combined groupBys over the exploded bigram relation;
          V (continuation-type count) is one tiny broadcast scalar.
  score:  each doc's bigrams join the count tables (vocab-sized;
          broadcast when small, co-keyed shuffle join at web scale) and
          sum add-k-smoothed log-probs:
              P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k*V)
          perplexity = exp(-avg log P).

Everything is built-in JVM expressions — explode/transform for the
bigram relation, ln/exp for the scoring — no Python anywhere. The
DuckDB oracle replays the identical model (same counts, same smoothing,
same rounding), making this a full value-hash-gated statistical scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_bigrams(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """one row per (doc, position): whitespace bigram (w1, w2).
    Docs with fewer than 2 tokens drop out (no bigram evidence)."""
    toks = (docs.select(id_col, F.split(F.col(text_col), " ").alias("t"))
            .filter(F.size("t") >= 2))
    pairs = F.expr(
        "transform(sequence(1, size(t) - 1), "
        "i -> struct(t[i-1] as w1, t[i] as w2))")
    return (toks.select(id_col, F.explode(pairs).alias("b"))
            .select(id_col, "b.w1", "b.w2"))


def bigram_lm_scores(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", add_k: float = 0.5,
                     round_digits: int = 6) -> DataFrame:
    """train-and-score in one lineage: per-doc n_bigrams, avg log-prob
    and perplexity under the corpus's own add-k bigram model. Returns
    (id, n_bigrams, avg_logprob, perplexity)."""
    bg = doc_bigrams(docs, id_col, text_col)
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    ctx = bg.groupBy("w1").agg(F.count("*").alias("cu"))
    vocab = bg.agg(F.countDistinct("w2").alias("v"))
    logp = F.log((F.col("cb") + add_k)
                 / (F.col("cu") + add_k * F.col("v")))
    scored = (bg.join(bgc, ["w1", "w2"])
              .join(ctx, ["w1"])
              .crossJoin(F.broadcast(vocab))
              .groupBy(id_col)
              .agg(F.count("*").cast("bigint").alias("n_bigrams"),
                   F.sum(logp).alias("sum_logp")))
    avg = F.col("sum_logp") / F.col("n_bigrams")
    return scored.select(
        id_col, "n_bigrams",
        F.round(avg, round_digits).alias("avg_logprob"),
        F.round(F.exp(-avg), 4).alias("perplexity"))


def kn_lm_scores(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", discount: float | None = None,
                 round_digits: int = 6) -> DataFrame:
    """interpolated Kneser-Ney bigram scoring — the published smoothing
    (Kneser & Ney 1995; the interpolated form and the count-of-counts
    discount estimate from Chen & Goodman 1999) behind KenLM, which is
    what production CCNet-style filters actually run. Versus add-k,
    KN's continuation probability fixes the "Francisco problem": a word
    frequent only after one context stops inflating unigram backoff.

      P(w2|w1)  = max(c(w1,w2) - D, 0) / c(w1)  +  lam(w1) * Pcont(w2)
      lam(w1)   = D * N1+(w1,*) / c(w1)        (leftover mass)
      Pcont(w2) = N1+(*,w2) / N1+(*,*)         (continuation types)
      D         = n1 / (n1 + 2*n2)  when `discount` is None
                  (count-of-counts estimate over bigram types;
                  falls back to 0.5 when n1 + 2*n2 = 0, i.e. every
                  bigram type occurs >= 3 times — the estimate is
                  undefined there, same fallback KenLM-style tools use)

    Distributed shape: ONE corpus-wide (w1,w2) groupBy builds the
    bigram-type table; every other model statistic derives from that
    vocab-sized relation (context totals + continuation-type counts as
    two more vocab-sized groupBys, n1/n2/total-types as a broadcast
    1-row aggregate) — the token stream is never shuffled twice.
    Scoring joins the per-doc bigram relation against the three count
    tables co-keyed on w1/w2 (broadcast when small, shuffle join at
    web scale). All JVM expressions; scoring the training corpus
    itself keeps every c(w1) > 0, so P > 0 needs no OOV floor.

    Returns (id, n_bigrams, avg_logprob, perplexity)."""
    bg = doc_bigrams(docs, id_col, text_col)
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    # context totals AND continuation-type counts from the TYPE table
    # (vocab-sized), not the token stream
    ctx = bgc.groupBy("w1").agg(F.sum("cb").alias("cu"),
                                F.count("*").alias("t1"))
    cont = bgc.groupBy("w2").agg(F.count("*").alias("r2"))
    tot = bgc.agg(
        F.count("*").cast("double").alias("btypes"),
        F.sum((F.col("cb") == 1).cast("long")).alias("n1"),
        F.sum((F.col("cb") == 2).cast("long")).alias("n2"))
    d = (F.lit(float(discount)) if discount is not None
         else F.when(F.col("n1") + 2.0 * F.col("n2") > 0,
                     F.col("n1") / (F.col("n1") + 2.0 * F.col("n2")))
         .otherwise(F.lit(0.5)))
    p = (F.greatest(F.col("cb") - d, F.lit(0.0)) / F.col("cu")
         + (d * F.col("t1") / F.col("cu"))
         * (F.col("r2") / F.col("btypes")))
    scored = (bg.join(bgc, ["w1", "w2"])
              .join(ctx, ["w1"])
              .join(cont, ["w2"])
              .crossJoin(F.broadcast(tot))
              .groupBy(id_col)
              .agg(F.count("*").cast("bigint").alias("n_bigrams"),
                   F.sum(F.log(p)).alias("sum_logp")))
    avg = F.col("sum_logp") / F.col("n_bigrams")
    return scored.select(
        id_col, "n_bigrams",
        F.round(avg, round_digits).alias("avg_logprob"),
        F.round(F.exp(-avg), 4).alias("perplexity"))
