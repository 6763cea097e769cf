"""DSIR-style data selection: importance resampling on hashed n-gram
features (public method: Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling" — hashed bag-of-ngrams bag models for
a target and a raw distribution, per-doc importance weight = sum of
bucket log-ratios, then Gumbel top-k sampling without replacement).

This is the selection step a 100 TB pretraining pipeline runs between
dedup/quality filtering and the training-mix writer: "give me the k raw
documents that look most like the trusted target corpus, sampled
proportionally to their importance weight" — reproducibly.

Scale design (all built-in JVM expressions, no Python anywhere):

* the gram relation (unigrams + word bigrams, exploded once) is the
  only corpus-sized intermediate. Bucketing is the FIRST 2 HEX CHARS of
  md5(gram) — a string key, so the fit is one groupBy over 256 bucket
  values with map-side partial aggregation: the shuffle carries at most
  256 rows per task regardless of corpus size. Target and raw counts
  come out of the SAME pass via a conditional sum (the target corpus is
  a predicate over the raw corpus, as in the paper's setup).
* the fitted log-ratio table is 256 rows -> broadcast; per-doc weights
  are one more pass over the gram relation + a groupBy(doc) whose
  map-side combine collapses each partition's grams before the shuffle
  (grams of a doc are generated consecutively).
* selection is deterministic Gumbel top-k: u = (hexint(md5(salt|id)
  [0:8]) + 0.5) / 2^32, g = -ln(-ln(u)), key = logw/temperature + g.
  No rand(): re-runs, resumes, and the DuckDB oracle select the SAME
  documents (same property as operators/sampling.py). Top-k compiles
  to TakeOrderedAndProject (no global sort of the corpus).

Smoothing: add-alpha over the 2^(4*n_hex) bucket domain on both
distributions; log-ratio per bucket is
    ln((c_t + a) / (N_t + a*B)) - ln((c_q + a) / (N_q + a*B)).
Buckets never seen in the target corpus still get smoothed mass; every
bucket that appears in scoring appears in the raw fit by construction
(raw = the scored corpus), so no missing-key handling is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = 4294967296.0  # 2^32


def doc_grams(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text",
              keep_cols: list[str] | None = None) -> DataFrame:
    """one row per (doc, gram): whitespace unigrams + space-joined word
    bigrams over the lowercased text, each tagged with its 2-hex-char
    md5 bucket (256 buckets). keep_cols ride along (e.g. the target
    marker)."""
    keep = list(keep_cols or [])
    toks = docs.select(id_col, *keep,
                       F.split(F.lower(F.col(text_col)), " ").alias("t"))
    # sequence(1, 0) in Spark is the DESCENDING [1, 0], so single-token
    # docs must short-circuit to an empty bigram list explicitly
    grams = F.concat(
        F.col("t"),
        F.expr("case when size(t) >= 2 then "
               "transform(sequence(1, size(t) - 1), "
               "i -> concat_ws(' ', t[i-1], t[i])) "
               "else cast(array() as array<string>) end"))
    return (toks.select(id_col, *keep, F.explode(grams).alias("gram"))
            .withColumn("bucket", F.substring(F.md5("gram"), 1, 2)))


def fit_logratio(grams: DataFrame, is_target: Column,
                 alpha: float = 1.0, n_hex: int = 2) -> DataFrame:
    """(bucket, log_ratio) for every bucket present in the raw corpus.
    is_target marks the gram rows drawn from the target corpus; the fit
    is ONE groupBy(bucket) with a conditional target sum. n_hex is the
    md5-prefix length in hex chars -> 16**n_hex buckets."""
    n_buckets = float(16 ** n_hex)
    cnt = grams.groupBy("bucket").agg(
        F.count("*").cast("double").alias("cq"),
        F.sum(is_target.cast("long")).cast("double").alias("ct"))
    tot = cnt.agg(F.sum("cq").alias("nq"), F.sum("ct").alias("nt"))
    a = F.lit(float(alpha))
    ab = F.lit(float(alpha) * n_buckets)
    return (cnt.crossJoin(F.broadcast(tot))
            .select("bucket",
                    (F.log((F.col("ct") + a) / (F.col("nt") + ab))
                     - F.log((F.col("cq") + a) / (F.col("nq") + ab)))
                    .alias("log_ratio")))


def importance_weights(grams: DataFrame, logratio: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """(id, n_grams, logw): per-doc sum of bucket log-ratios."""
    return (grams.join(F.broadcast(logratio), "bucket")
            .groupBy(id_col)
            .agg(F.count("*").cast("bigint").alias("n_grams"),
                 F.sum("log_ratio").alias("logw")))


def _gumbel(id_col: str, salt: str) -> Column:
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.lit("|"),
                       F.col(id_col).cast("string"))), 1, 8),
        16, 10).cast("double") + F.lit(0.5)) / F.lit(_U32))
    return -F.log(-F.log(u))


def dsir_select(docs: DataFrame, is_target: Column, k: int,
                temperature: float = 1.0, salt: str = "dsir1",
                alpha: float = 1.0, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """end-to-end DSIR selection: fit target/raw hashed-ngram models
    over `docs` (target = rows where is_target), weight every doc,
    and Gumbel-top-k sample k docs with probability proportional to
    w^(1/temperature). Returns (id, n_grams, logw, sel_key) for the
    selected docs, ordered by sel_key desc (ties -> lowest id).

    is_target must be computable per row of `docs` (e.g. a trusted
    source/lang predicate) — the paper's target corpus as a subset of
    the scanned table; pass an external target by unioning it in with
    a marker column first."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not temperature > 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    g = doc_grams(docs.withColumn("__t", is_target), id_col, text_col,
                  keep_cols=["__t"])
    ratio = fit_logratio(g, F.col("__t"), alpha=alpha)
    w = importance_weights(g.drop("__t"), ratio, id_col)
    key = (F.col("logw") / F.lit(float(temperature))
           + _gumbel(id_col, salt))
    return (w.withColumn("sel_key", key)
            .orderBy(F.col("sel_key").desc(), F.col(id_col).asc())
            .limit(k))
