"""Corpus power-law statistics: Zipf rank-frequency slope and Heaps
vocabulary-growth exponent — the two classic sanity checks that a
web-text corpus "looks like language" (Zipf 1949; Heaps 1978; both
public literature), used to detect template/boilerplate-dominated or
synthetic-spam corpora whose curves bend away from the power law.

* Zipf: regress ln(freq) on ln(rank) over the term-frequency table
  (rank = row_number by freq desc, term asc; terms with freq >=
  min_freq so the hapax tail doesn't dominate the fit).
* Heaps: V(n) ~ K * n^beta — regress ln(cumulative vocab) on
  ln(cumulative tokens) over docs in doc_id order, where a doc's
  new-vocab contribution is the number of terms whose FIRST corpus
  occurrence (min doc_id) is that doc.

Both fits use the explicit closed-form least-squares sums

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
    intercept = (Sy - slope*Sx) / n
    r^2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2) * (n*Syy - Sy^2))

so an oracle replays the arithmetic with the same structure.

Scale design: the term-frequency and first-occurrence tables are
vocab-sized groupBys of one corpus token pass; the Zipf rank window
and the Heaps running sums order VOCAB- and DOC-count-sized relations
of width <= 3 — never the corpus text. Output is a single row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _fit(df: DataFrame, x: str, y: str, prefix: str) -> DataFrame:
    """closed-form least-squares of y on x -> 1 row with
    {prefix}_slope / {prefix}_intercept / {prefix}_r2 (unrounded)."""
    agg = df.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(F.col(x) * F.col(x)).alias("sxx"),
        F.sum(F.col(y) * F.col(y)).alias("syy"),
        F.sum(F.col(x) * F.col(y)).alias("sxy"))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # degenerate fits (single point / zero variance) yield NULLs, the
    # same answer SQL division-by-zero gives the oracle
    slope = F.when(denx != 0, num / denx)
    return agg.select(
        slope.alias(f"{prefix}_slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n"))
        .alias(f"{prefix}_intercept"),
        F.when(denx * deny != 0, num * num / (denx * deny))
        .alias(f"{prefix}_r2"))


def corpus_power_laws(docs: DataFrame, min_freq: int = 5,
                      id_col: str = "doc_id", text_col: str = "text"
                      ) -> DataFrame:
    """-> one row: (zipf_slope, zipf_r2, heaps_beta, heaps_k,
    n_terms_fit, vocab_size, total_tokens), rounded to 5."""
    if min_freq < 1:
        raise ValueError(f"min_freq {min_freq} must be >= 1")
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term")
    ).filter(F.col("term") != "")

    # Zipf over the frequency table
    tf = toks.groupBy("term").agg(F.count("*").alias("freq"))
    ranked = (tf.filter(F.col("freq") >= min_freq)
              .withColumn("rank", F.row_number().over(
                  Window.orderBy(F.col("freq").desc(),
                                 F.col("term").asc()))))
    zipf_pts = ranked.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"))
    zipf = _fit(zipf_pts, "x", "y", "zipf")

    # Heaps over cumulative (tokens, vocab) in doc_id order
    per_doc = toks.groupBy("id").agg(F.count("*").alias("n_tok"))
    firsts = (toks.groupBy("term").agg(F.min("id").alias("id"))
              .groupBy("id").agg(F.count("*").alias("n_new")))
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    cum = (per_doc.join(firsts, "id", "left")
           .fillna(0, subset=["n_new"])
           .select(F.sum("n_tok").over(w).alias("cum_tok"),
                   F.sum("n_new").over(w).alias("cum_voc")))
    heaps_pts = cum.select(
        F.log(F.col("cum_tok").cast("double")).alias("x"),
        F.log(F.col("cum_voc").cast("double")).alias("y"))
    heaps = _fit(heaps_pts, "x", "y", "heaps")

    stats = toks.agg(
        F.count("*").cast("long").alias("total_tokens"),
        F.count_distinct("term").cast("long").alias("vocab_size"))
    nfit = ranked.agg(F.count("*").cast("long").alias("n_terms_fit"))

    return (zipf.crossJoin(heaps).crossJoin(F.broadcast(stats))
            .crossJoin(F.broadcast(nfit))
            .select(F.round("zipf_slope", 5).alias("zipf_slope"),
                    F.round("zipf_r2", 5).alias("zipf_r2"),
                    F.round("heaps_slope", 5).alias("heaps_beta"),
                    F.round(F.exp("heaps_intercept"), 5).alias("heaps_k"),
                    "n_terms_fit", "vocab_size", "total_tokens"))
