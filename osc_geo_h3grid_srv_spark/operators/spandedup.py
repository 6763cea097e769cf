"""Span-level (k-gram) exact-substring dedup statistics — the
duplicated-span coverage measure used to clean LLM training corpora
(public method: Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better", approximated with fixed-length token k-grams
instead of suffix arrays, the standard distributed relaxation).

A doc position i is DUPLICATED if the k-token gram starting at i occurs
in at least `min_docs` distinct documents.  Per-doc coverage =
duplicated positions / total positions; the rollup reports corpus-level
duplication pressure per language.

Complements the doc-level family in operators/dedup.py (exact hash,
MinHash+LSH, SimHash, embedding-cosine) and the intra-doc
repetition_ratio: this is the CROSS-doc, SUB-doc granularity.

Scale design:
* gram construction is pure codegen (split -> transform(sequence) ->
  slice -> concat_ws -> xxhash64): no Python, no UDF, one projection.
* the shuffle carries (gram_hash: long, doc_id: long) — 16 bytes/row,
  never the gram text.  At 10^12 docs the row count is the corpus token
  count / stride; `stride` > 1 samples positions (standard biased
  relaxation) to cut it linearly.
* duplicated-gram detection is a groupBy(gram_hash) with map-side
  partial count-distinct; marking positions is a semi-join back on the
  same key, so AQE can reuse the partitioning and skew-split hot grams
  (boilerplate n-grams are the classic heavy hitters).
* correctness vs the hashless oracle holds up to xxhash64 collisions
  (~n^2/2^65 — zero at test scale, negligible at 10^12 grams for a
  coverage STATISTIC; an exact production pass would keep the gram
  bytes through the shuffle at 8x the width).

Reference scope note: the reference repo has no text-dedup surface;
this operator belongs to the training-data-pipeline extension required
by the build brief (SURVEY.md "beyond the reference" section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_dedup_stats(docs: DataFrame, k: int = 8, min_docs: int = 2,
                     stride: int = 1,
                     id_col: str = "doc_id", text_col: str = "text",
                     group_col: str = "lang") -> DataFrame:
    """-> per-`group_col`: n_docs (docs with >= 1 gram), total_grams,
    dup_grams (positions whose gram occurs in >= min_docs distinct
    docs), avg_dup_cov (mean per-doc duplicated fraction, round 6).

    Docs shorter than k tokens have no spans to deduplicate and are
    excluded (they carry no signal for this measure; doc-level dedup
    catches them)."""
    ws = F.split(F.lower(F.col(text_col)), " ")
    base = docs.select(F.col(id_col), F.col(group_col), ws.alias("ws"))
    base = base.withColumn("n_grams",
                           F.size("ws") - F.lit(k - 1)) \
               .filter(F.col("n_grams") >= 1)
    # positions 0, stride, 2*stride, ... ; gram = tokens [i, i+k)
    pos = F.sequence(F.lit(0), F.col("n_grams") - 1, F.lit(stride))
    gh = F.transform(
        pos, lambda i: F.xxhash64(F.concat_ws(
            " ", F.slice("ws", i + 1, k))))
    grams = (base.select(id_col, group_col, "n_grams",
                         F.explode(gh).alias("gh")))
    # grams occurring in >= min_docs DISTINCT docs (intra-doc repeats
    # are the repetition_ratio operator's job, not dedup's)
    dup = (grams.groupBy("gh")
           .agg(F.count_distinct(F.col(id_col)).alias("nd"))
           .filter(F.col("nd") >= min_docs)
           .select("gh"))
    marked = grams.join(dup, "gh", "left_semi")
    per_doc = (marked.groupBy(id_col)
               .agg(F.count("*").alias("dup_pos")))
    cov = (base.select(id_col, group_col, "n_grams")
           .join(per_doc, id_col, "left")
           .withColumn("dup_pos", F.coalesce("dup_pos", F.lit(0))))
    return (cov.groupBy(group_col)
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.col("n_grams").cast("long")).alias("total_grams"),
                 F.sum("dup_pos").alias("dup_grams"),
                 F.round(F.avg(F.col("dup_pos")
                               / F.col("n_grams")), 6).alias("avg_dup_cov"))
            .orderBy(group_col))
