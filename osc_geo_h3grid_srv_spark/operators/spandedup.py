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


def remove_duplicated_spans(docs: DataFrame, k: int = 8, min_docs: int = 2,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Rewrite each document with cross-doc duplicated spans REMOVED
    (the actual cleaning step behind span_dedup_stats' measurement —
    Lee et al. 2022 remove the duplicated substrings from all but one
    copy; this is the fixed-k-gram distributed relaxation with
    keep-first semantics).

    A k-gram occurring in >= min_docs distinct documents has a WINNER:
    the smallest `id_col` among the docs containing it (deterministic,
    order-free). In every other doc, all token positions covered by an
    occurrence of that gram are cut; the doc's text is rebuilt from the
    surviving tokens in order. The winner keeps its copy, so shared
    content survives exactly once per gram (a doc may still lose a
    position to one gram while winning an overlapping one — coverage
    is the union over losing occurrences, matching the paper's
    span-union semantics).

    Returns (id_col, clean_text, n_tokens, n_removed) for EVERY input
    doc (docs shorter than k tokens pass through untouched).

    Scale design: the gram shuffle carries (gram_hash, id, pos) — 20
    bytes/row, never gram text; winner election is one groupBy with
    map-side partial agg; cut positions re-join occurrences on the
    same gram_hash key (AQE reuses the partitioning and skew-splits
    hot boilerplate grams); the rebuild is a per-doc array filter in
    codegen, no Python. Tokenization is lowercase-whitespace, shared
    with span_dedup_stats so measured coverage and removed mass agree.
    """
    ws = F.split(F.lower(F.col(text_col)), " ")
    base = docs.select(F.col(id_col).alias("_id"), ws.alias("ws"))
    base = base.withColumn("n_tok", F.size("ws"))
    sized = base.filter(F.col("n_tok") >= k)
    pos = F.sequence(F.lit(0), F.col("n_tok") - k)
    grams_arr = F.transform(
        pos, lambda i: F.struct(
            i.alias("i"),
            F.xxhash64(F.concat_ws(" ", F.slice("ws", i + 1, k)))
            .alias("gh")))
    occ = (sized.select("_id", F.explode(grams_arr).alias("o"))
           .select("_id", F.col("o.i").alias("i"), F.col("o.gh").alias("gh")))
    win = (occ.groupBy("gh")
           .agg(F.count_distinct("_id").alias("nd"),
                F.min("_id").alias("w"))
           .filter(F.col("nd") >= min_docs)
           .select("gh", "w"))
    cut = (occ.join(win, "gh")
           .filter(F.col("_id") != F.col("w"))
           .select("_id", F.explode(
               F.sequence(F.col("i"), F.col("i") + F.lit(k - 1))).alias("p"))
           .distinct())
    cuts = cut.groupBy("_id").agg(F.collect_set("p").alias("cutset"))
    out = (base.join(cuts, "_id", "left")
           .withColumn("cutset", F.coalesce(
               "cutset", F.array().cast("array<int>")))
           .withColumn("kept", F.filter(
               "ws", lambda t, idx: ~F.array_contains("cutset", idx))))
    return out.select(
        F.col("_id").alias(id_col),
        F.concat_ws(" ", F.col("kept")).alias("clean_text"),
        F.col("n_tok").cast("long").alias("n_tokens"),
        (F.col("n_tok") - F.size("kept")).cast("long").alias("n_removed"))
