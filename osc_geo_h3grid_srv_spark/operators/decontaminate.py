"""Benchmark-contamination detection (decontamination pass).

Before training on a web corpus you must find documents that overlap
held-out evaluation benchmarks, or the eval numbers are meaningless.
The standard public recipe (GPT-2/GPT-3 appendix-style n-gram overlap,
also the Dolma/DataComp decontamination shape): tokenize both sides,
form word n-grams, and flag a training document when enough of its
distinct n-grams appear in the benchmark n-gram set.

Scale story (100 TB corpus, ~1e5-1e7 benchmark n-grams): the benchmark
side is tiny relative to the corpus, so its distinct-gram set is
BROADCAST — the corpus-side explode + hash probe happens map-side, and
the ONLY shuffle in the whole operator is one partial-aggregated
groupBy keyed by doc id (never by gram, so hot grams like stopword
runs cannot skew a reducer). One corpus scan, one shuffle, no re-join
of the doc table against its own aggregate.

All gram construction is JVM array ops (split / transform / sequence /
slice) — no Python in the path — and is replayable verbatim in DuckDB
(string_split / list_transform / range), which is how the driver
oracle checks it end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_col(text_col: str, n: int):
    """word n-grams of `text_col` (single-space tokenization, matching
    the corpus format); short documents yield an empty array — guard
    explicitly because Spark's sequence(0, negative) DESCENDS instead
    of being empty."""
    toks = F.split(F.col(text_col), " ")
    sh = F.expr(
        f"transform(sequence(0, size(split({text_col}, ' ')) - {n}), "
        f"i -> array_join(slice(split({text_col}, ' '), i + 1, {n}), ' '))")
    return F.when(F.size(toks) >= n, sh).otherwise(
        F.array().cast("array<string>"))


def contamination_stats(docs: DataFrame, benchmark: DataFrame,
                        n: int = 4, threshold: float = 0.2,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        bench_text_col: str = "text") -> DataFrame:
    """Per-document benchmark overlap: returns one row per input doc
    with `n_grams` (distinct n-grams in the doc), `n_contam` (of those,
    how many appear anywhere in the benchmark set), `contam_frac`, and
    `is_contaminated` (frac >= threshold, int for portability).

    `benchmark` must be small enough to broadcast after distinct-gram
    reduction (true for real eval suites); it is reduced to a distinct
    single-column gram set before the join. Documents too short to form
    a single n-gram are kept (explode_outer) with n_grams = 0.
    """
    grams = docs.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(_gram_col(text_col, n))).alias("gram"))
    bench = (benchmark
             .select(F.explode(F.array_distinct(
                 _gram_col(bench_text_col, n))).alias("gram"))
             .distinct()
             .withColumn("__hit", F.lit(1)))
    agg = (grams.join(F.broadcast(bench), "gram", "left")
           .groupBy(id_col)
           .agg(F.count("gram").alias("n_grams"),
                F.coalesce(F.sum("__hit"), F.lit(0)).cast("bigint")
                .alias("n_contam")))
    frac = F.when(F.col("n_grams") > 0,
                  F.col("n_contam") / F.col("n_grams")).otherwise(F.lit(0.0))
    return (agg
            .withColumn("contam_frac", F.round(frac, 6))
            .withColumn("is_contaminated",
                        (F.col("contam_frac") >= F.lit(threshold))
                        .cast("int")))
