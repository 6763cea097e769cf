"""Deterministic sampling for reproducible training-data mixes.

A 100 TB training-mix job cannot use rand(): re-runs must select the
SAME documents (resume, lineage audits, ablation reproducibility), the
decision must be makeable anywhere (any executor, any engine) from the
row alone, and downstream incremental runs must agree with prior ones.
The standard trick (public; used by web-corpus pipelines generally):
hash a stable key with a salt and keep the row iff the hash falls under
the fraction threshold.

Implementation detail that keeps it engine-portable AND cheap: the
md5 hex digest is lowercase fixed-width, so its first 8 hex digits
compare lexicographically exactly as the 32-bit integer they encode —
the keep predicate is a plain string comparison against a precomputed
8-hex-digit threshold literal. No Python, no bigint parsing, pushes
into whole-stage codegen, and DuckDB replays it verbatim (md5 +
substr + string <).

Changing `salt` draws an independent sample; keeping it fixed makes
samples NESTED across fractions (a 10% sample is a subset of the 50%
sample with the same salt) — the property you want for scaling-law
runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 16 ** 8


def _thr_hex(fraction: float) -> str:
    f = float(fraction)
    if not 0.0 <= f <= 1.0:
        raise ValueError(f"fraction {f} not in [0, 1]")
    if f >= 1.0:
        return "g" * 8  # sorts after every hex digit -> keep-all
    return format(int(f * _HEX_SPAN), "08x")


def _hash_col(key_col: str, salt: str):
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.lit("|"),
                       F.col(key_col).cast("string"))), 1, 8)


def deterministic_sample(df: DataFrame, fraction: float, key_col: str,
                         salt: str = "mix1") -> DataFrame:
    """keep each row iff md5(salt|key)[0:8] < hex(fraction * 16^8);
    exact-in-expectation, deterministic, nested across fractions."""
    return df.filter(_hash_col(key_col, salt) < F.lit(_thr_hex(fraction)))


def stratified_mix(df: DataFrame, strata_col: str,
                   fractions: dict, key_col: str,
                   salt: str = "mix1") -> DataFrame:
    """per-stratum deterministic sampling: `fractions` maps stratum
    value -> keep fraction; strata absent from the map are DROPPED
    (explicit mixes only). The thresholds join in by broadcast — at
    scale the mix table is tiny and the scan stays one pass."""
    spark = df.sparkSession
    mix = spark.createDataFrame(
        [(k, _thr_hex(v)) for k, v in sorted(fractions.items())],
        f"`{strata_col}` string, __thr string")
    return (df.join(F.broadcast(mix), on=strata_col, how="inner")
            .filter(_hash_col(key_col, salt) < F.col("__thr"))
            .drop("__thr"))


def weighted_sample_by_group(df: DataFrame, k: int, group_col: str,
                             weight_col: str, key_col: str,
                             salt: str = "wrs1",
                             round_digits: int = 9) -> DataFrame:
    """exact-k weighted sampling WITHOUT replacement per group
    (Efraimidis-Spirakis A-ES, public algorithm): each row draws a
    deterministic uniform u from md5(salt|key) and ranks by
    ln(u)/weight — the top-k per group is a weighted-without-
    replacement draw, and the SAME rows win on every re-run, engine,
    and executor. This complements deterministic_sample (rate-based,
    size varies) when the mix recipe demands exactly k docs per
    stratum regardless of stratum size.

    Engine portability: u = (h + 1) / 2^32 with h the first-8-hex-
    digit integer of the md5 (u in (0,1], never ln(0)); the rank key
    is ROUNDED to `round_digits` before ordering (ties then break on
    the sample key) so a last-bit libm difference in ln() between
    engines can never flip a selection — the same rounding discipline
    that pins the iterative oracles.

    Scale shape: one codegen projection computes the key; the only
    exchange is the per-group window (hash-partitioned by group; k and
    the per-group candidate count bound its state). Weights must be
    > 0 — rows with weight <= 0 or NULL are dropped (can never win a
    weighted draw)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window
    h = F.conv(_hash_col(key_col, salt), 16, 10).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(_HEX_SPAN))
    wkey = F.round(F.log(u) / F.col(weight_col).cast("double"),
                   round_digits)
    w = Window.partitionBy(group_col).orderBy(
        F.col("__wkey").desc(), F.col(key_col).asc())
    return (df.filter(F.col(weight_col).cast("double") > 0)
            .withColumn("__wkey", wkey)
            .withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= k)
            .drop("__wkey")
            .withColumnRenamed("__rank", "sample_rank"))
