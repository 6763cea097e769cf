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
