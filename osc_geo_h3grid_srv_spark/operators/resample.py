"""Per-key time-series resampling with linear gap-fill: project each
key's irregular observations onto a regular `step_s` grid clipped to
that key's observed span, filling every grid instant by linear
interpolation between its surrounding observations (exact hits pass
through untouched). The training-pipeline uses: regularizing crawl/
fetch telemetry before drift models, aligning per-host rate signals to
a common clock, densifying sensor feeds before the correlator joins.
The reference engine interpolates in SPACE (IDW); this is the TIME
twin, part of the beyond-reference surface.

Spark-first design: the grid is an explode(sequence(lo, hi)) over the
per-key span relation (one row per key — orders of magnitude smaller
than the observations), and BOTH neighbor lookups are asof_join calls
(operators/asof.py): direction="backward" for the previous observation
and direction="forward" for the next, so the whole pipeline inherits
the bounded two-phase bucket plan — no range join, no per-key sort of
the full stream beyond the two window carries, and one pathological
key can never own an unbounded task when `bucket_s` is set. The
interpolation itself is one codegen'd arithmetic projection written
with the exact operand order the DuckDB oracle replays, so the
value-hash gate compares bit-identical IEEE doubles.

Contract: observations must be unique per (key, ts) — pre-aggregate
upstream (the entry does max(value)); NULL ts / NULL value rows are
dropped. Keys whose span contains no grid multiple emit nothing.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osc_geo_h3grid_srv_spark.operators.asof import asof_join

_GI, _GTS, _PV, _NV = "__rs_gi", "grid_ts", "__rs_prev", "__rs_next"


def resample_interpolate(obs: DataFrame, key_col: str, ts_col: str,
                         val_col: str, step_s: float,
                         bucket_s: Optional[float] = None,
                         max_grid_points: int = 10_000_000,
                         validate: bool = True) -> DataFrame:
    """-> (key_col, grid_ts, val) for every grid instant
    lo <= t <= hi at multiples of step_s inside the key's observed
    span. `validate` runs one tiny agg over the per-key SPAN relation
    and refuses keys whose grid would exceed `max_grid_points` rows —
    a mis-sized step must fail loudly, not explode the explode."""
    if step_s <= 0:
        raise ValueError(f"step_s {step_s} must be > 0")
    su = int(step_s * 1_000_000)
    o = (obs.select(F.col(key_col),
                    F.col(ts_col).alias("__rs_ts"),
                    F.col(val_col).cast("double").alias("__rs_val"))
         .filter(F.col("__rs_ts").isNotNull()
                 & F.col("__rs_val").isNotNull()))
    tus = F.unix_micros(F.col("__rs_ts").cast("timestamp"))
    spans = (o.groupBy(key_col)
             .agg(F.ceil(F.min(tus) / su).alias("__rs_lo"),
                  F.floor(F.max(tus) / su).alias("__rs_hi"))
             .filter(F.col("__rs_hi") >= F.col("__rs_lo")))
    if validate:
        worst = spans.agg(F.max(F.col("__rs_hi") - F.col("__rs_lo"))
                          .alias("m")).collect()[0]["m"]
        if worst is not None and worst >= max_grid_points:
            raise ValueError(
                f"a key spans {worst + 1} grid points of {step_s}s "
                f"(> max_grid_points={max_grid_points}); raise step_s "
                "or max_grid_points")
    grid = (spans.select(
        key_col,
        F.explode(F.sequence("__rs_lo", "__rs_hi")).alias(_GI))
        .select(key_col,
                F.timestamp_micros(F.col(_GI) * su)
                .cast("timestamp_ntz").alias(_GTS)))

    prev = asof_join(grid, o.withColumnRenamed("__rs_val", _PV),
                     key_col, _GTS, "__rs_ts", [_PV],
                     bucket_s=bucket_s, direction="backward")
    prev = prev.withColumnRenamed("asof_ts", "__rs_pts")
    both = asof_join(prev, o.withColumnRenamed("__rs_val", _NV),
                     key_col, _GTS, "__rs_ts", [_NV],
                     bucket_s=bucket_s, direction="forward")
    g_us = F.unix_micros(F.col(_GTS).cast("timestamp"))
    p_us = F.unix_micros(F.col("__rs_pts").cast("timestamp"))
    n_us = F.unix_micros(F.col("asof_ts").cast("timestamp"))
    # exact operand order matters: the DuckDB oracle replays this
    # formula verbatim so both engines emit bit-identical doubles
    interp = (F.col(_PV)
              + (F.col(_NV) - F.col(_PV))
              * ((g_us - p_us) / (n_us - p_us)))
    val = F.when(p_us == n_us, F.col(_PV)).otherwise(interp)
    return both.select(key_col, _GTS, val.alias("val"))
