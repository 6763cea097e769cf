"""Slowly-changing-dimension (SCD type 2) history build — collapse a
per-entity change stream into versioned validity intervals
(value, effective_from, effective_to, is_current), the lakehouse
dimension-table shape every warehouse join expects (Kimball's public
SCD2 definition).

This is gaps-and-islands over (entity, ts): consecutive rows carrying
the SAME attribute value form one version row; a change opens a new
interval and closes the previous one at the change's timestamp
(effective_to = next version's effective_from; NULL = current).

Plan shape (the 100 TB story): ONE entity-keyed exchange feeds a
per-entity sort that is shared by both window passes —

* run ids via the two-row_number difference (the classic islands
  trick: rn_overall - rn_within_value is constant inside a run and
  cannot collide across values);
* per-run boundaries via a groupBy on (entity, value, run_id) — the
  exchange is run-count-sized, far smaller than the stream;
* effective_to via one lead() over the per-entity run relation.

No step is keyed by anything wider than the entity id; no self-join,
no explode. Timestamps travel as epoch MICROSECONDS (long): the
engine-portable representation this repo's temporal oracles
standardize on (ntz timestamps hash-split across engines; integer
micros cannot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(df: DataFrame, entity_col: str, value_col: str,
                 ts_col: str) -> DataFrame:
    """-> (entity, value, version, eff_from_us, eff_to_us, is_current)

    version numbers the entity's intervals 1..n in time order;
    eff_to_us is the next version's eff_from_us (NULL on the current
    row); is_current marks the open interval. Ties inside one
    timestamp are pinned by value ascending so duplicate-ts inputs
    stay deterministic; NULL values are a legal version value (a NULL
    run is an island like any other — null-safe comparison is what
    the row_number difference gives for free).
    """
    ent = F.col(entity_col).alias("entity")
    # session tz is UTC repo-wide, so unix_micros == DuckDB epoch_us
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    rows = df.select(ent, F.col(value_col).alias("value"),
                     us.alias("ts_us"))
    w_all = Window.partitionBy("entity").orderBy("ts_us", "value")
    w_val = (Window.partitionBy("entity", "value")
             .orderBy("ts_us", "value"))
    runs = rows.select(
        "entity", "value", "ts_us",
        (F.row_number().over(w_all)
         - F.row_number().over(w_val)).alias("run_id"))
    spans = (runs.groupBy("entity", "value", "run_id")
             .agg(F.min("ts_us").alias("eff_from_us")))
    # value in the sort: two runs of one entity share an eff_from when
    # duplicate-ts rows carry different values — pin the version order
    w_ent = Window.partitionBy("entity").orderBy("eff_from_us", "value")
    out = spans.select(
        "entity", "value",
        F.row_number().over(w_ent).cast("int").alias("version"),
        "eff_from_us",
        F.lead("eff_from_us").over(w_ent).alias("eff_to_us"))
    return out.withColumn("is_current", F.col("eff_to_us").isNull())
