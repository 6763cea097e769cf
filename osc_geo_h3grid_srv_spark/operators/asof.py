"""Temporal as-of join: attach to each left row the LATEST right row
with right_ts <= left_ts for the same key (backward as-of, the
trades/quotes shape). The reference engine has no temporal joins; this
is part of the beyond-reference training-pipeline surface (joining
crawl events to the most recent per-host robots snapshot, pages to the
latest quality-model version, clicks to the last purchase, ...).

Spark-first design — NO join at all on the hot path:

* union the two sides with a side tag (right=0 sorts before left=1 at
  equal timestamps, so a right row AT the probe timestamp matches);
* one window per key ordered by (ts, side) carrying the last non-null
  right payload STRUCT forward (a single struct, never per-column
  last(): per-column carries could mix fields from different right
  rows when a payload field is legitimately NULL);
* keep the left rows. One shuffle, zero join, no range explosion.

That simple path partitions by key alone, so one pathological key with
10^9 history rows owns one task. `bucket_s` switches to the bounded
two-phase plan: the same union+window inside (key, time-bucket)
partitions, then a bucket-granularity carry table (one row per touched
(key, bucket) — orders of magnitude smaller than the data) is
window-carried per key and joined back so rows whose bucket holds no
earlier right row inherit the last payload from prior buckets. Every
task is bounded by per-bucket density, the carry-fix join is an
equi-join on (key, bucket). A pytest property gate pins
bucketed == simple on randomized inputs; the driver entry runs the
BUCKETED plan against DuckDB's native ASOF LEFT JOIN — an independent
implementation, not a replay.

Contract: right must be unique per (key, right_ts) — enforce upstream
(the entry pre-aggregates); with duplicates the "latest right row" is
ill-defined in any engine. Left rows with NULL ts get NULL payloads
(nulls sort first: no prior right row exists).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS, _SIDE, _PAY, _BKT, _IN = ("__af_ts", "__af_side", "__af_pay",
                               "__af_bkt", "__af_carry_in")


def _check_cols(left: DataFrame, payload_cols: Sequence[str]) -> None:
    for c in (_TS, _SIDE, _PAY, _BKT, _IN):
        if c in left.columns:
            raise ValueError(f"left must not carry internal column {c}")
    for c in payload_cols:
        if c in left.columns:
            raise ValueError(
                f"payload column {c} collides with a left column")


def _pay_struct(right: DataFrame, right_ts: str,
                payload_cols: Sequence[str]) -> Column:
    # matched right_ts rides inside the payload struct as __af_mts so
    # tolerance filtering and the asof_ts output need no second carry
    return F.struct(*[F.col(c) for c in payload_cols],
                    F.col(right_ts).alias("__af_mts"))


def _carry(unioned: DataFrame, part_cols: Sequence[str],
           backward: bool) -> DataFrame:
    # backward: latest right with ts <= left ts -> ts ASC carry.
    # forward: earliest right with ts >= left ts -> ts DESC carry.
    # side 0 (right) sorts before side 1 (left) either way, so a right
    # row AT the probe timestamp matches in both directions.
    # NULL-ts left rows must see no carry in either direction, so
    # they sort FIRST both ways (right NULL-ts rows are filtered at
    # entry)
    ts_o = (F.col(_TS).asc_nulls_first() if backward
            else F.col(_TS).desc_nulls_first())
    w = (Window.partitionBy(*part_cols)
         .orderBy(ts_o, F.col(_SIDE).asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    return unioned.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))


def _emit(df: DataFrame, left_cols: Sequence[str],
          payload_cols: Sequence[str], left_ts: str,
          tolerance_s: Optional[float], backward: bool) -> DataFrame:
    pay = F.col(_PAY)
    if tolerance_s is not None:
        age = (F.unix_micros(F.col(left_ts).cast("timestamp"))
               - F.unix_micros(pay["__af_mts"].cast("timestamp")))
        if not backward:
            age = -age
        pay = F.when(age <= F.lit(int(tolerance_s * 1_000_000)),
                     F.col(_PAY))
    out = [F.col(c) for c in left_cols]
    out += [pay[c].alias(c) for c in payload_cols]
    out.append(pay["__af_mts"].alias("asof_ts"))
    return df.filter(F.col(_SIDE) == 1).select(*out)


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              left_ts: str, right_ts: str,
              payload_cols: Sequence[str],
              tolerance_s: Optional[float] = None,
              bucket_s: Optional[float] = None,
              direction: str = "backward") -> DataFrame:
    """left columns + payload_cols + `asof_ts`. direction="backward"
    (default) matches the LATEST right row with right_ts <= left_ts;
    "forward" matches the EARLIEST right row with right_ts >= left_ts
    (the gap-fill / next-snapshot shape). Payloads are NULL when no
    right row qualifies or the match is further than `tolerance_s`.
    `bucket_s` selects the bounded two-phase plan."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"got {direction!r}")
    backward = direction == "backward"
    payload_cols = list(payload_cols)
    if not payload_cols:
        raise ValueError("payload_cols must be non-empty")
    _check_cols(left, payload_cols)
    if bucket_s is not None and bucket_s <= 0:
        raise ValueError(f"bucket_s {bucket_s} must be > 0")

    left_cols = list(left.columns)
    l2 = (left.withColumn(_TS, F.col(left_ts))
          .withColumn(_SIDE, F.lit(1)))
    # right NULL-ts rows are meaningless in either direction and would
    # poison the nulls-first carry ordering
    r2 = (right.filter(F.col(right_ts).isNotNull())
          .select(F.col(key_col),
                  F.col(right_ts).alias(_TS),
                  F.lit(0).alias(_SIDE),
                  _pay_struct(right, right_ts, payload_cols)
                  .alias(_PAY)))
    u = l2.unionByName(r2, allowMissingColumns=True)

    if bucket_s is None:
        carried = _carry(u, [key_col], backward)
        return _emit(carried, left_cols, payload_cols, left_ts,
                     tolerance_s, backward)

    us = int(bucket_s * 1_000_000)
    u = u.withColumn(_BKT, F.floor(
        F.unix_micros(F.col(_TS).cast("timestamp")) / us))
    carried = _carry(u, [key_col, _BKT], backward)

    # bucket-granularity carry table: the nearest-to-the-boundary right
    # payload in each touched (key, bucket), window-carried per key
    # across buckets so carry_in(b) = nearest right payload from any
    # earlier (backward) / later (forward) bucket
    best = F.max_by(_PAY, F.col(_TS)) if backward \
        else F.min_by(_PAY, F.col(_TS))
    last_r = (r2.withColumn(_BKT,
                            F.floor(F.unix_micros(
                                F.col(_TS).cast("timestamp")) / us))
              .groupBy(key_col, _BKT)
              .agg(best.alias(_PAY)))
    frame = (u.select(key_col, _BKT).distinct()
             .join(last_r, [key_col, _BKT], "left"))
    bkt_o = F.col(_BKT).asc() if backward else F.col(_BKT).desc()
    wk = (Window.partitionBy(key_col).orderBy(bkt_o)
          .rowsBetween(Window.unboundedPreceding, 0))
    carry_in = (frame
                .withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(wk))
                .withColumn(_IN, F.lag(_PAY).over(
                    Window.partitionBy(key_col).orderBy(bkt_o)))
                .select(key_col, _BKT, _IN))
    fixed = (carried.join(carry_in, [key_col, _BKT], "left")
             .withColumn(_PAY, F.coalesce(F.col(_PAY), F.col(_IN))))
    return _emit(fixed, left_cols, payload_cols, left_ts, tolerance_s,
                 backward)
