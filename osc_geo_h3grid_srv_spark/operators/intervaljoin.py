"""Point-in-interval overlap join: pair every point (a timestamp) with
every interval [start, end) that contains it, WITHOUT a key to
equi-join on. The relational engines' default for this shape is a
Cartesian product + range filter (Spark plans a
BroadcastNestedLoopJoin), which is quadratic and dies long before
100 TB. This operator is the banded rewrite — the temporal twin of
distjoin.py's spatial banding:

* time is cut into fixed buckets of `bucket_s` seconds;
* each interval is replicated to every bucket it overlaps
  (explode(sequence(b0, b1)) — replication factor is
  len/bucket_s + 1, a knob the caller sizes against interval length);
* each point lands in exactly ONE bucket, so the bucket equi-join
  produces no duplicate pairs by construction — no distinct needed;
* the exact [start, end) containment check verifies every candidate.

The only shuffle is the bucket equi-join; per-task work is bounded by
per-bucket density (hot buckets are AQE-splittable because nothing
else rides on the key). The DuckDB oracle replays the UNPRUNED
quadratic inequality join — a banding bound that drops one true pair
flips the value hash (same gate discipline as distance_pairs_join).

`validate=True` (default) runs one tiny aggregate over the interval
side (the small side by construction) and refuses replication factors
above `max_span_buckets` — mis-sized buckets must fail loudly, not
silently explode the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BKT = "__iv_bkt"


def interval_overlap_join(points: DataFrame, intervals: DataFrame,
                          point_ts: str, start_ts: str, end_ts: str,
                          bucket_s: float,
                          max_span_buckets: int = 4096,
                          validate: bool = True) -> DataFrame:
    """-> points columns + intervals columns for every (point,
    interval) pair with start_ts <= point_ts < end_ts (half-open;
    empty intervals match nothing). Column names must be disjoint."""
    if bucket_s <= 0:
        raise ValueError(f"bucket_s {bucket_s} must be > 0")
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"point/interval column collision: {sorted(clash)}")
    if _BKT in points.columns or _BKT in intervals.columns:
        raise ValueError(f"inputs must not carry internal column {_BKT}")
    us = int(bucket_s * 1_000_000)

    iv = intervals.filter(F.col(end_ts) > F.col(start_ts))
    b0 = F.floor(F.unix_micros(F.col(start_ts).cast("timestamp")) / us)
    # end is exclusive: an interval ending exactly on a bucket edge
    # must not be replicated into that bucket
    b1 = F.floor(
        (F.unix_micros(F.col(end_ts).cast("timestamp")) - 1) / us)
    if validate:
        # one scalar over the SMALL side; a driver-side guard, not a
        # hot-path collect
        worst = iv.agg(F.max(b1 - b0).alias("m")).collect()[0]["m"]
        if worst is not None and worst >= max_span_buckets:
            raise ValueError(
                f"an interval spans {worst + 1} buckets of {bucket_s}s "
                f"(> max_span_buckets={max_span_buckets}); raise "
                f"bucket_s or max_span_buckets")
    iv = iv.withColumn(_BKT, F.explode(F.sequence(b0, b1)))
    pt = points.withColumn(
        _BKT, F.floor(F.unix_micros(F.col(point_ts).cast("timestamp")) / us))
    j = pt.join(iv, [_BKT])
    return (j.filter((F.col(point_ts) >= F.col(start_ts))
                     & (F.col(point_ts) < F.col(end_ts)))
            .drop(_BKT))
