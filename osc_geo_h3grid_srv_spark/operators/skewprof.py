"""Join-key skew profile — the diagnostic every shuffle-heavy plan in
this repo leans on (salted correlator joins in plans/skew.py, AQE
skew-split hints, per-host frontier budgets) but until now had no
first-class operator: given a relation and a key, report the heavy
hitters and the shape of the key distribution, so a pipeline can
DECIDE between plain hash join, broadcast, salting, or per-key caps
before burning a 100 TB shuffle on a hot key.

Output: the top_k heaviest keys, each row carrying the global
distribution stats (n_keys, n_rows, max/avg skew factor) — one
relation, ready to join against job configs or alert thresholds.

Plan shape: one partial-aggregated groupBy (the counts relation is
key-cardinality-sized), a TakeOrderedAndProject for the top-k (never
a full sort), and the global stats as a broadcast 1-row aggregate of
the counts relation — no collect, no second pass over the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skew_profile(df: DataFrame, key_col: str,
                 top_k: int = 10) -> DataFrame:
    """-> (rank, key, cnt, share, n_keys, n_rows, skew): the top_k
    keys by row count (ties break on key ascending); share = cnt /
    n_rows round 6; skew = max_cnt / mean_cnt round 4."""
    if top_k < 1:
        raise ValueError(f"top_k {top_k} must be >= 1")
    counts = (df.groupBy(F.col(key_col).alias("key"))
              .agg(F.count("*").cast("long").alias("cnt")))
    stats = counts.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("__max"))
    # top-k via orderBy+limit -> TakeOrderedAndProject (per-partition
    # heaps + one k-row merge); the rank window then runs over the
    # k-row result, never the counts relation
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    top = (counts.orderBy(F.col("cnt").desc(), F.col("key").asc())
           .limit(int(top_k))
           .withColumn("rank", F.row_number().over(w)))
    return (top.crossJoin(F.broadcast(stats))
            .select("rank", "key", "cnt",
                    F.round(F.col("cnt") / F.col("n_rows"), 6)
                    .alias("share"),
                    "n_keys", "n_rows",
                    F.round(F.col("__max")
                            / (F.col("n_rows") / F.col("n_keys")), 4)
                    .alias("skew")))
