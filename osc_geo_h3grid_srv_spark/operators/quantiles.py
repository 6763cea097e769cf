"""Exact distributed quantiles — the value-histogram method: collapse
the stream to (key, value) counts, cumulative-sum them in value order,
and read each requested probability off the cumulative curve. This is
the EXACT companion of approx_percentile (which the quality curation
path already uses for 10^12-row groups): when the value domain is
bounded (scores, durations, status codes, bucketed latencies — the
usual telemetry shapes), the exchange is DISTINCT-VALUE-sized, not
stream-sized, and the result is deterministic to the bit, so it can
anchor the approximate sketches' tolerance gates.

Definition: q(p) = the smallest value v whose cumulative count
reaches p·n (SQL type-1 / lower quantile: cum >= p*n AND
prev_cum < p*n picks exactly one row per (key, p)).

Plan shape: one (key, value) groupBy (map-side partial), key-keyed
windows (cumsum + lag + total) sharing ONE exchange over the counts
relation, a |probs|-explode on that small relation, and a final
filter — no sort of the raw stream, no collect. Skewed keys cost
|distinct values in key|, never |rows in key|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(df: DataFrame, probs: list[float],
                    key_col: str = "key",
                    val_col: str = "val") -> DataFrame:
    """-> (key, p, q): per key, the type-1 (lower) quantile of
    val_col at each probability in `probs` (0 < p <= 1)."""
    ps = sorted(float(p) for p in probs)
    if not ps:
        raise ValueError("probs must be non-empty")
    if ps[0] <= 0.0 or ps[-1] > 1.0:
        raise ValueError(f"probs {ps} must lie in (0, 1]")
    counts = (df.filter(F.col(val_col).isNotNull())
              .groupBy(F.col(key_col).alias("key"),
                       F.col(val_col).alias("q"))
              .agg(F.count("*").cast("long").alias("__c")))
    word = Window.partitionBy("key").orderBy("q")
    wcum = word.rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "key", "q",
        F.sum("__c").over(wcum).alias("__cum"),
        F.lag(F.sum("__c").over(wcum), 1, 0).over(word).alias("__prev"),
        F.sum("__c").over(Window.partitionBy("key")).alias("__n"))
    probs_arr = F.array(*[F.lit(p) for p in ps])
    target = F.col("p") * F.col("__n")
    return (cum.select("key", "q", "__cum", "__prev", "__n",
                       F.explode(probs_arr).alias("p"))
            .filter((F.col("__cum") >= target)
                    & (F.col("__prev") < target))
            .select("key", "p", "q"))
