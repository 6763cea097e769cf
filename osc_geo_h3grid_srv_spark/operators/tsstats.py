"""Sequential time-series statistics as pure window algebra — the
per-key smoothing / drift-alarm companions of burst_zscores
(operators/burst.py) and the gap-fill resampler (resample.py):

* ewma: exponentially-weighted moving average, TRUNCATED to the last
  `horizon` observations and renormalized — the standard finite-
  window form. The infinite-memory recursive EWMA is its horizon→∞
  limit; truncation at H changes values by < (1-alpha)^H (< 2e-2 at
  alpha 0.3 / H 12; < 1e-5 at H 32), and in exchange the operator is
  a bounded ROWS window instead of an unbounded sequential scan —
  each output depends on H rows, so Spark computes it as one
  collect_list window + one codegen'd fold, exactly replayable.
* cusum: one-sided CUSUM drift detector (Page 1954, public method)
  s_i = max(0, s_{i-1} + (x_i - mu0 - slack)). The recursion LOOKS
  sequential but has the classic prefix closed form
      s_i = c_i - min(0, min_{j<=i} c_j),   c = running sum of
  (x - mu0 - slack), so it runs as two cumulative windows over one
  key-keyed sort — no recursion, no applyInPandas, bit-replayable.

Scale shape: both operators are one hash exchange on the key plus
ROWS-frame windows; state per task is the frame (H rows / running
scalars), never the series. Keys are independent — 10^9 keys spread
across executors like any groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma(series: DataFrame, alpha: float, horizon: int,
         key_col: str = "key", ts_col: str = "ts",
         val_col: str = "val",
         round_digits: int = 6) -> DataFrame:
    """-> (key, ts, val, ewma): per key in ts order, the renormalized
    exponentially-weighted average of the last `horizon` observations
    (weights (1-alpha)^age). ts must be unique per key (pre-aggregate
    upstream, like resample_interpolate)."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha {alpha} must be in (0, 1)")
    if horizon < 1:
        raise ValueError(f"horizon {horizon} must be >= 1")
    r = 1.0 - float(alpha)
    w = (Window.partitionBy(key_col).orderBy(ts_col)
         .rowsBetween(-(int(horizon) - 1), 0))
    xs = F.collect_list(F.col(val_col)).over(w)
    # oldest -> newest fold: S <- S*(1-a) + x ; N <- N*(1-a) + 1
    acc = F.aggregate(
        xs,
        F.struct(F.lit(0.0).alias("s"), F.lit(0.0).alias("n")),
        lambda a, x: F.struct((a.s * r + x).alias("s"),
                              (a.n * r + 1.0).alias("n")),
        lambda a: a.s / a.n)
    return series.select(
        F.col(key_col).alias("key"), F.col(ts_col).alias("ts"),
        F.col(val_col).alias("val"),
        (F.round(acc, round_digits) + F.lit(0.0)).alias("ewma"))


def cusum(series: DataFrame, slack: float, threshold: float,
          key_col: str = "key", ts_col: str = "ts",
          val_col: str = "val", mu0_col: str | None = None,
          round_digits: int = 6) -> DataFrame:
    """-> (key, ts, val, s, alarm): one-sided upper CUSUM per key in
    ts order against reference level mu0 (per-key mean when mu0_col
    is None — self-calibrated) with slack `slack`; alarm when the
    statistic exceeds `threshold`. Closed form: two cumulative
    windows, no recursion."""
    if threshold <= 0:
        raise ValueError(f"threshold {threshold} must be > 0")
    kc, tc, vc = key_col, ts_col, val_col
    wk = Window.partitionBy(kc)
    mu0 = F.col(mu0_col) if mu0_col else F.avg(vc).over(wk)
    y = F.col(vc) - mu0 - F.lit(float(slack))
    base = series.select(
        F.col(kc).alias("key"), F.col(tc).alias("ts"),
        F.col(vc).alias("val"), y.alias("__y"))
    wcum = (Window.partitionBy("key").orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0))
    c = F.sum("__y").over(wcum)
    stepped = base.select("key", "ts", "val", c.alias("__c"))
    m = F.min("__c").over(wcum)
    s = F.col("__c") - F.least(F.lit(0.0), m)
    out = stepped.select(
        "key", "ts", "val",
        (F.round(s, round_digits) + F.lit(0.0)).alias("s"))
    return out.withColumn(
        "alarm", F.col("s") > F.lit(float(threshold)))
