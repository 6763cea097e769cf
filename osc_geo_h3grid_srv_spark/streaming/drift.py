"""Streaming CUSUM drift alarm: the live twin of
operators/tsstats.cusum — per-key one-sided CUSUM s = max(0, s' +
(x − mu0 − slack)) evaluated INSIDE the stream, so a count/latency/
score drift trips the alarm in the micro-batch where it happens
instead of at the next batch rollup. Monitoring shapes: per-host
fetch latencies, per-type event rates, per-domain quality scores.

The batch operator runs the prefix closed form over two windows; the
streaming recursion is even simpler because the state IS the
recursion: `applyInPandasWithState` keyed by the series key, state =
(s, last emitted ts) — O(1) per key, never a history buffer (same
state discipline as streaming/enrich.py). mu0 is an explicit
reference level carried on each row (join your calibration table
upstream, or pass a constant) — a streaming operator cannot
self-calibrate on the full series without unbounded state, and
SHOULD not: drifting the baseline under the detector defeats it.

Ordering contract: rows are processed in (ts, seq) order within a
micro-batch; rows older than the last processed ts of their key are
DROPPED (counted nowhere) rather than applied out of order — a CUSUM
is order-defined, and silently folding a late point in the wrong
position corrupts every later s. Replay through the batch operator
is the reconciliation path, same as streaming asof.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

IN_SCHEMA = "key string, seq long, ts timestamp, val double, mu0 double"
OUT_SCHEMA = ("key string, seq long, ts timestamp, val double, "
              "s double, alarm boolean")
STATE_SCHEMA = "s double, last_us long"


def make_cusum_fn(slack: float, threshold: float):
    """Build the per-group stateful function (slack/threshold are
    plain parameters captured in the closure, like the batch op)."""
    if threshold <= 0:
        raise ValueError(f"threshold {threshold} must be > 0")
    ks = float(slack)

    def _cusum(key, pdfs, state: GroupState):
        s, last_us = state.get if state.exists else (0.0, -(2 ** 62))
        frames = [p for p in pdfs if len(p)]
        if not frames:
            if False:
                yield  # pragma: no cover - keeps the generator shape
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.sort_values(["ts", "seq"], kind="mergesort")
        out = {k: [] for k in ("key", "seq", "ts", "val", "s", "alarm")}
        for seq, ts, val, mu0 in zip(pdf["seq"], pdf["ts"],
                                     pdf["val"], pdf["mu0"]):
            t_us = int(ts.value // 1000)
            if t_us <= last_us:
                continue  # late/duplicate: order-defined stat, drop
            last_us = t_us
            s = max(0.0, s + (float(val) - float(mu0) - ks))
            out["key"].append(key[0])
            out["seq"].append(seq)
            out["ts"].append(ts)
            out["val"].append(val)
            out["s"].append(s)
            out["alarm"].append(s > threshold)
        state.update((s, last_us))
        if out["key"]:
            yield pd.DataFrame(out)

    return _cusum


def stream_cusum(spark, landing_dir: str, checkpoint_dir: str, sink,
                 slack: float, threshold: float,
                 available_now: bool = True):
    """landing parquet of IN_SCHEMA rows -> per-key streaming CUSUM ->
    foreachBatch sink. Returns the started query."""
    src = (spark.readStream.schema(IN_SCHEMA)
           .parquet(landing_dir)
           .filter(F.col("ts").isNotNull() & F.col("key").isNotNull()))
    scored = (src.groupBy("key")
              .applyInPandasWithState(
                  make_cusum_fn(slack, threshold), OUT_SCHEMA,
                  STATE_SCHEMA, outputMode="append",
                  timeoutConf=GroupStateTimeout.NoTimeout))
    w = (scored.writeStream.foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
