"""Streaming as-of enrichment: a single interleaved stream of
SNAPSHOT rows (side=0: the per-key reference state — latest robots
snapshot per host, newest quality-model score per domain, last
purchase per user) and PROBE rows (side=1: the events to enrich).
Every probe picks up the newest snapshot at-or-before its timestamp —
the streaming twin of operators/asof.py (direction="backward"), kept
exactly-once across restarts by checkpointed keyed state.

The reference has no streaming (SURVEY.md §2.7 is an engine extra);
this is the canonical Spark custom-stateful pattern:
`applyInPandasWithState` keyed by the join key, GroupState holding
ONLY (latest snapshot ts, payload) — O(1) per key, never a history
buffer, so state size is #keys regardless of stream length. Within a
micro-batch the group's rows are sorted by (ts, side) — snapshot
before probe at equal timestamps, matching the batch operator — so
output is a pure function of (state, batch contents), never of Arrow
chunk arrival order.

Ordering contract across batches: state advances monotonically
(a snapshot OLDER than the stored one is ignored, it can no longer be
"the latest at" any future probe); probes are enriched against state
as of their OWN batch — a snapshot arriving in a later micro-batch
never rewrites an already-emitted probe. That is the standard
at-most-once-enrichment semantics of streaming asof; replaying the
landing data through the batch asof_join is the reconciliation path
when late snapshots matter.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

IN_SCHEMA = ("event_id long, user_id long, ts timestamp, "
             "side int, value double")
OUT_SCHEMA = ("event_id long, user_id long, ts timestamp, "
              "snap_value double, asof_ts timestamp")
STATE_SCHEMA = "sts long, sval double"

_US = 10 ** 6


def _enrich(key, pdfs, state: GroupState):
    cur_ts, cur_val = state.get if state.exists else (None, None)
    frames = [p for p in pdfs if len(p)]
    if not frames:
        if False:
            yield  # pragma: no cover - keeps the generator shape
        return
    pdf = pd.concat(frames, ignore_index=True)
    pdf = pdf.sort_values(["ts", "side"], kind="mergesort")
    out = {k: [] for k in ("event_id", "user_id", "ts",
                           "snap_value", "asof_ts")}
    for eid, uid, ts, side, val in zip(
            pdf["event_id"], pdf["user_id"], pdf["ts"], pdf["side"],
            pdf["value"]):
        t_us = int(ts.value // 1000)  # pandas ns -> us
        if side == 0:
            if cur_ts is None or t_us >= cur_ts:
                cur_ts, cur_val = t_us, float(val)
        else:
            out["event_id"].append(eid)
            out["user_id"].append(uid)
            out["ts"].append(ts)
            if cur_ts is not None and cur_ts <= t_us:
                out["snap_value"].append(cur_val)
                out["asof_ts"].append(
                    pd.Timestamp(cur_ts * 1000, unit="ns"))
            else:
                out["snap_value"].append(None)
                out["asof_ts"].append(pd.NaT)
    if cur_ts is not None:
        state.update((cur_ts, cur_val))
    if out["event_id"]:
        yield pd.DataFrame(out)


def stream_asof_enrich(spark, landing_dir: str, checkpoint_dir: str,
                       sink, available_now: bool = True):
    """landing parquet of IN_SCHEMA rows -> per-user as-of enrichment
    -> foreachBatch sink. Returns the started query."""
    src = (spark.readStream.schema(IN_SCHEMA)
           .parquet(landing_dir)
           .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull()))
    enriched = (src.groupBy("user_id")
                .applyInPandasWithState(
                    _enrich, OUT_SCHEMA, STATE_SCHEMA,
                    outputMode="append",
                    timeoutConf=GroupStateTimeout.NoTimeout))
    w = (enriched.writeStream.foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
