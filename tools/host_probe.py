"""Host-capacity probes that bracket the flagship's 8 -> 32 scaling
(round-3, VERDICT next-step #2): three workloads with known resource
profiles, each run at 8 and 32 concurrent workers, reporting the
per-worker throughput ratio (1.0 = perfect scaling).

  cpu     pure-ALU python loop (no memory traffic): isolates raw core
          availability / hypervisor throttling
  mem     NumPy streaming sum over a per-worker 256 MB array: isolates
          memory bandwidth
  jvm     pure-JVM Spark hash-aggregate over range() (no Python
          workers, no shuffle reads of consequence): isolates the JVM
          side of the flagship

If cpu ~1.0 but mem << 1.0, the box is bandwidth-limited (cycles stall
on memory and inflate measured CPU time). If cpu itself << 1.0, the
epoch simply does not deliver 32 cores. Either way the flagship's
32-thread inflation is host-shared-resource, not a plan defect —
the evidence the per-stage table needs.

Usage: python tools/host_probe.py [--probe cpu|mem|jvm|all]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cpu_work(_):
    x = 0
    for i in range(4_000_000):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return x


def _mem_work(_):
    import numpy as np
    a = np.arange(32 * 1024 * 1024, dtype=np.float64)  # 256 MB
    s = 0.0
    for _ in range(6):
        s += float(a.sum())
    return s


def _pool_time(fn, workers):
    with mp.Pool(workers) as p:
        t0 = time.time()
        p.map(fn, range(workers))
        return time.time() - t0


def probe_mp(fn, name):
    out = {}
    for w in (8, 32):
        # per-worker work is FIXED; perfect scaling = same wall time
        out[w] = round(_pool_time(fn, w), 2)
    out["eff_8_to_32"] = round(out[8] / out[32], 3)
    return {name: out}


def probe_jvm():
    from osc_geo_h3grid_srv_spark.engine import make_spark
    res = {}
    for cores in (8, 32):
        spark = make_spark(cores=cores, shuffle_partitions=cores,
                           extra_conf={"spark.ui.enabled": "false"})
        n = 2_000_000_000  # fixed TOTAL work

        def q():
            # lineage rebuilt per call: same-DataFrame re-collect would
            # reuse the materialized partial-agg exchange (BASELINE.md
            # shuffle-reuse trap) and time only the final stage
            return spark.range(0, n, 1, cores * 4).selectExpr(
                "xxhash64(id) as h").selectExpr(
                "sum(h % 1000000) as s", "count(1) as c").collect()
        q()  # warm codegen/JIT
        t0 = time.time()
        q()
        res[cores] = round(time.time() - t0, 2)
        spark.stop()
    # fixed total work: perfect 8->32 scaling = 4x faster
    res["eff_8_to_32"] = round(res[8] / (4.0 * res[32]), 3)
    return {"jvm": res}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default="all")
    args = ap.parse_args()
    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    if args.probe in ("cpu", "all"):
        out.update(probe_mp(_cpu_work, "cpu"))
    if args.probe in ("mem", "all"):
        out.update(probe_mp(_mem_work, "mem"))
    if args.probe in ("jvm", "all"):
        out.update(probe_jvm())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
