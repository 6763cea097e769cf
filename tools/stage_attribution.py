"""Per-stage attribution of the flagship's 8 -> 32 thread scaling
(VERDICT r02 Next-round #2: the Amdahl fit showed the PARALLEL component
inflating ~3x at 32 threads — below the ~0.7 memory-bandwidth ceiling
the bare-NumPy multiprocessing probe measured — and demanded a per-stage
table separating Python-worker, shuffle, and JVM time).

Method: run the flagship once (warm) + once measured at local[8] and
local[32] in separate subprocesses (fresh JVM each), with the Spark UI
enabled, then read the REST status API
(/api/v1/applications/{app}/stages) for the measured run's stages. For
every stage we record:

  wall        completionTime - submissionTime (critical-path seconds)
  task_s      executorRunTime: summed task wall across threads
  jvm_cpu_s   executorCpuTime: JVM-side on-CPU time
  gc_s        jvmGcTime
  non_jvm_s   task_s - jvm_cpu_s - gc_s: time tasks spent NOT burning
              JVM CPU — for ArrowEval/mapInArrow stages this is
              dominated by Python-worker compute + Arrow transfer; for
              exchange-reading stages by shuffle fetch/disk waits
  shuffle MB  read + written

Stages are matched 8-vs-32 by (ordinal, name). The inflation column
(task_32/task_8, ideal 1.0: same total work split across more threads)
localizes single-box contention: a stage whose TOTAL task seconds grow
at 32 threads is hitting a shared-resource ceiling (memory bandwidth,
page cache, GIL in the python workers), not adding real work.

Writes BENCH-SCALING-ATTRIB.json and prints a markdown table for
BASELINE.md.

Usage: python tools/stage_attribution.py [--pages 1000000]
       python tools/stage_attribution.py --cores 8   (child mode)
       python tools/stage_attribution.py --queries knn_graph,\
           containment_pairs,distance_pairs_join
           (VERDICT r4 Next #7: per-stage 8-vs-32 shuffle-byte evidence
           for the heaviest suite operators, noop-sink forced at
           $SPARK_GRAFT_SF_DIR, merged into BENCH-SCALING-ATTRIB.json
           under "queries")
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rest(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read())


def run_level(cores: int, n_pages: int, query: str | None = None) -> dict:
    from bench import _flagship_pipeline, prepare_pages
    from osc_geo_h3grid_srv_spark.engine import make_spark

    spark = make_spark(cores=cores, shuffle_partitions=max(cores * 2, 16),
                       extra_conf={"spark.ui.enabled": "true",
                                   "spark.ui.port": "0",
                                   "spark.driver.memory": "24g"})
    if query:
        import __spark_entry__ as em
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                                "/root/testdata/sf0.1")
        qfn = em.queries()[query]

        def work():
            # same noop sink as bench.py (count() would let Catalyst
            # prune map-only work)
            qfn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
    else:
        pages_path = prepare_pages(spark, n_pages)

        def work():
            _flagship_pipeline(spark, pages_path)
    work()  # warm (untimed, like bench)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    t0 = time.time()
    work()
    wall = time.time() - t0

    stages = _rest(ui, f"/api/v1/applications/{app_id}/stages"
                       "?status=complete")
    # keep only stages of the measured run (submitted after t0)
    t0_ms = int(t0 * 1000)
    rows = []
    for st in stages:
        sub = st.get("submissionTime")
        if not sub:
            continue
        # ISO8601 '2026-08-17T10:00:00.000GMT'
        import datetime as dt
        ts = dt.datetime.strptime(
            sub.replace("GMT", "+0000"),
            "%Y-%m-%dT%H:%M:%S.%f%z").timestamp() * 1000
        if ts < t0_ms:
            continue
        comp = st.get("completionTime")
        cts = dt.datetime.strptime(
            comp.replace("GMT", "+0000"),
            "%Y-%m-%dT%H:%M:%S.%f%z").timestamp() * 1000 if comp else ts
        task_s = st["executorRunTime"] / 1e3
        cpu_s = st["executorCpuTime"] / 1e9
        gc_s = st.get("jvmGcTime", 0) / 1e3
        rows.append({
            "name": st["name"].split(" at ")[0][:48],
            "ntasks": st["numCompleteTasks"],
            "wall_s": round((cts - ts) / 1e3, 2),
            "task_s": round(task_s, 2),
            "jvm_cpu_s": round(cpu_s, 2),
            "gc_s": round(gc_s, 2),
            "non_jvm_s": round(max(task_s - cpu_s - gc_s, 0.0), 2),
            "shuffle_mb": round((st.get("shuffleReadBytes", 0)
                                 + st.get("shuffleWriteBytes", 0)) / 2**20,
                                1),
        })
    rows.sort(key=lambda r: -r["task_s"])
    spark.stop()
    return {"cores": cores, "wall": round(wall, 2), "stages": rows}


def _run_pair(pages: int, query: str | None):
    """run local[8] and local[32] children, return (levels, matched)."""
    levels = {}
    for cores in (8, 32):
        cmd = [sys.executable, os.path.abspath(__file__), "--cores",
               str(cores), "--pages", str(pages)]
        if query:
            cmd += ["--query", query]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             cwd=REPO, env=os.environ)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            sys.stderr.write(out.stdout + out.stderr)
            raise SystemExit(f"level local[{cores}] failed"
                             + (f" ({query})" if query else ""))
        levels[cores] = json.loads(line[-1][len("RESULT "):])

    # match stages by (ordinal within sorted-by-name, name)
    def keyed(rows):
        seen, out = {}, {}
        for r in sorted(rows, key=lambda r: r["name"]):
            k = (r["name"], seen.get(r["name"], 0))
            seen[r["name"]] = k[1] + 1
            out[k] = r
        return out

    k8, k32 = keyed(levels[8]["stages"]), keyed(levels[32]["stages"])
    table = []
    for k in sorted(set(k8) | set(k32)):
        a, b = k8.get(k), k32.get(k)
        row = {"stage": f"{k[0]}#{k[1]}",
               "task_s_8": a and a["task_s"], "task_s_32": b and b["task_s"],
               "non_jvm_8": a and a["non_jvm_s"],
               "non_jvm_32": b and b["non_jvm_s"],
               "jvm_cpu_8": a and a["jvm_cpu_s"],
               "jvm_cpu_32": b and b["jvm_cpu_s"],
               "wall_8": a and a["wall_s"], "wall_32": b and b["wall_s"],
               "shuffle_mb_8": a and a["shuffle_mb"],
               "shuffle_mb_32": b and b["shuffle_mb"]}
        if a and b and a["task_s"] > 0.05:
            row["work_inflation_32_vs_8"] = round(
                b["task_s"] / a["task_s"], 2)
        table.append(row)
    return levels, table


def _print_table(table, levels):
    print("\n| stage | task_s 8 | task_s 32 | inflation | non-JVM 8 | "
          "non-JVM 32 | JVM-cpu 8 | JVM-cpu 32 | shuffle MB |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in sorted(table, key=lambda r: -(r["task_s_32"] or 0)):
        print(f"| {r['stage']} | {r['task_s_8']} | {r['task_s_32']} | "
              f"{r.get('work_inflation_32_vs_8', '')} | "
              f"{r['non_jvm_8']} | {r['non_jvm_32']} | "
              f"{r['jvm_cpu_8']} | {r['jvm_cpu_32']} | "
              f"{r['shuffle_mb_32']} |")
    print(f"\nwall: local[8] {levels[8]['wall']}s -> local[32] "
          f"{levels[32]['wall']}s")


def _same_epoch_probes():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import host_probe as hp
    probes = {}
    probes.update(hp.probe_mp(hp._cpu_work, "cpu"))
    probes.update(hp.probe_mp(hp._mem_work, "mem"))
    probes.update(hp.probe_jvm())
    return probes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--query", type=str, default=None)
    ap.add_argument("--queries", type=str, default=None)
    ap.add_argument("--pages", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_PAGES",
                                               "1000000")))
    args = ap.parse_args()

    if args.cores:
        print("RESULT " + json.dumps(
            run_level(args.cores, args.pages, args.query)))
        return

    path = os.path.join(REPO, "BENCH-SCALING-ATTRIB.json")
    if args.queries:
        record = json.load(open(path)) if os.path.exists(path) else {}
        qsec = record.setdefault("queries", {})
        for name in args.queries.split(","):
            levels, table = _run_pair(args.pages, name)
            qsec[name] = {
                "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR",
                                         "/root/testdata/sf0.1"),
                "wall_8": levels[8]["wall"],
                "wall_32": levels[32]["wall"],
                "per_level": levels, "matched": table}
            print(f"\n== {name} ==")
            _print_table(table, levels)
        record["queries_host_probes_same_epoch"] = _same_epoch_probes()
        with open(path, "w") as fh:
            json.dump(record, fh, indent=1)
        return

    levels, table = _run_pair(args.pages, None)

    # same-epoch host probes (tools/host_probe.py): bracket the flagship
    # between a pure-ALU, a memory-streaming, and a pure-JVM workload so
    # the stage inflation can be attributed to host capacity vs plan
    result = {"pages": args.pages,
              "wall_8": levels[8]["wall"], "wall_32": levels[32]["wall"],
              "host_probes_same_epoch": _same_epoch_probes(),
              "per_level": levels, "matched": table}
    if os.path.exists(path):  # keep the per-query sections if present
        old = json.load(open(path))
        for k in ("queries", "queries_host_probes_same_epoch"):
            if k in old:
                result[k] = old[k]
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    _print_table(table, levels)


if __name__ == "__main__":
    main()
