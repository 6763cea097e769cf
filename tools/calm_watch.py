"""Calm-epoch watcher: poll the host-capacity probe and fire ONE paired
scaling ladder (tools/bench_scaling.py --paired) the moment the box is
quiet, then exit so the operator can inspect/commit the artifact.

The burstable sandbox host withdraws capacity for minutes at a time
(BASELINE.md round-4/5 probe history); ladders fired into a degraded
epoch produce only honest-but-null attempts. Polling a ~30-second probe
every few minutes and launching only above the bar converts wall-clock
waiting into probe-clean evidence.

Exit codes: 0 = ladder fired and completed; 42 = gave up (no calm
window within --max-probes); 43 = busy-lock held the whole time.

Usage: python tools/calm_watch.py [--alu-bar 0.88] [--mem-bar 0.58]
           [--rounds 5] [--reps-per-round 2] [--max-probes 12]
           [--sleep 240]

A coordinating busy-lock (/tmp/graft_busy) suppresses probing while the
operator runs other heavy jobs, so the probe never measures our own
load as host churn.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUSY_LOCK = "/tmp/graft_busy"


def probe() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "host_probe.py")],
        capture_output=True, text=True, cwd=REPO)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    return json.loads(line[-1]) if line else {}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--alu-bar", type=float, default=0.88)
    ap.add_argument("--mem-bar", type=float, default=0.58)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--reps-per-round", type=int, default=2)
    ap.add_argument("--max-probes", type=int, default=12)
    ap.add_argument("--sleep", type=int, default=240)
    ap.add_argument("--pages", type=int, default=1000000)
    args = ap.parse_args()

    busy_streak = 0
    for i in range(args.max_probes):
        if os.path.exists(BUSY_LOCK):
            busy_streak += 1
            if busy_streak * 120 > args.max_probes * args.sleep:
                return 43
            time.sleep(120)
            continue
        busy_streak = 0
        p = probe()
        alu = p.get("cpu", {}).get("eff_8_to_32", 0.0)
        mem = p.get("mem", {}).get("eff_8_to_32", 0.0)
        print(f"probe {i}: alu={alu} mem={mem}", flush=True)
        if alu >= args.alu_bar and mem >= args.mem_bar:
            env = dict(os.environ, SPARK_GRAFT_PAGES=str(args.pages))
            rc = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "tools", "bench_scaling.py"),
                 "--paired", "--rounds", str(args.rounds),
                 "--reps-per-round", str(args.reps_per_round)],
                cwd=REPO, env=env).returncode
            print(f"ladder fired, rc={rc}", flush=True)
            return 0
        time.sleep(args.sleep)
    return 42


if __name__ == "__main__":
    sys.exit(main())
