"""Round-close gate (VERDICT r4 Next #6): make "verified at HEAD"
mechanically true before the final commit of a round, instead of true
by one commit's grace.

Checks, in order (exit 1 on the first failure):

1. VERIFY_LOCAL.json exists, n_bad == 0, and NO code path changed
   between its git_head_at_run and the current HEAD — artifact-only
   commits (*.json, *.md, PLANS.md) after the verified commit are fine,
   code commits are not. This is the precise form of "verified at
   HEAD": the verify ran against exactly the code that ships.
2. tools/gate_window.py exits 0 (the driver's 50-slot window leads
   with never-gated entries).
3. No duplicate top-level function names in __spark_entry__.py (the r4
   `_lpa_oracle_sql` collision silently swapped an oracle).
4. Every queries() entry either has an oracle_sql() or is a documented
   rows-only kernel entry (sanity count printed).

Usage:  python tools/round_close.py
"""

from __future__ import annotations

import ast
import collections
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: paths that can change a queries()/oracle_sql() result — the verify
#: artifact must postdate the last commit touching any of these.
#: tests/, tools/, bench.py are code too but cannot alter oracle
#: outcomes, so they don't invalidate a verify run.
CODE_PREFIXES = ("osc_geo_h3grid_srv_spark/", "jobs/",
                 "__spark_entry__.py")


def fail(msg):
    print(f"ROUND-CLOSE FAIL: {msg}")
    sys.exit(1)


def main():
    # 1. verify artifact is n_bad == 0 and covers the shipping code
    vpath = os.path.join(REPO, "VERIFY_LOCAL.json")
    if not os.path.exists(vpath):
        fail("VERIFY_LOCAL.json missing — run tools/verify_entry.py "
             "(full, no name filter) first")
    v = json.load(open(vpath))
    if v.get("n_bad", 1) != 0:
        fail(f"VERIFY_LOCAL.json has n_bad={v.get('n_bad')}")
    run_head = v.get("git_head_at_run")
    if not run_head:
        fail("VERIFY_LOCAL.json lacks git_head_at_run")
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
    diff = subprocess.run(
        ["git", "diff", "--name-only", f"{run_head}..{head}"],
        cwd=REPO, capture_output=True, text=True)
    if diff.returncode != 0:
        fail(f"git diff {run_head[:12]}..HEAD failed (unknown commit? "
             "verify artifact from another tree?)")
    changed = [f for f in diff.stdout.splitlines() if f]
    code_changed = [f for f in changed
                    if f.startswith(CODE_PREFIXES)]
    dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO,
        capture_output=True, text=True).stdout.splitlines()
    dirty_code = [ln for ln in dirty
                  if ln[3:].startswith(CODE_PREFIXES)]
    if code_changed:
        fail(f"code changed since verified head {run_head[:12]}: "
             f"{code_changed[:10]} — re-run full verify_entry")
    if dirty_code:
        fail(f"uncommitted code in working tree: {dirty_code[:10]}")
    print(f"verify: {v['n_ok']} ok / 0 bad at {run_head[:12]} "
          f"(result-affecting code identical to HEAD {head[:12]}; "
          f"{len(changed)} non-result-affecting paths since)")

    # 2. gate window
    gw = subprocess.run([sys.executable,
                         os.path.join(REPO, "tools", "gate_window.py")],
                        capture_output=True, text=True)
    if gw.returncode != 0:
        fail("gate_window.py exit != 0:\n" + gw.stdout)
    print("gate window: OK")

    # 3. duplicate top-level function names in the entry module
    tree = ast.parse(open(os.path.join(REPO, "__spark_entry__.py")).read())
    counts = collections.Counter(
        n.name for n in tree.body if isinstance(n, ast.FunctionDef))
    dupes = {k: c for k, c in counts.items() if c > 1}
    if dupes:
        fail(f"duplicate top-level functions in __spark_entry__.py: "
             f"{dupes}")
    print("entry module: no duplicate function names")

    # 4. oracle coverage count
    import __spark_entry__ as e
    q = e.queries()
    o = e.oracle_sql()
    rows_only = [k for k in q if k not in o]
    print(f"registry: {len(q)} entries, {len(q) - len(rows_only)} "
          f"oracle-gated, rows-only: {sorted(rows_only)}")
    print("ROUND-CLOSE OK")


if __name__ == "__main__":
    main()
