"""spark-submit --py-files launch + checkpoint resume (north_rule: the
job runs through spark-submit packaging, commits snapshot checkpoints
with per-partition lineage, and a rerun resumes (skips) committed
stages)."""

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin():
    import pyspark
    p = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                     "spark-submit")
    return p if os.path.exists(p) else None


@pytest.mark.skipif(_spark_submit_bin() is None,
                    reason="no spark-submit in this pyspark install")
def test_submit_job_and_resume(tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    pkg = os.path.join(REPO, "osc_geo_h3grid_srv_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for dirpath, _, names in os.walk(pkg):
            for n in names:
                if n.endswith(".py"):
                    full = os.path.join(dirpath, n)
                    zf.write(full, os.path.relpath(full, REPO))

    wh = str(tmp_path / "wh")
    cmd = [
        _spark_submit_bin(), "--master", "local[4]",
        "--py-files", zip_path,
        "--conf",
        "spark.driver.extraJavaOptions="
        "-Djava.security.egd=file:/dev/./urandom",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        os.path.join(REPO, "jobs", "index_pages_job.py"),
        "--warehouse", wh, "--n-pages", "4000", "--max-res", "7",
        "--rollup-res", "4",
    ]
    env = dict(os.environ)

    def run():
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             cwd=REPO, timeout=600)
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.startswith("JOB_REPORT ")]
        assert lines, f"no JOB_REPORT:\n{out.stdout[-2000:]}\n" \
                      f"{out.stderr[-3000:]}"
        return json.loads(lines[-1][len("JOB_REPORT "):])

    r1 = run()
    acts1 = {s["stage"]: s["action"] for s in r1["stages"]}
    assert acts1 == {"index_pages": "ran", "cell_rollup": "ran"}
    assert r1["page_points"]["total_rows"] > 0
    # per-partition lineage present: hive partition values recorded
    assert any(p != "{}" for p in r1["page_points"]["partitions"])
    rollup_rows = r1["page_points_rollup_r4"]["total_rows"]
    assert 0 < rollup_rows <= r1["page_points"]["total_rows"]

    # rerun: everything already committed for the same inputs -> resume
    # skips both stages, snapshots unchanged
    r2 = run()
    acts2 = {s["stage"]: s["action"] for s in r2["stages"]}
    assert acts2 == {"index_pages": "skipped", "cell_rollup": "skipped"}
    assert (r2["page_points"]["snapshot"]
            == r1["page_points"]["snapshot"])

    # simulate a mid-pipeline kill: drop the rollup output's HEAD -> only
    # the downstream stage reruns
    head = os.path.join(wh, "page_points_rollup_r4", "HEAD")
    assert os.path.exists(head), "no HEAD file for rollup table"
    os.remove(head)
    r3 = run()
    acts3 = {s["stage"]: s["action"] for s in r3["stages"]}
    assert acts3 == {"index_pages": "skipped", "cell_rollup": "ran"}
