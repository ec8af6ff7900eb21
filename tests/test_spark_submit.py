"""Cluster-submittability: the package must run via spark-submit
--py-files from a foreign cwd (north rule: "run via spark-submit
--py-files on a multi-executor cluster") — i.e. no repo-relative
imports or driver-cwd dependencies anywhere in the crawl path,
including inside the Arrow UDFs that executors deserialize."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_submit_crawl_pyfiles(tmp_path):
    zip_path = str(tmp_path / "mechaml_spark.zip")
    pkg = os.path.join(REPO, "mechaml_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_crawl.py"),
            "--hosts", "2", "--pages", "6", "--budget", "4",
            "--epochs", "2", "--shards", "2", "--shuffle-partitions", "8",
            "--out", out_dir,
        ],
        cwd=str(tmp_path),  # foreign cwd: repo-relative imports would fail
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    assert metrics["visited"] > 0 and metrics["payload"] > 0
    assert metrics["master"] == "local[4]"
    assert os.path.isdir(os.path.join(out_dir, "visit_log"))
    assert os.path.isdir(os.path.join(out_dir, "payload"))
