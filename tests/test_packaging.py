"""Packaging gate (BASELINE.json north_star: "packaged for
spark-submit --py-files"): build the zip, run a real spark-submit with
ONLY the zip on the python path, end-to-end gen→load→verify rows."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("zip") is None, reason="zip not installed")
def test_spark_submit_with_pyfiles_zip(tmp_path):
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "package.sh")],
        capture_output=True, text=True, check=True,
    )
    zip_path = os.path.join(REPO, out.stdout.strip())
    assert os.path.exists(zip_path)

    # generate a tiny log with the local package (input prep)
    from dlt_spark.sources.changelog import write_change_log
    from dlt_spark.sources.generator import generate_change_log
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    assert spark is None or True  # conftest session may exist; make our own data
    from dlt_spark.session import get_spark

    s = get_spark("pkg-gen", master="local[4]")
    log = str(tmp_path / "log")
    write_change_log(
        generate_change_log(s, 500, n_keys=50, seed=3), log, part_width=250
    )

    spark_submit = os.path.join(
        os.path.dirname(os.path.dirname(sys.executable)), "bin", "spark-submit"
    )
    if not os.path.exists(spark_submit):
        spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not found"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_job.py"),
            "--log", log, "--table", str(tmp_path / "tbl"),
            "--batch-width", "250", "--n-buckets", "8",
            "--log-part-width", "250",
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    res = json.loads([l for l in p.stdout.splitlines() if l.startswith("{")][-1])
    assert res["batches_applied"] == 2
    assert res["events_read"] >= 500
