"""Micro A/Bs for the steady-tick fixed floor (round 6):
  1. job latency with AQE on vs off (same pipeline, 49k-event batch)
  2. log open via partition-dir-direct read vs full-dataset open
  3. plan build cost: chained withColumns vs fused single select
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import functions as F


def _med(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        ts.append(round(time.monotonic() - t0, 3))
    return round(statistics.median(ts), 3), ts


def main() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n3 = int(os.environ.get("BENCH_EVENTS", "393750"))
    pw3 = max(10_000, n3 // 32)
    bw3 = n3 // 8

    from dlt_spark.adapters import get_adapter
    from dlt_spark.operators.dedup import dedup_lww
    from dlt_spark.session import get_spark
    from dlt_spark.sources.changelog import (
        open_change_log, slice_change_log, write_change_log, _LOG_SCHEMA,
    )
    from dlt_spark.sources.generator import generate_change_log

    spark = get_spark("dlt-tick-ab", master=f"local[{cpus}]", batch_width=bw3)
    spark.sparkContext.setLogLevel("ERROR")

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="dlt_tickab_", dir=base)
    log3 = os.path.join(work, "log3")
    ev3 = generate_change_log(spark, n3, seed=44, version_mix=(1.0, 0.0, 0.0))
    exploded_ev = ev3.withColumn(
        "payload",
        F.when(
            F.col("op") != "D",
            F.to_json(F.struct(
                F.slice(F.col("tokens"), 1, 4).alias("block"),
                F.array(
                    F.slice(F.col("tokens"), 5, 8),
                    F.slice(F.col("tokens"), 13, 8),
                ).alias("txs"),
            )),
        ),
    ).withColumn("tokens", F.lit(None).cast("array<int>"))
    write_change_log(exploded_ev, log3, pw3)
    adapter = get_adapter("exploded")
    out = {}

    lo, hi = 5 * bw3, 6 * bw3 - 1

    # --- 1. pipeline job, AQE on (current) ---
    log_df = open_change_log(spark, log3)

    def pipe():
        return dedup_lww(
            adapter.normalize(slice_change_log(log_df, lo, hi, pw3)),
            with_counts=True,
        )

    # warm codegen
    pipe().write.format("noop").mode("overwrite").save()
    out["job_aqe_on"] = _med(
        lambda: pipe().write.format("noop").mode("overwrite").save()
    )

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    pipe().write.format("noop").mode("overwrite").save()
    out["job_aqe_off"] = _med(
        lambda: pipe().write.format("noop").mode("overwrite").save()
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    # --- 2. log open variants ---
    out["open_full"] = _med(lambda: open_change_log(spark, log3), n=5)

    def open_dirs():
        lo_p, hi_p = lo // pw3, hi // pw3
        dirs = [
            os.path.join(log3, f"seq_part={p}")
            for p in range(lo_p, hi_p + 1)
            if os.path.isdir(os.path.join(log3, f"seq_part={p}"))
        ]
        return (
            spark.read.schema(_LOG_SCHEMA)
            .option("basePath", log3)
            .parquet(*dirs)
            .where(F.col("commit_seq").between(lo, hi))
            .drop("seq_part")
        )

    out["open_dirs"] = _med(open_dirs, n=5)
    # same results?
    a = slice_change_log(open_change_log(spark, log3), lo, hi, pw3).count()
    b = open_dirs().count()
    out["open_equal"] = (a == b, a)

    # job using dir-direct open (end to end incl. open)
    def job_dirs():
        dedup_lww(adapter.normalize(open_dirs()), with_counts=True) \
            .write.format("noop").mode("overwrite").save()

    job_dirs()
    out["job_open_dirs"] = _med(job_dirs)

    def job_full():
        dedup_lww(
            adapter.normalize(
                slice_change_log(open_change_log(spark, log3), lo, hi, pw3)
            ),
            with_counts=True,
        ).write.format("noop").mode("overwrite").save()

    job_full()
    out["job_open_full"] = _med(job_full)

    # --- 3. plan-build cost alone (no execution) ---
    out["build_current"] = _med(lambda: pipe(), n=5)

    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
