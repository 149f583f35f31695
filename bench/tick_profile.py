"""Instrument one steady-state tick (49k-event exploded batch, the
bench _ticks shape) step by step: table open, log open, plan, prefetch,
prepare (normalize+dedup+write), commit.  Guide §1: find the fixed
floor before shaving it."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n3 = int(os.environ.get("BENCH_EVENTS", "393750"))
    pw3 = max(10_000, n3 // 32)
    bw3 = n3 // 8

    from dlt_spark.adapters import get_adapter
    from dlt_spark.lakehouse import LakehouseTable
    from dlt_spark.operators.dedup import dedup_lww
    from dlt_spark.plans.runner import run_incremental
    from dlt_spark.session import get_spark
    from dlt_spark.sources.changelog import (
        open_change_log, slice_change_log, write_change_log,
    )
    from dlt_spark.sources.generator import generate_change_log

    spark = get_spark("dlt-tick-prof", master=f"local[{cpus}]",
                      batch_width=bw3)
    spark.sparkContext.setLogLevel("ERROR")

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="dlt_tickprof_", dir=base)
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

    tbl = os.path.join(work, "tbl")
    # seed ticks 0..4 so the instrumented tick is mid-stream
    for b in range(5):
        run_incremental(spark, log3, tbl, schema="exploded",
                        seq_from=b * bw3, seq_to=(b + 1) * bw3 - 1,
                        batch_width=bw3, n_buckets=64, log_part_width=pw3)

    out = {}
    t = {}

    def mark(k):
        t[k] = time.monotonic()

    def took(k, since):
        out[k] = round(time.monotonic() - t[since], 3)

    b = 5
    lo, hi = b * bw3, (b + 1) * bw3 - 1

    mark("t0")
    adapter = get_adapter("exploded")
    table = LakehouseTable.create(spark, tbl, n_buckets=64,
                                  bucket_expr=adapter.bucket_expr)
    took("open_table", "t0")

    mark("t1")
    log_df = open_change_log(spark, log3)
    took("open_log", "t1")

    mark("t2")
    events = slice_change_log(log_df, lo, hi, pw3)
    normalized = adapter.normalize(events)
    updates = dedup_lww(normalized, with_counts=True)
    took("build_plan", "t2")

    mark("t3")
    prepared = table.prepare_delta(updates, "dlt", b)
    took("prepare", "t3")

    mark("t4")
    table.commit_delta(prepared, "dlt", b, seq_from=lo, seq_to=hi)
    took("commit", "t4")

    # a full tick via the runner for comparison
    b = 6
    mark("t5")
    run_incremental(spark, log3, tbl, schema="exploded",
                    seq_from=b * bw3, seq_to=(b + 1) * bw3 - 1,
                    batch_width=bw3, n_buckets=64, log_part_width=pw3)
    took("runner_tick", "t5")

    # noop-only pipeline (no write, no commit): the pure compute floor
    b = 7
    lo, hi = b * bw3, (b + 1) * bw3 - 1
    mark("t6")
    dedup_lww(adapter.normalize(slice_change_log(log_df, lo, hi, pw3)),
              with_counts=True).write.format("noop").mode("overwrite").save()
    took("noop_pipeline", "t6")

    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
