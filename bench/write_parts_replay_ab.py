"""A/B the bucket-clustered write partition count at the FULL replay
level (bench.py's cdc_replay shape: 3.15M events, 8 batches,
max_inflight=4, n_buckets=64).

fold_parts_ab.py priced the fold WRITE in isolation (p=256 beats the
old min(n_buckets, conf)=32 by ~9%); this harness checks the same
switch inside the real pipeline, where the 256-task fold competes with
concurrent prepares for the FIFO scheduler — the one way the isolated
win could invert.  Variants are monkeypatched per rep and interleaved
so box drift hits both sides equally.

Usage: python bench/write_parts_replay_ab.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_events = int(os.environ.get("BENCH_EVENTS", "3150000"))
    batch_width = n_events // 8
    part_width = max(10_000, n_events // 32)

    from dlt_spark.lakehouse import LakehouseTable
    from dlt_spark.plans.runner import run_incremental
    from dlt_spark.session import get_spark
    from dlt_spark.sources.changelog import write_change_log
    from dlt_spark.sources.generator import generate_change_log

    spark = get_spark("dlt-wparts-ab", master=f"local[{cpus}]",
                      batch_width=batch_width)
    spark.sparkContext.setLogLevel("ERROR")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="dlt_wpab_", dir=base)
    log_path = os.path.join(work, "log")
    write_change_log(
        generate_change_log(spark, n_events, seed=42, dup_frac=0.05,
                            version_mix=(0.6, 0.25, 0.15)),
        log_path, part_width=part_width,
    )

    new_wp = LakehouseTable._write_partitions

    def old_wp(self):
        return min(self.n_buckets, int(
            self.spark.conf.get("spark.sql.shuffle.partitions", "32")))

    variants = {"new_4x_buckets": new_wp, "old_min_conf": old_wp}
    runs: dict[str, list[float]] = {k: [] for k in variants}
    seq = [0]

    def replay(tag: str) -> float:
        seq[0] += 1
        tbl = os.path.join(work, f"t{seq[0]}")
        spark.sparkContext.setJobDescription(f"replay {tag}")
        t0 = time.monotonic()
        run_incremental(spark, log_path, tbl, batch_width=batch_width,
                        n_buckets=64, log_part_width=part_width,
                        max_inflight=4)
        dt = round(time.monotonic() - t0, 3)
        shutil.rmtree(tbl, ignore_errors=True)
        return dt

    replay("warm")  # untimed: JIT/codegen/page-cache warm
    try:
        for _ in range(reps):
            for name, fn in variants.items():
                LakehouseTable._write_partitions = fn
                runs[name].append(replay(name))
    finally:
        LakehouseTable._write_partitions = new_wp
    print(json.dumps({k: {"median": round(statistics.median(v), 3),
                          "runs": v} for k, v in runs.items()}))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
