"""Quantify the L0->L1 fold's share of the replay critical path
(guide §1: measure before touching): the driver-shape replay with the
default fold-at-max_deltas vs max_deltas high enough that no fold runs.
The difference is what an overlapped/early fold could reclaim.

Usage: python bench/replay_fold_ab.py [reps]
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

    spark = get_spark("dlt-replay-fold-ab", master=f"local[{cpus}]",
                      batch_width=batch_width)
    spark.sparkContext.setLogLevel("ERROR")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="dlt_rfab_", dir=base)
    log_path = os.path.join(work, "log")
    write_change_log(
        generate_change_log(spark, n_events, seed=42, dup_frac=0.05,
                            version_mix=(0.6, 0.25, 0.15)),
        log_path, part_width=part_width,
    )
    # warm-up
    wt = os.path.join(work, "warm")
    run_incremental(spark, log_path, wt, seq_to=n_events // 10 - 1,
                    batch_width=batch_width, n_buckets=64,
                    log_part_width=part_width)
    shutil.rmtree(wt, ignore_errors=True)

    def replay(max_deltas):
        tbl = os.path.join(work, "t")
        LakehouseTable.create(spark, tbl, n_buckets=64, max_deltas=max_deltas)
        t0 = time.monotonic()
        run_incremental(spark, log_path, tbl, batch_width=batch_width,
                        n_buckets=64, log_part_width=part_width,
                        max_inflight=4)
        dt = time.monotonic() - t0
        shutil.rmtree(tbl, ignore_errors=True)
        return round(dt, 3)

    runs = {"fold8": [], "nofold": []}
    for _ in range(reps):
        spark.sparkContext.setJobDescription("replay max_deltas=8 (fold)")
        runs["fold8"].append(replay(8))
        spark.sparkContext.setJobDescription("replay max_deltas=100 (no fold)")
        runs["nofold"].append(replay(100))
    out = {k: {"median": round(statistics.median(v), 3), "runs": v}
           for k, v in runs.items()}
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
