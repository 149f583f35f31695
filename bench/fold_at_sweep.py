"""Sweep the early-fold threshold on the driver replay shape
(guide §1: measure, don't guess).  fold_at ∈ {2, 4, 6} vs the
pre-round-6 fold-at-the-end behavior (early folds disabled by
early_fold_at > batches).

Usage: python bench/fold_at_sweep.py [reps]
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

    spark = get_spark("dlt-fold-sweep", master=f"local[{cpus}]",
                      batch_width=batch_width)
    spark.sparkContext.setLogLevel("ERROR")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="dlt_fsw_", dir=base)
    log_path = os.path.join(work, "log")
    write_change_log(
        generate_change_log(spark, n_events, seed=42, dup_frac=0.05,
                            version_mix=(0.6, 0.25, 0.15)),
        log_path, part_width=part_width,
    )
    wt = os.path.join(work, "warm")
    run_incremental(spark, log_path, wt, seq_to=n_events // 10 - 1,
                    batch_width=batch_width, n_buckets=64,
                    log_part_width=part_width)
    shutil.rmtree(wt, ignore_errors=True)

    def replay(fold_at):
        tbl = os.path.join(work, "t")
        t0 = time.monotonic()
        run_incremental(spark, log_path, tbl, batch_width=batch_width,
                        n_buckets=64, log_part_width=part_width,
                        max_inflight=4, early_fold_at=fold_at)
        dt = time.monotonic() - t0
        shutil.rmtree(tbl, ignore_errors=True)
        return round(dt, 3)

    variants = {"end": 99, "at2": 2, "at4": 4, "at6": 6}
    runs = {k: [] for k in variants}
    for _ in range(reps):
        for k, v in variants.items():
            spark.sparkContext.setJobDescription(f"replay fold_at={k}")
            runs[k].append(replay(v))
    out = {k: {"median": round(statistics.median(v), 3), "runs": v}
           for k, v in runs.items()}
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
