"""A/B the L0->L1 fold's reduce-partition count (guide §2.5: few
distinct key values into a comparable partition count = collision
skew).  repartition(p, "_bucket") with 64 distinct bucket ids:
  p=32  (today, the replay's derived conf): max 5 buckets in one task
  p=64: max 4;  p=128: max 3;  p=256: max 2;  p=501: injective (1)
Empty partitions become (trivial) scheduled tasks because an explicit
repartition opts out of AQE coalescing — this harness prices both
effects honestly on the real fold substrate.

Usage: python bench/fold_parts_ab.py [reps]
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

    from pyspark.sql import functions as F

    from dlt_spark.lakehouse import LakehouseTable
    from dlt_spark.plans.runner import run_incremental
    from dlt_spark.session import get_spark
    from dlt_spark.sources.changelog import write_change_log
    from dlt_spark.sources.generator import generate_change_log

    spark = get_spark("dlt-fold-parts", master=f"local[{cpus}]",
                      batch_width=batch_width)
    spark.sparkContext.setLogLevel("ERROR")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="dlt_fpab_", dir=base)
    log_path = os.path.join(work, "log")
    write_change_log(
        generate_change_log(spark, n_events, seed=42, dup_frac=0.05,
                            version_mix=(0.6, 0.25, 0.15)),
        log_path, part_width=part_width,
    )
    tbl = os.path.join(work, "t")
    LakehouseTable.create(spark, tbl, n_buckets=64, max_deltas=100)
    run_incremental(spark, log_path, tbl, batch_width=batch_width,
                    n_buckets=64, log_part_width=part_width)
    t = LakehouseTable.load(spark, tbl)
    paths = t._abs([p for e in t._snap["deltas"] for p in e["files"]])

    def fold_write(p):
        df = t._raw(paths)
        cols = df.columns
        ordering = F.struct(
            F.col("_commit_seq").alias("_s"),
            F.col("_deleted").cast("int").alias("_d"),
            F.col("_row_id").alias("_r"),
        )
        winner = F.max_by(F.struct(*[F.col(c) for c in cols]), ordering).alias("w")
        resolved = (
            df.repartition(p, "_bucket")
            .groupBy("_bucket", "doc_id").agg(winner).select("w.*")
        )
        d = os.path.join(work, "out")
        (resolved.write.mode("overwrite")
         .option("parquet.enable.dictionary", "false")
         .partitionBy("_bucket").parquet(d))
        n_files = sum(len(fs) for _, _, fs in os.walk(d))
        shutil.rmtree(d, ignore_errors=True)
        return n_files

    # mimic the replay-time conf (the runner derives 32 for this shape)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    variants = (32, 64, 128, 256, 501)
    runs = {p: [] for p in variants}
    files = {}
    fold_write(64)  # warm
    for _ in range(reps):
        for p in variants:
            spark.sparkContext.setJobDescription(f"fold write p={p}")
            t0 = time.monotonic()
            files[p] = fold_write(p)
            runs[p].append(round(time.monotonic() - t0, 3))
    out = {str(p): {"median": round(statistics.median(v), 3), "runs": v,
                    "files": files[p]}
           for p, v in runs.items()}
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
