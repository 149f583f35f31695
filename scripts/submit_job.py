"""spark-submit entry point (cluster deployment shape).

    spark-submit --py-files dist/dlt_spark.zip scripts/submit_job.py \
        --log /data/events --table /lake/training_sequences \
        [--from-seq N] [--to-seq M] [--force] [--batch-width W]

Unlike the dev CLI (dlt_spark.cli), this does NOT build its own master:
spark-submit owns the cluster config; we only read the session.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--job-id", default="dlt")
    ap.add_argument("--from-seq", type=int, default=None)
    ap.add_argument("--to-seq", type=int, default=None)
    ap.add_argument("--batch-width", type=int, default=10_000_000)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--log-part-width", type=int, default=100_000)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--arrow-udf", action="store_true")
    args = ap.parse_args()

    from dlt_spark.plans.runner import run_incremental

    spark = SparkSession.builder.getOrCreate()
    res = run_incremental(
        spark, args.log, args.table, job_id=args.job_id,
        seq_from=args.from_seq, seq_to=args.to_seq,
        batch_width=args.batch_width, n_buckets=args.n_buckets,
        force=args.force, use_arrow_udf=args.arrow_udf,
        log_part_width=args.log_part_width,
    )
    print(json.dumps({
        "batches_applied": res.batches_applied,
        "events_read": res.events_read,
        "events_applied": res.events_applied,
        "wall_secs": round(res.wall_secs, 3),
        "events_per_sec": round(res.events_per_sec, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
