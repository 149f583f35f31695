"""Capture .explain("formatted") for the round-6 deliverables.

Writes plans/r06/<name>_<tag>.txt for each touched query/pipeline.
Run with PYTHONPATH at the tree to capture and tag as argv[1]
("before" from the round-start worktree, "after" from the final tree).
"""

from __future__ import annotations

import contextlib
import io
import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F


def grab(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "plans/r06"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from dlt_spark.adapters import get_adapter
    from dlt_spark.lakehouse import LakehouseTable
    from dlt_spark.operators.dedup import dedup_lww
    from dlt_spark.plans.runner import run_incremental
    from dlt_spark.session import get_spark
    from dlt_spark.sources.changelog import (
        open_change_log, slice_change_log, write_change_log,
    )
    from dlt_spark.sources.generator import generate_change_log

    spark = get_spark("plans-r06", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    def put(name, df):
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(grab(df))
        print(f"wrote {name}_{tag}")

    # entry queries the round touched / benches
    from dlt_spark.entry_queries import QUERIES

    for name in (
        "cdc_lww_final_state", "docs_minhash_sig", "docs_simhash",
        "cdc_normalize_versions", "docs_token_count", "emb_cosine_topk",
        "cdc_batch_lineage",
    ):
        put(name, QUERIES[name](spark, sf_dir))

    # ingest pipeline plans (the cdc_replay / exploded suites substrate)
    work = tempfile.mkdtemp(prefix="dlt_plans_", dir="/dev/shm"
                            if os.path.isdir("/dev/shm") else None)
    n = 100_000
    pw = 25_000
    log = os.path.join(work, "log")
    write_change_log(
        generate_change_log(spark, n, seed=42, dup_frac=0.05,
                            version_mix=(0.6, 0.25, 0.15)), log, pw)
    try:
        log_df = open_change_log(spark, log, seq_from=0, seq_to=n - 1,
                                 part_width=pw)
    except TypeError:  # round-start signature
        log_df = open_change_log(spark, log)
    from dlt_spark.functions.normalize import normalize_events

    put("ingest_batch_pipeline",
        dedup_lww(normalize_events(slice_change_log(log_df, 0, n - 1, pw)),
                  with_counts=True))

    # exploded cascade phase-A tick plan
    ev = generate_change_log(spark, n, seed=44, version_mix=(1.0, 0.0, 0.0))
    exploded_ev = ev.withColumn(
        "payload",
        F.when(F.col("op") != "D", F.to_json(F.struct(
            F.slice(F.col("tokens"), 1, 4).alias("block"),
            F.array(F.slice(F.col("tokens"), 5, 8),
                    F.slice(F.col("tokens"), 13, 8)).alias("txs"),
        ))),
    ).withColumn("tokens", F.lit(None).cast("array<int>"))
    log3 = os.path.join(work, "log3")
    write_change_log(exploded_ev, log3, pw)
    tbl = os.path.join(work, "tbl")
    bw = n // 4
    for b in range(2):
        run_incremental(spark, log3, tbl, schema="exploded_cascade",
                        seq_from=b * bw, seq_to=(b + 1) * bw - 1,
                        batch_width=bw, n_buckets=64, log_part_width=pw)
    adapter = get_adapter("exploded_cascade")
    table = LakehouseTable.create(spark, tbl, n_buckets=64,
                                  bucket_expr=adapter.bucket_expr)
    try:
        l3 = open_change_log(spark, log3, seq_from=2 * bw, seq_to=3 * bw - 1,
                             part_width=pw)
    except TypeError:
        l3 = open_change_log(spark, log3)
    normalized = adapter.normalize(slice_change_log(l3, 2 * bw, 3 * bw - 1, pw))
    put("cascade_phaseA_tick",
        dedup_lww(adapter.expand_deletes(normalized, table, del_rows=None,
                                         materialize=False),
                  with_counts=True))

    # MoR tiered read (7 pending deltas on a compacted base)
    log2 = os.path.join(work, "log2")
    write_change_log(generate_change_log(spark, n, n_keys=n, seed=43), log2, pw)
    tbl2 = os.path.join(work, "tbl2")
    dw = max(1, n // 100)
    run_incremental(spark, log2, tbl2, seq_to=n - 7 * dw - 1, batch_width=n,
                    n_buckets=64, log_part_width=pw)
    t2 = LakehouseTable.load(spark, tbl2)
    t2.compact()
    run_incremental(spark, log2, tbl2, seq_from=n - 7 * dw, batch_width=dw,
                    n_buckets=64, log_part_width=pw)
    t2 = t2.refresh()
    put("mor_read_auto", t2.read())

    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
