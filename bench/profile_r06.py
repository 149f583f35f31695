"""Round-6 phase profiler (guide §1: measure first).

Decomposes the bench.py replay pipeline into its phases at the driver's
sf0.1 shape (3.15M events, 8 batches, local[32], tmpfs) so optimization
targets the phase that actually costs, not the one that looks guilty.
Timed with the noop sink (guide §1.4) and labelled jobs (§1.5).

Usage:  python bench/profile_r06.py [phases|plans]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def _med(fn, n=3, cleanup=None):
    ts = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        ts.append(round(time.monotonic() - t0, 3))
        if cleanup is not None:
            cleanup()
    return round(statistics.median(ts), 3), ts


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "phases"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_events = int(os.environ.get("BENCH_EVENTS", "3150000"))
    batch_count = 8
    batch_width = max(1, n_events // batch_count)
    part_width = max(10_000, n_events // 32)

    from dlt_spark.lakehouse import LakehouseTable
    from dlt_spark.operators.dedup import dedup_lww
    from dlt_spark.plans.runner import run_incremental
    from dlt_spark.session import get_spark
    from dlt_spark.sources.changelog import (
        open_change_log, slice_change_log, write_change_log,
    )
    from dlt_spark.sources.generator import generate_change_log

    spark = get_spark("dlt-profile-r06", master=f"local[{cpus}]",
                      batch_width=batch_width)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="dlt_prof_", dir=base)
    log_path = os.path.join(work, "log")

    events = generate_change_log(
        spark, n_events, seed=42, dup_frac=0.05, version_mix=(0.6, 0.25, 0.15)
    )
    write_change_log(events, log_path, part_width=part_width)
    log_df = open_change_log(spark, log_path)
    from dlt_spark.functions.normalize import normalize_events

    out: dict[str, object] = {"events": n_events, "cpus": cpus}

    def batch_sliced():
        return slice_change_log(log_df, 0, batch_width - 1, part_width)

    # warm-up: JIT/codegen on a small prefix
    noop(normalize_events(slice_change_log(log_df, 0, n_events // 10, part_width)))

    if mode == "phases":
        sc.setJobDescription("phase: scan one batch")
        out["scan_batch"] = _med(lambda: noop(batch_sliced()))
        sc.setJobDescription("phase: scan+normalize one batch")
        out["normalize_batch"] = _med(lambda: noop(normalize_events(batch_sliced())))
        sc.setJobDescription("phase: scan+normalize+dedup one batch")
        out["dedup_batch"] = _med(
            lambda: noop(dedup_lww(normalize_events(batch_sliced()), with_counts=True))
        )

        # full parquet delta write of one deduped batch (prepare_delta shape)
        tbl = os.path.join(work, "t_write")

        def write_batch():
            t = LakehouseTable.create(spark, tbl, n_buckets=64)
            t.prepare_delta(
                dedup_lww(normalize_events(batch_sliced()), with_counts=True),
                "prof", 0,
            )

        sc.setJobDescription("phase: prepare_delta one batch")
        out["prepare_batch"] = _med(
            write_batch, cleanup=lambda: shutil.rmtree(tbl, ignore_errors=True)
        )

        # fold cost: table with 8 unfolded deltas, time _fold_l0
        tblf = os.path.join(work, "t_fold")
        t = LakehouseTable.create(spark, tblf, n_buckets=64, max_deltas=100)
        run_incremental(spark, log_path, tblf, batch_width=batch_width,
                        n_buckets=64, log_part_width=part_width)
        t = t.refresh()
        deltas = t._snap["deltas"]
        out["n_deltas"] = len(deltas)
        sc.setJobDescription("phase: L0 fold (resolve+bucket+write 8 deltas)")
        out["fold_8_deltas"] = _med(lambda: t._fold_l0(deltas), n=3)

        # full replay for reference (the timed bench region)
        def full():
            tb = os.path.join(work, "t_full")
            run_incremental(spark, log_path, tb, batch_width=batch_width,
                            n_buckets=64, log_part_width=part_width,
                            max_inflight=4)
            shutil.rmtree(tb, ignore_errors=True)

        sc.setJobDescription("phase: full replay 8 batches")
        out["full_replay"] = _med(full, n=2)

        # steady tick: one batch end to end incl. table open overhead
        tbl_t = os.path.join(work, "t_tick")
        run_incremental(spark, log_path, tbl_t, seq_from=0,
                        seq_to=batch_width - 1, batch_width=batch_width,
                        n_buckets=64, log_part_width=part_width)

        def tick(i=[1]):
            b = i[0]
            i[0] += 1
            run_incremental(
                spark, log_path, tbl_t, seq_from=b * batch_width,
                seq_to=(b + 1) * batch_width - 1, batch_width=batch_width,
                n_buckets=64, log_part_width=part_width,
            )

        sc.setJobDescription("phase: steady tick (1 batch incl. open)")
        out["tick"] = _med(tick, n=3)

    elif mode == "plans":
        os.makedirs("plans/r06", exist_ok=True)
        d = dedup_lww(normalize_events(batch_sliced()), with_counts=True)
        with open("plans/r06/ingest_batch_dedup.txt", "w") as f:
            f.write(d._sc_explain("formatted") if hasattr(d, "_sc_explain")
                    else d._jdf.queryExecution().explainString("formatted"))
        print("wrote plans/r06/ingest_batch_dedup.txt")

    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
