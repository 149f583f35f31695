"""Arrow-path batch-size sweep (VERDICT r1 next-#10 / NEXT.md #5).

The pandas-UDF normalizer moves evolved payload strings driver→python
worker over Arrow; `spark.sql.execution.arrow.maxRecordsPerBatch`
controls the batch granularity.  Too small → per-batch Python/IPC
overhead dominates; too big → worker peak memory + first-result latency.
This sweeps the setting over one fixed ingest batch (runtime conf — one
session) and reports events/sec per value; the winner becomes the
session default.

Usage:  python bench/arrow_sweep.py [--events 500000] [--cpus 32]
Appends a markdown table to BENCH/BASELINE.md with --write-md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=500_000)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--sizes", default="2000,10000,50000,100000,200000")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--write-md", action="store_true")
    args = ap.parse_args()

    from dlt_spark.functions.normalize import normalize_events
    from dlt_spark.operators.dedup import dedup_lww
    from dlt_spark.session import get_spark
    from dlt_spark.sources.changelog import write_change_log, read_change_log_range
    from dlt_spark.sources.generator import generate_change_log

    spark = get_spark("arrow-sweep", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="dlt_sweep_", dir=base)
    log_path = os.path.join(work, "log")
    # all-evolved mix: v2/v3 payloads only, so EVERY row crosses Arrow —
    # the worst case the setting governs
    events = generate_change_log(
        spark, args.events, seed=42, dup_frac=0.0, version_mix=(0.0, 0.5, 0.5)
    )
    write_change_log(events, log_path, part_width=args.events)

    def one_pass() -> float:
        df = read_change_log_range(spark, log_path, 0, args.events - 1,
                                   part_width=args.events)
        upd = dedup_lww(normalize_events(df, use_arrow_udf=True), with_counts=True)
        t0 = time.monotonic()
        upd.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    one_pass()  # warm-up (JIT + Arrow init, untimed)
    results = {}
    for size in (int(s) for s in args.sizes.split(",")):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(size))
        times = sorted(one_pass() for _ in range(args.runs))
        med = times[len(times) // 2]
        results[size] = {"sec": round(med, 3),
                         "events_per_sec": round(args.events / med, 1)}
        print(json.dumps({"maxRecordsPerBatch": size, **results[size]}), flush=True)

    best = max(results, key=lambda s: results[s]["events_per_sec"])
    out = {"metric": "arrow_batch_sweep", "events": args.events,
           "cpus": args.cpus, "results": results, "best": best}
    print(json.dumps(out))
    if args.write_md:
        with open(os.path.join(os.path.dirname(__file__), "..", "BENCH",
                               "BASELINE.md"), "a") as f:
            f.write("\n## Arrow maxRecordsPerBatch sweep "
                    f"({args.events} all-evolved events, local[{args.cpus}], "
                    f"median of {args.runs})\n\n")
            f.write("| maxRecordsPerBatch | sec | events/sec |\n|---|---|---|\n")
            for s, r in results.items():
                mark = " **(best)**" if s == best else ""
                f.write(f"| {s}{mark} | {r['sec']} | {r['events_per_sec']} |\n")
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
