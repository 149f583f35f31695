"""Round-6 tier A/B on the bench.py mor_read_7deltas shape (guide §1:
measure first; §1.4 noop sink).  Rebuilds the exact bench substrate —
wide-key log, compacted base, 7 small pending deltas — then times
read(tier=1|2|3) interleaved, median of N.

Usage: python bench/mor_ab.py [reps]
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
    batch_width = max(1, n_events // 8)
    part_width = max(10_000, n_events // 32)

    from dlt_spark.lakehouse import LakehouseTable
    from dlt_spark.plans.runner import run_incremental
    from dlt_spark.session import get_spark
    from dlt_spark.sources.changelog import write_change_log
    from dlt_spark.sources.generator import generate_change_log

    spark = get_spark("dlt-mor-ab", master=f"local[{cpus}]",
                      batch_width=batch_width)
    spark.sparkContext.setLogLevel("ERROR")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="dlt_morab_", dir=base)

    log2 = os.path.join(work, "log2")
    write_change_log(
        generate_change_log(spark, n_events, n_keys=n_events, seed=43),
        log2, part_width=part_width,
    )
    delta_w = max(1, n_events // 1000)
    pend_from = n_events - 7 * delta_w
    tbl2 = os.path.join(work, "tbl2")
    run_incremental(spark, log2, tbl2, seq_to=pend_from - 1,
                    batch_width=batch_width, n_buckets=64,
                    log_part_width=part_width)
    t2 = LakehouseTable.load(spark, tbl2)
    t2.compact()
    run_incremental(spark, log2, tbl2, seq_from=pend_from,
                    batch_width=delta_w, n_buckets=64,
                    log_part_width=part_width)
    t2 = t2.refresh()
    assert len(t2._snap["deltas"]) == 7

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the file-status cache like bench.py does
    noop(t2.read())

    runs: dict[str, list[float]] = {"t1": [], "t2": [], "t3": [], "auto": []}
    for _ in range(reps):
        for tier, key in ((1, "t1"), (2, "t2"), (3, "t3"), (None, "auto")):
            spark.sparkContext.setJobDescription(f"mor read tier={tier}")
            t0 = time.monotonic()
            noop(t2.read(tier=tier))
            runs[key].append(round(time.monotonic() - t0, 3))
    out = {k: {"median": round(statistics.median(v), 3), "runs": v}
           for k, v in runs.items()}
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
