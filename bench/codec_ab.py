"""Parquet codec A/B for the engine's data files (round 6, guide §2.3/§6:
"for high-entropy payloads compression can be pure overhead — measure").

Token payloads are near-uniform ints in [0, 50k): low compressibility.
Times (a) the delta-shaped write of one deduped batch and (b) the
read-back scan, per codec, plus on-disk size.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time


def _med(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        ts.append(round(time.monotonic() - t0, 3))
    return round(statistics.median(ts), 3), ts


def main() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_events = int(os.environ.get("BENCH_EVENTS", "3150000"))
    batch_width = n_events // 8
    part_width = max(10_000, n_events // 32)

    from dlt_spark.operators.dedup import dedup_lww
    from dlt_spark.functions.normalize import normalize_events
    from dlt_spark.session import get_spark
    from dlt_spark.sources.changelog import (
        open_change_log, slice_change_log, write_change_log,
    )
    from dlt_spark.sources.generator import generate_change_log

    spark = get_spark("dlt-codec-ab", master=f"local[{cpus}]",
                      batch_width=batch_width)
    spark.sparkContext.setLogLevel("ERROR")

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="dlt_codec_", dir=base)
    log_path = os.path.join(work, "log")
    write_change_log(
        generate_change_log(spark, n_events, seed=42, dup_frac=0.05,
                            version_mix=(0.6, 0.25, 0.15)),
        log_path, part_width=part_width,
    )
    log_df = open_change_log(spark, log_path)
    batch = dedup_lww(
        normalize_events(slice_change_log(log_df, 0, batch_width - 1, part_width)),
        with_counts=True,
    ).localCheckpoint(eager=True)  # isolate codec cost from upstream compute

    out = {}
    for codec in ("snappy", "lz4", "zstd", "uncompressed"):
        d = os.path.join(work, f"w_{codec}")

        def wr():
            (batch.write.mode("overwrite")
             .option("parquet.enable.dictionary", "false")
             .option("compression", codec)
             .parquet(d))

        wt = _med(wr, n=3)
        size = int(subprocess.run(["du", "-sb", d], capture_output=True,
                                  text=True).stdout.split()[0])
        rdf = spark.read.parquet(d)

        def rd():
            rdf.write.format("noop").mode("overwrite").save()

        rt = _med(rd, n=3)
        out[codec] = {"write": wt, "read": rt, "mb": round(size / 1e6, 1)}
        shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
