"""IVF trainer assignment-path micro-bench (NEXT r3 #4): Catalyst
literal vs Arrow-broadcast assignment at equal (k, dim) on a synthetic
corpus — where does the plan-literal stop paying and the pandas-UDF
path take over?

Usage: python bench/ivf_paths.py [--rows 100000] [--dim 64]
       [--ks 64,256,512] [--iters 2]
Prints one JSON line per (k, path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--ks", default="64,256,512")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dlt_spark.functions.similarity import train_centroids_distributed
    from dlt_spark.session import get_spark

    spark = get_spark("ivf-paths", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic corpus: hash-derived floats in [-1, 1)
    corpus = spark.range(args.rows).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(args.dim - 1)),
            lambda i: (
                (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - 1000)
                / 1000.0
            ).cast("float"),
        ).alias("embedding"),
    ).persist()
    corpus.count()  # materialize once; both paths scan the same cache

    out = []
    for k in (int(x) for x in args.ks.split(",")):
        for path, cap in (("literal", 10**9), ("arrow", 0)):
            t0 = time.monotonic()
            train_centroids_distributed(
                corpus, k=k, n_iters=args.iters, literal_cap=cap
            ).collect()
            dt = time.monotonic() - t0
            rec = {
                "k": k, "dim": args.dim, "rows": args.rows, "path": path,
                "k_dim_ints": k * args.dim,
                "train_secs": round(dt, 2),
                "iters": args.iters,
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
    corpus.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
