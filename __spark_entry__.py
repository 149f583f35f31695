"""Driver contract for the spark-graft builder (PySpark target).

queries() exposes one entry per implemented operator family from
SURVEY.md §2 (CDC core: scans, range filters, watermark, lineage,
LWW dedup, MERGE final state, replay guard, deterministic ids, payload
normalization, explode-with-provenance, cascade deletes, schema
evolution, skew profile) plus the training-data pipeline ops
(exact/MinHash/SimHash/Jaccard dedup + connected-components
canonicalization over documents AND embeddings, cosine/LSH/IVF
similarity search with trained and fully distributed k-means,
benchmark-contamination check, PII scrub, global + sharded sequence
packing, language-ID, quality scoring, token counting, repetition
ratio, length histogram, deterministic train/val split,
fingerprinting, multimodal plumbing).  Implementations live in
dlt_spark/entry_queries.py; oracle_sql() returns the DuckDB-equivalent
SQL for EVERY query — entry_queries.NO_ORACLE is empty since round 3:
the k-means trainers are integer-exact (SQL-reproducible), and the
iterative connected-components queries oracle via a recursive-CTE
reachability fixpoint (round 4 — matches the alternating-star
contraction at any component diameter).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC engine run (LWW dedup → MERGE → read back)
    on the sf0.001 orders-derived change log."""
    from dlt_spark.entry_queries import q_cdc_merge_final_state

    return q_cdc_merge_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dlt_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dlt_spark.entry_queries import oracles

    return oracles()
