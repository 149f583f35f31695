"""Driver contract for the spark-graft builder (PySpark target).

queries() exposes one entry per implemented operator family from
SURVEY.md §2 (CDC core: scans, range filters, watermark, lineage,
LWW dedup, MERGE final state, replay guard, deterministic ids, payload
normalization, explode-with-provenance, skew profile) plus the
training-data pipeline ops (exact/MinHash/SimHash/Jaccard dedup,
cosine top-k similarity, language-ID, quality scoring, token counting,
fingerprinting).  Implementations live in dlt_spark/entry_queries.py;
oracle_sql() returns the DuckDB-equivalent SQL for every query except
those declared in entry_queries.NO_ORACLE (currently only the trained
k-means IVF — float iteration order is not SQL-reproducible; the driver
records its rows-only check and pytest asserts recall + determinism).
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
