"""Salted repartition against hot-key skew (SURVEY §2.7 X4).

The reference has no skew handling: workers pull whole bundles, so one
huge bundle stalls a worker (loader/service.go:85-88).  With Zipf-skewed
doc_ids, a plain ``repartition(doc_id)`` sends every event for the
hottest key to one task.  ``salted_repartition`` spreads each key over
``salt_buckets`` partitions for the *stateless* stages (normalizer UDF),
where rows of the same key need not be co-located.

Never salt across the dedup/MERGE key boundary: LWW and MERGE group by
doc_id and rely on Spark's own hash partitioning there (AQE skew-join
splitting covers the join side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    key: str = "doc_id",
    num_partitions: int | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Repartition on hash(key) ⊕ per-row salt — key-local hot spots are
    spread over ``salt_buckets`` partitions; distribution stays
    deterministic given the row (salt derives from commit_seq, not
    rand(), so replays place rows identically)."""
    salt = F.pmod(F.xxhash64("commit_seq"), F.lit(salt_buckets))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(parts, F.xxhash64(F.col(key)) + salt)
