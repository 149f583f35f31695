"""Change-log storage + range scans with partition pruning.

The reference pages through the bundle log by offset/limit and
early-breaks past ``toBundleId`` (loader/collector/bundles_collector.go:
46-142, 87-97).  Here the log is a Parquet dataset hive-partitioned by
``seq_part = floor(commit_seq / part_width)``: a commit_seq range
predicate prunes whole directories (Catalyst partition pruning), and
Parquet row-group min/max stats on commit_seq skip pages inside files —
the declarative equivalents of the reference's offset arithmetic and
sorted-early-break (SURVEY §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from dlt_spark.schemas import CHANGE_EVENT_SCHEMA

DEFAULT_PART_WIDTH = 100_000

# Explicit read schema (change-event columns + the partition column):
# skips the footer-sampling schema-inference job on every batch read.
_LOG_SCHEMA = StructType(
    list(CHANGE_EVENT_SCHEMA.fields) + [StructField("seq_part", LongType(), True)]
)


def write_change_log(
    df: DataFrame, path: str, part_width: int = DEFAULT_PART_WIDTH
) -> None:
    """Persist an event DataFrame as a seq-partitioned Parquet dataset."""
    (
        df.withColumn("seq_part", F.floor(F.col("commit_seq") / part_width))
        .repartition("seq_part")
        .write.mode("overwrite")
        .partitionBy("seq_part")
        .parquet(path)
    )


def open_change_log(spark: SparkSession, path: str) -> DataFrame:
    """Open the log once per run: the returned DataFrame caches its file
    index, so per-batch range slices skip re-listing the dataset."""
    return spark.read.schema(_LOG_SCHEMA).parquet(path)


def slice_change_log(
    log_df: DataFrame, seq_from: int, seq_to: int, part_width: int = DEFAULT_PART_WIDTH
) -> DataFrame:
    """Slice ``seq_from <= commit_seq <= seq_to`` (inclusive).

    The ``seq_part`` predicate is derivable from the commit_seq range but
    stated explicitly so pruning never depends on an optimizer rewrite.
    """
    lo_part, hi_part = seq_from // part_width, seq_to // part_width
    return log_df.where(
        (F.col("seq_part") >= lo_part)
        & (F.col("seq_part") <= hi_part)
        & F.col("commit_seq").between(seq_from, seq_to)
    ).drop("seq_part")


def read_change_log_range(
    spark: SparkSession,
    path: str,
    seq_from: int,
    seq_to: int,
    part_width: int = DEFAULT_PART_WIDTH,
) -> DataFrame:
    """One-shot form of open + slice."""
    return slice_change_log(
        open_change_log(spark, path), seq_from, seq_to, part_width
    )
