"""Export destinations — the outward-facing sink surface.

The reference's whole purpose is landing rows in an external warehouse
(Postgres bulkInsert destinations/postgres.go:120-169; BigQuery
CSV→GCS→load job big_query.go:135-273).  This engine's system of record
is the MoR lakehouse table; ``export_table`` is the analog of the
reference's destination layer for downstream consumers, sandbox-shaped:
no network, so the supported sinks are file formats any warehouse bulk-
loads (the reference itself ships CSV into BigQuery for exactly this
reason).

- parquet: faithful typed export (arrays stay arrays).
- csv: flat-file export with the reference's row shape —
  ``ConvertToCSVLine`` (schema/base.go:26-34) emits the array payload as
  a string; here tokens join to a comma string, one vectorized
  expression (S7 in SURVEY §2.1: "df.write.csv if ever required").
- json: line-delimited, typed.

A JDBC warehouse sink is one ``df.write.format("jdbc")`` away and takes
none of this code with it — the export keeps the same final-state
DataFrame contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dlt_spark.lakehouse import LakehouseTable

FORMATS = ("parquet", "csv", "json")


def final_state(table: LakehouseTable) -> DataFrame:
    """The exportable view: live rows, system columns renamed to the
    reference's destination shape (bundle_id analog = _commit_seq)."""
    df = table.read()
    cols = [
        F.col("_row_id").alias("row_id"),
        "doc_id",
        "tokens",
        "n_tok",
        "source",
        F.col("_commit_seq").alias("commit_seq"),
    ]
    extra = [n for n, _ in table.extra_columns]
    return df.select(*cols, *extra)


def export_table(
    table: LakehouseTable,
    out_path: str,
    fmt: str = "parquet",
    partitions: int | None = None,
) -> int:
    """Write the table's final state to ``out_path``; returns row count
    (counted via Observation during the write — one job)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown export format {fmt!r} (supported: {FORMATS})")
    from pyspark.sql import Observation

    df = final_state(table)
    if fmt == "csv":
        # CSV cannot nest: serialize the token array the way the
        # reference's CSV line does (schema/base.go:100-107 marshals the
        # payload to one string field)
        df = df.withColumn(
            "tokens", F.array_join(F.col("tokens").cast("array<string>"), ",")
        )
    if partitions:
        df = df.coalesce(partitions)
    obs = Observation("export")
    df = df.observe(obs, F.count(F.lit(1)).alias("n"))
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(out_path)
    return int(obs.get["n"] or 0)
