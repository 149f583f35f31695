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
- jdbc: the network-warehouse analog of the reference's Postgres sink
  (destinations/postgres.go:120-169 bulkInsert) — ``out_path`` is the
  JDBC URL, ``jdbc_table``/``jdbc_options`` name the target.  Executors
  write partitions concurrently (the reference fans its bulkInserts
  across csv_worker_count goroutines; here each Spark task holds one
  connection).  The token array serializes to the same one-string field
  the reference ships to its warehouses (ConvertToCSVLine /
  big_query.go CSV staging) — warehouse-portable DDL, no array-type
  dependency.  Tested end-to-end against the Derby embedded driver that
  ships inside pyspark's jars (no network in the sandbox; a real
  Postgres/BigQuery JDBC target is the same call with its URL+driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dlt_spark.lakehouse import LakehouseTable

FORMATS = ("parquet", "csv", "json", "jdbc")


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
    jdbc_table: str | None = None,
    jdbc_options: dict[str, str] | None = None,
) -> int:
    """Write the table's final state to ``out_path``; returns row count
    (counted via Observation during the write — one job).

    For ``fmt="jdbc"``, ``out_path`` is the JDBC URL (e.g.
    ``jdbc:postgresql://host/db`` or ``jdbc:derby:/tmp/db;create=true``),
    ``jdbc_table`` the destination table, and ``jdbc_options`` extra
    writer options (``driver``, ``user``, ``batchsize``,
    ``numPartitions``, ...)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown export format {fmt!r} (supported: {FORMATS})")
    from pyspark.sql import Observation

    df = final_state(table)
    if fmt in ("csv", "jdbc"):
        # These sinks cannot nest: serialize the token array the way the
        # reference's warehouse line does (schema/base.go:100-107
        # marshals the payload to one string field)
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
    if fmt == "jdbc":
        if not jdbc_table:
            raise ValueError("fmt='jdbc' requires jdbc_table")
        for k, v in (jdbc_options or {}).items():
            writer = writer.option(k, v)
        writer.jdbc(out_path, jdbc_table)
    else:
        getattr(writer, fmt)(out_path)
    return int(obs.get["n"] or 0)
