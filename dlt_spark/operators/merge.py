"""MERGE upsert operator — functional front to LakehouseTable.merge.

SURVEY §2.5 M1: the correct closure of what the reference approximates
with Postgres PK violations (schema/base.go:77 — duplicate application
*fails* rather than converges) and BigQuery WriteAppend (destinations/
big_query.go:256 — replays duplicate rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dlt_spark.lakehouse import LakehouseTable


def merge_upsert(
    table: LakehouseTable,
    updates: DataFrame,
    job_id: str,
    batch_id: int,
    seq_from: int,
    seq_to: int,
    events_read: int | None = None,
) -> dict:
    """Apply a deduped update set exactly once; returns the manifest row."""
    return table.merge(
        updates,
        job_id=job_id,
        batch_id=batch_id,
        seq_from=seq_from,
        seq_to=seq_to,
        events_read=events_read,
    )
