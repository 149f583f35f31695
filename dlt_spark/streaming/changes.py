"""CDC-out tail — stream the lakehouse's OWN committed change feed to
a downstream consumer.

``changes_between`` (lakehouse.py) is the batch form of the Iceberg
incremental-scan analog; this is its tailing form: poll the snapshot
version and hand each newly committed window's RAW change rows
(including tombstones, ``_deleted`` marking deletes) to a callback.
Downstream systems chain off the lakehouse without ever touching the
source log — table → table CDC relay.

Why a polling loop over ``changes_between`` rather than Spark's file
streaming source over the data directory: delta files are written at
PREPARE time, before (and sometimes without) their commit — a
concurrent prepare that fails, retries, or loses a snapshot race
leaves orphan files that a naive file stream would deliver as phantom
changes.  Windowing by committed snapshot version reads exactly the
files the manifests reference, so the feed is phantom-free and aligned
to commit atomicity by construction.  Delivery is exactly-once per
WINDOW as long as the consumer checkpoints ``from_version`` (returned
after every batch and on exit); replaying a window is safe for any
idempotent sink for the same reason the engine's own MERGE is.

Validity window = delta-file retention: compaction supersedes old
deltas and vacuum reclaims them past the grace period, so a consumer
that lags beyond retention gets the same loud FileNotFoundError that
``changes_between`` raises — re-bootstrap from a full read.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dlt_spark.lakehouse import LakehouseTable


def stream_changes(
    spark: SparkSession,
    table_path: str,
    on_batch: Callable[[DataFrame, int, int], None],
    from_version: int | None = None,
    poll_secs: float = 1.0,
    stop_requested=None,
    max_windows: int = 0,
) -> int:
    """Tail committed changes of the table at ``table_path``.

    - ``on_batch(df, from_v, to_v)`` receives the raw change rows for
      each committed window ``from_v < snapshot_version <= to_v``; the
      DataFrame is lazy — the consumer chooses the action.
    - ``from_version``: resume point (exclusive); default = the
      CURRENT version, i.e. tail only changes committed after attach.
    - ``max_windows`` > 0 bounds the loop (tests / drain-and-exit);
      ``stop_requested`` (callable → bool) stops between windows.

    Returns the last delivered version — the consumer's checkpoint for
    the next call.
    """
    t = LakehouseTable.load(spark, table_path)
    cur = t.version if from_version is None else from_version
    delivered = 0
    while True:
        if stop_requested is not None and stop_requested():
            break
        t = t.refresh()
        if t.version > cur:
            df = t.changes_between(cur, t.version)
            on_batch(df, cur, t.version)
            cur = t.version
            delivered += 1
            if max_windows and delivered >= max_windows:
                break
            continue  # drain hot: re-check immediately after a window
        if max_windows and delivered >= max_windows:
            break
        time.sleep(poll_secs)
    return cur
