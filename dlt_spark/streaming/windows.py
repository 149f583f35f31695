"""Event-time windowed aggregation with late-data watermarks.

The CDC path doesn't need event-time watermarks (commit_seq is the
clock and LWW is convergent, SURVEY §2.9) — but the engine's streaming
surface also serves generic event streams, where tumbling-window
rollups with bounded lateness are the bread-and-butter operator:

    readStream → withWatermark(ts, delay) → groupBy(window(ts, w), …)

State is bounded by the watermark: windows older than
(max event time − delay) finalize and evict.  Output mode "append"
emits each window exactly once, on finalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup_stream(
    events: DataFrame,
    ts_col: str = "ts",
    late_threshold: str = "1 hour",
    window_width: str = "1 hour",
) -> DataFrame:
    """events: STREAMING DataFrame with (ts, event_type, value, user_id).
    Returns finalized per-window per-type aggregates."""
    # withWatermark requires TIMESTAMP (LTZ); parquet sources often carry
    # TIMESTAMP_NTZ — cast is a no-op in UTC sessions (session.py pins UTC)
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, late_threshold)
        .groupBy(
            F.window(F.col(ts_col), window_width).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            # NB: count(DISTINCT) is unsupported in streaming aggs;
            # approx_count_distinct is the streaming-safe form.
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
            "approx_users",
        )
    )
