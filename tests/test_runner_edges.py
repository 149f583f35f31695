"""Runner edge cases: empty ranges, gap regions, single-event logs."""

from __future__ import annotations

from pyspark.sql import functions as F

from dlt_spark.lakehouse import LakehouseTable
from dlt_spark.plans.runner import run_incremental
from dlt_spark.sources.changelog import write_change_log
from dlt_spark.sources.generator import generate_change_log


def test_empty_log_region_noop_commits(spark, tmp_path):
    """Batches whose seq range holds no events commit no-op manifests
    (resume still moves the watermark past the gap)."""
    log = str(tmp_path / "log")
    df = generate_change_log(spark, 2_000, n_keys=100, seed=9, dup_frac=0.0)
    # keep only the first and last quarter → a hole in the middle
    df = df.where(
        (F.col("commit_seq") < 500) | (F.col("commit_seq") >= 1_500)
    )
    write_change_log(df, log, part_width=500)
    tbl = str(tmp_path / "tbl")
    res = run_incremental(
        spark, log, tbl, batch_width=500, n_buckets=8, log_part_width=500
    )
    assert res.batches_planned == 4
    assert res.batches_applied == 4  # gap batches commit as no-ops
    t = LakehouseTable.load(spark, tbl)
    assert t.watermark() == 1_999
    gap = [m for m in t._snap["manifests"] if m["events_applied"] == 0]
    assert len(gap) == 2

    # resume after the gap: nothing new
    res2 = run_incremental(
        spark, log, tbl, batch_width=500, n_buckets=8, log_part_width=500
    )
    assert res2.batches_planned == 0


def test_single_event_log(spark, tmp_path):
    log = str(tmp_path / "log")
    df = generate_change_log(spark, 1, n_keys=1, seed=2, dup_frac=0.0)
    write_change_log(df, log, part_width=100)
    tbl = str(tmp_path / "tbl")
    res = run_incremental(
        spark, log, tbl, batch_width=100, n_buckets=4, log_part_width=100
    )
    assert res.batches_applied == 1
    t = LakehouseTable.load(spark, tbl)
    rows = t.read().collect()
    # the one event is either a live row or a tombstone
    assert len(rows) in (0, 1)
    assert t.watermark() == 0
