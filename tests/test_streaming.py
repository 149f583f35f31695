"""Streaming sync (Trigger.AvailableNow) converges to the same final
table as the batch runner and is exactly-once across a restart."""

from __future__ import annotations

import pytest

from dlt_spark.sources.changelog import write_change_log
from dlt_spark.sources.generator import generate_change_log
from dlt_spark.streaming.sync import run_stream_sync

from tests.oracle import assert_table_matches, fold_expected_state

N_EVENTS = 3_000


@pytest.fixture(scope="module")
def stream_log(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("slog") / "events")
    df = generate_change_log(
        spark, N_EVENTS, n_keys=300, seed=7, dup_frac=0.05,
        version_mix=(0.5, 0.3, 0.2),
    )
    write_change_log(df, path, part_width=500)
    return path


def test_stream_sync_converges(spark, stream_log, tmp_path):
    table = run_stream_sync(
        spark,
        stream_log,
        str(tmp_path / "tbl"),
        str(tmp_path / "ckpt"),
        n_buckets=16,
        max_files_per_trigger=4,  # force multiple epochs
    )
    expected = fold_expected_state(
        spark.read.parquet(stream_log).drop("seq_part").toPandas()
    )
    actual = table.read().select(
        "doc_id", "tokens", "n_tok", "source", "_commit_seq"
    ).toPandas()
    assert_table_matches(actual, expected)
    assert len(table._snap["manifests"]) > 1  # really ran multiple epochs


def test_stateful_running_lww(spark, stream_log, tmp_path):
    """applyInPandasWithState running-winner stream: the last emitted
    update per key equals the batch LWW fold."""
    from pyspark.sql.types import LongType, StructField, StructType

    from dlt_spark.schemas import CHANGE_EVENT_SCHEMA
    from dlt_spark.streaming.stateful import running_lww_winners

    schema = StructType(
        list(CHANGE_EVENT_SCHEMA.fields) + [StructField("seq_part", LongType())]
    )
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "3")
        .parquet(stream_log)
        .drop("seq_part")
    )
    q = (
        running_lww_winners(events)
        .writeStream.format("memory")
        .queryName("winners")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {}
    for r in spark.sql("SELECT * FROM winners").collect():
        cur = got.get(r["doc_id"])
        cand = (r["commit_seq"], r["op_rank"])
        if cur is None or cand > cur:
            got[r["doc_id"]] = cand

    rank = {"I": 1, "U": 2, "D": 3}
    exp = {}
    for r in spark.read.parquet(stream_log).select(
        "doc_id", "op", "commit_seq"
    ).collect():
        cand = (r["commit_seq"], rank[r["op"]])
        if r["doc_id"] not in exp or cand > exp[r["doc_id"]]:
            exp[r["doc_id"]] = cand
    assert got == exp


def test_windowed_rollup_stream_matches_batch(spark, tmp_path):
    """Event-time tumbling windows over the driver's events table:
    the streaming rollup (availableNow) equals the batch groupBy."""
    from dlt_spark.streaming.windows import hourly_rollup_stream

    import shutil

    src = "/root/testdata/sf0.001/events.parquet"
    batch = spark.read.parquet(src)
    # file-stream sources need a directory
    stream_dir = tmp_path / "events_dir"
    stream_dir.mkdir()
    shutil.copy(src, stream_dir / "events.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(str(stream_dir))
    q = (
        hourly_rollup_stream(stream)
        .writeStream.format("memory")
        .queryName("rollup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM rollup").collect()
    }
    from pyspark.sql import functions as F

    exp_df = (
        batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "s")
    )
    exp = {
        (str(r["ws"]), r["event_type"]): (r["n"], r["s"])
        for r in exp_df.collect()
    }
    # append mode only emits windows closed by the final watermark; all
    # emitted windows must match the batch result exactly, and most
    # windows must have been emitted
    assert got
    for k, v in got.items():
        assert exp[k] == v
    assert len(got) >= len(exp) - 24  # tail windows may stay open


def test_stream_sync_restart_noop(spark, stream_log, tmp_path):
    """Second AvailableNow run over the same checkpoint: nothing new to
    consume, table version unchanged."""
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    t1 = run_stream_sync(spark, stream_log, tbl, ckpt, n_buckets=16)
    v1 = t1.version
    t2 = run_stream_sync(spark, stream_log, tbl, ckpt, n_buckets=16)
    assert t2.version == v1


def test_stream_sync_cascade_deletes(spark, tmp_path):
    """exploded_cascade through the STREAMING path: foreachBatch epochs
    are strictly serial, so the cascade's gap slice is empty by
    construction and the lookup sees every prior epoch's children; the
    stream table is parent-bucketed (bucket_expr) so the lookup prunes
    exactly like the batch runner's."""
    from pyspark.sql import Row

    from dlt_spark.schemas import CHANGE_EVENT_SCHEMA
    from dlt_spark.sources.changelog import write_change_log

    rows = [
        Row(commit_seq=1, doc_id="p", op="I", tokens=None,
            payload='{"block": [1], "txs": [[10], [20]]}',
            payload_version=1, source="s", extracted_at=None),
        Row(commit_seq=2, doc_id="q", op="I", tokens=None,
            payload='{"block": [5], "txs": [[50]]}',
            payload_version=1, source="s", extracted_at=None),
        Row(commit_seq=3, doc_id="p", op="D", tokens=None,
            payload=None, payload_version=1, source="s", extracted_at=None),
        Row(commit_seq=4, doc_id="p", op="I", tokens=None,
            payload='{"block": [9], "txs": [[11]]}',
            payload_version=1, source="s", extracted_at=None),
    ]
    log = str(tmp_path / "log")
    # part_width=2 → two files → with maxFilesPerTrigger=1 the delete
    # lands in a LATER epoch than p's original children (table lookup)
    write_change_log(
        spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA), log, part_width=2
    )
    table = run_stream_sync(
        spark, log, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
        schema="exploded_cascade", n_buckets=8, max_files_per_trigger=1,
    )
    assert table.bucket_expr == "substring_index(doc_id, '/', 1)"
    out = {r["doc_id"]: r for r in table.read().collect()}
    assert set(out) == {"p/block/0", "p/tx/0", "q/block/0", "q/tx/0"}
    assert list(out["p/block/0"]["tokens"]) == [9]
    assert list(out["p/tx/0"]["tokens"]) == [11]
    assert list(out["q/tx/0"]["tokens"]) == [50]


def test_stream_changes_tails_committed_windows(spark, tmp_path):
    """CDC-out tail (streaming/changes.py): windows align to committed
    snapshot versions, a resumed tail continues from the returned
    checkpoint with no overlap and no loss, and the union of windows
    equals the batch changes_between over the same range."""
    from dlt_spark.lakehouse import LakehouseTable
    from dlt_spark.plans.runner import run_incremental
    from dlt_spark.sources.changelog import write_change_log
    from dlt_spark.sources.generator import generate_change_log
    from dlt_spark.streaming.changes import stream_changes

    log = str(tmp_path / "log")
    tbl = str(tmp_path / "tbl")
    write_change_log(
        generate_change_log(spark, 2_000, n_keys=150, seed=12),
        log, part_width=500,
    )

    def key(df):
        return {
            (r["doc_id"], r["_commit_seq"], r["_deleted"])
            for r in df.select("doc_id", "_commit_seq", "_deleted").collect()
        }

    windows: list[set] = []

    def on_batch(df, lo, hi):
        windows.append(key(df))

    # first half committed, then tailed from version 0
    run_incremental(spark, log, tbl, seq_to=999, batch_width=500,
                    n_buckets=8, log_part_width=500)
    ckpt = stream_changes(spark, tbl, on_batch, from_version=0,
                          max_windows=1, poll_secs=0.05)
    # second half committed, tail RESUMES from the checkpoint
    run_incremental(spark, log, tbl, batch_width=500,
                    n_buckets=8, log_part_width=500)
    ckpt2 = stream_changes(spark, tbl, on_batch, from_version=ckpt,
                           max_windows=1, poll_secs=0.05)

    t = LakehouseTable.load(spark, tbl)
    assert ckpt2 == t.version
    assert len(windows) == 2
    assert not (windows[0] & windows[1]), "windows overlapped"
    assert windows[0] | windows[1] == key(t.changes_between(0, t.version))
    # the feed carries tombstones (deletes visible to downstream)
    assert any(d for _, _, d in windows[0] | windows[1])


def test_stream_sync_cascade_markers_mode(spark, tmp_path):
    """Marker mode through the STREAMING path mirrors the batch runner:
    each epoch's parent deletes land as one marker delta riding the
    epoch's atomic commit, the live state matches eager mode, and
    materialize_markers converges the table to physical tombstones."""
    from pyspark.sql import Row

    from dlt_spark.lakehouse import LakehouseTable
    from dlt_spark.schemas import CHANGE_EVENT_SCHEMA
    from dlt_spark.sources.changelog import write_change_log

    rows = [
        Row(commit_seq=1, doc_id="p", op="I", tokens=None,
            payload='{"block": [1], "txs": [[10], [20]]}',
            payload_version=1, source="s", extracted_at=None),
        Row(commit_seq=2, doc_id="q", op="I", tokens=None,
            payload='{"block": [5], "txs": [[50]]}',
            payload_version=1, source="s", extracted_at=None),
        Row(commit_seq=3, doc_id="p", op="D", tokens=None,
            payload=None, payload_version=1, source="s", extracted_at=None),
        Row(commit_seq=4, doc_id="p", op="I", tokens=None,
            payload='{"block": [9], "txs": [[11]]}',
            payload_version=1, source="s", extracted_at=None),
    ]
    log = str(tmp_path / "log")
    write_change_log(
        spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA), log, part_width=2
    )
    table = run_stream_sync(
        spark, log, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
        schema="exploded_cascade", n_buckets=8, max_files_per_trigger=1,
        cascade_mode="markers",
    )
    assert table._snap["markers"], "streaming marker mode recorded none"

    def state(t):
        return {
            r["doc_id"]: tuple(r["tokens"] or []) for r in t.read().collect()
        }

    expected = {"p/block/0": (9,), "p/tx/0": (11,),
                "q/block/0": (5,), "q/tx/0": (50,)}
    assert state(table) == expected
    table.materialize_markers()
    assert table._snap["markers"] == []
    assert state(table) == expected
