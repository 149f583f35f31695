"""Config registry, export destinations, metrics textfile, graceful
stop (reference surface parity: utils/config.go, destinations/*,
utils/prometheus.go, cmd/dlt/commands/load.go signal handling)."""

from __future__ import annotations

import json
import os

import pytest

from dlt_spark.config import all_connections, get_connection_details, load_config
from dlt_spark.destinations import export_table, final_state
from dlt_spark.lakehouse import LakehouseTable
from dlt_spark.plans.runner import run_incremental
from dlt_spark.sources.changelog import write_change_log
from dlt_spark.sources.generator import generate_change_log

CFG = """
sources:
  - name: mainlog
    log: /data/log
    schema: height
destinations:
  - name: lake
    table: /data/tbl
    n_buckets: 32
connections:
  - name: prod
    source: mainlog
    destination: lake
    batch_width: 500
  - name: broken
    source: nope
    destination: lake
"""


def test_config_resolution(tmp_path):
    p = tmp_path / "dlt.yml"
    p.write_text(CFG)
    cfg = load_config(str(p))
    src, dst, conn = get_connection_details(cfg, "prod")
    assert (src.log, src.schema) == ("/data/log", "height")
    assert (dst.table, dst.n_buckets) == ("/data/tbl", 32)
    assert conn.batch_width == 500
    assert [c.name for c in all_connections(cfg)] == ["prod", "broken"]
    # the reference's three failure modes (utils/config.go:207-218)
    with pytest.raises(KeyError, match="connection ghost not found"):
        get_connection_details(cfg, "ghost")
    with pytest.raises(KeyError, match="source nope not found"):
        get_connection_details(cfg, "broken")
    with pytest.raises(ValueError, match="no connections defined"):
        all_connections(load_config(str(p)).__class__())


@pytest.fixture(scope="module")
def loaded_table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dest")
    log, tbl = str(root / "log"), str(root / "tbl")
    ev = generate_change_log(spark, 2_000, n_keys=300, seed=3)
    write_change_log(ev, log, part_width=1_000)
    run_incremental(spark, log, tbl, batch_width=1_000, n_buckets=8,
                    log_part_width=1_000)
    return LakehouseTable.load(spark, tbl)


def test_export_parquet_and_csv(spark, loaded_table, tmp_path):
    live = loaded_table.read().count()
    out_pq = str(tmp_path / "pq")
    n = export_table(loaded_table, out_pq, fmt="parquet")
    assert n == live
    back = spark.read.parquet(out_pq)
    assert back.count() == live
    assert {"row_id", "doc_id", "tokens", "n_tok", "source", "commit_seq"} <= set(
        back.columns
    )
    # csv: array serialized the reference's way (one string field)
    out_csv = str(tmp_path / "csv")
    assert export_table(loaded_table, out_csv, fmt="csv", partitions=1) == live
    csv = spark.read.option("header", "true").csv(out_csv)
    assert csv.count() == live
    row = csv.where("tokens IS NOT NULL").first()
    assert all(tok.lstrip("-").isdigit() for tok in row["tokens"].split(","))
    with pytest.raises(ValueError, match="unknown export format"):
        export_table(loaded_table, str(tmp_path / "x"), fmt="avro")


def test_export_jdbc_roundtrip(spark, loaded_table, tmp_path):
    """Real JDBC write/read against the Derby embedded driver that ships
    inside pyspark's jars — the network-warehouse analog of the
    reference's Postgres bulkInsert sink (destinations/postgres.go:
    120-169), sandbox-shaped (in-process DB instead of a network one;
    a real warehouse is the same call with its URL + driver)."""
    url = f"jdbc:derby:{tmp_path}/wh;create=true"
    opts = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    live = loaded_table.read().count()
    n = export_table(
        loaded_table, url, fmt="jdbc", jdbc_table="final_state",
        jdbc_options=opts,
    )
    assert n == live
    back = spark.read.options(**opts).jdbc(url, "final_state")
    assert back.count() == live
    # token arrays serialized to the reference's one-string shape
    row = back.where("tokens IS NOT NULL").first()
    assert all(t.lstrip("-").isdigit() for t in row["tokens"].split(","))
    # key set survives the round trip
    a = {r["doc_id"] for r in back.select("doc_id").collect()}
    b = {r["doc_id"] for r in loaded_table.read().select("doc_id").collect()}
    assert a == b
    with pytest.raises(ValueError, match="requires jdbc_table"):
        export_table(loaded_table, url, fmt="jdbc")


def test_export_final_state_matches_read(loaded_table):
    a = {r["doc_id"]: r["commit_seq"] for r in final_state(loaded_table).collect()}
    b = {
        r["doc_id"]: r["_commit_seq"]
        for r in loaded_table.read().select("doc_id", "_commit_seq").collect()
    }
    assert a == b


def test_metrics_textfile(spark, loaded_table, tmp_path):
    from dlt_spark.metrics import MetricsWriter
    from dlt_spark.plans.runner import RunResult

    m = MetricsWriter(str(tmp_path / "dlt.prom"), job_id="j1")
    res = RunResult("j1", 2, 2, 0, 100, 90, 5, 1.5)
    m.record_run(res, loaded_table)
    m.record_run(res, loaded_table)  # counters accumulate
    body = (tmp_path / "dlt.prom").read_text()
    assert 'dlt_events_read_total{job_id="j1"} 200' in body
    assert 'dlt_batches_applied_total{job_id="j1"} 4' in body
    assert f'dlt_watermark{{job_id="j1"}} {loaded_table.watermark()}' in body
    assert "# TYPE dlt_events_read_total counter" in body
    assert "# TYPE dlt_watermark gauge" in body


def test_runner_graceful_stop(spark, tmp_path):
    """stop_requested=True before the first commit: the run exits at a
    committed boundary (here: before any), and a later run resumes and
    converges — the SIGINT contract."""
    log, tbl = str(tmp_path / "log"), str(tmp_path / "tbl")
    ev = generate_change_log(spark, 3_000, n_keys=300, seed=5)
    write_change_log(ev, log, part_width=1_000)
    res = run_incremental(
        spark, log, tbl, batch_width=1_000, n_buckets=8, log_part_width=1_000,
        stop_requested=lambda: True,
    )
    assert res.batches_applied == 0
    res2 = run_incremental(
        spark, log, tbl, batch_width=1_000, n_buckets=8, log_part_width=1_000,
    )
    assert res2.batches_applied == 3
    assert LakehouseTable.load(spark, tbl).watermark() == 2_999


def test_event_log_lifecycle(tmp_path, monkeypatch):
    """utils/events.go analog: Sync Started/Finished JSONL with a stable
    install id, opt-in sink, and a working opt-out override."""
    import json as _json

    from dlt_spark.events import EventLog, install_id
    from dlt_spark.plans.runner import RunResult

    state = str(tmp_path / "state")
    assert install_id(state) == install_id(state)  # persisted once

    sink = str(tmp_path / "ev.jsonl")
    ev = EventLog(sink, state_dir=state)
    ev.sync_started("tokens", "/lake/t", 0, 999, force=False)
    ev.sync_finished(RunResult("j", 2, 2, 0, 100, 90, 5, 1.5))
    recs = [_json.loads(l) for l in open(sink)]
    assert [r["event"] for r in recs] == ["Sync Started", "Sync Finished"]
    assert recs[0]["install_id"] == install_id(state)
    assert recs[0]["run_id"] == recs[1]["run_id"]
    assert recs[1]["properties"]["batches_synced"] == 2
    assert recs[1]["properties"]["duration_secs"] == 1.5

    # no sink configured → no-op; opt-out env force-disables a sink
    EventLog(None, state_dir=state).sync_started("t", "d", None, None)
    monkeypatch.setenv("DLT_SPARK_NO_TRACK", "1")
    muted = str(tmp_path / "muted.jsonl")
    EventLog(muted, state_dir=state).sync_started("t", "d", None, None)
    assert not os.path.exists(muted)


def test_cli_maintain(spark, tmp_path, capsys):
    """`maintain` = compact + expire + vacuum in one cron-able tick."""
    from dlt_spark.cli import main
    from dlt_spark.lakehouse import LakehouseTable

    log, tbl = str(tmp_path / "log"), str(tmp_path / "tbl")
    write_change_log(generate_change_log(spark, 3_000, n_keys=400, seed=9),
                     log, part_width=1_000)
    run_incremental(spark, log, tbl, batch_width=500, n_buckets=8,
                    log_part_width=1_000)
    assert main(["maintain", "--table", tbl, "--retain-last", "1",
                 "--grace-secs", "0"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted"] is True
    assert out["snapshots_expired"] >= 1
    t = LakehouseTable.load(spark, tbl)
    assert not t._snap["deltas"]          # L0 folded away
    assert t.read().count() > 0           # still readable post-maintenance
