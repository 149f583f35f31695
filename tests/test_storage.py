"""Storage-provider registry (schema/storage_provider.go:15-61 analog):
named roots resolve `name://rest` URIs; per-provider Hadoop conf lands
on the session; unknown schemes and plain paths pass through."""

from __future__ import annotations

import json

import pytest

from dlt_spark import storage


@pytest.fixture(autouse=True)
def _clean_registry():
    storage.clear_providers()
    yield
    storage.clear_providers()


def test_resolve_registered_and_passthrough():
    storage.register_provider("warm", "/lake/warm/")
    assert storage.resolve("warm://tables/t1") == "/lake/warm/tables/t1"
    assert storage.resolve("warm://") == "/lake/warm"
    # unknown scheme = a real filesystem scheme — untouched
    assert storage.resolve("s3a://bucket/x") == "s3a://bucket/x"
    assert storage.resolve("file:/x/y") == "file:/x/y"
    assert storage.resolve("/plain/path") == "/plain/path"
    # jdbc URLs never look like name:// and pass through
    assert storage.resolve("jdbc:derby:/tmp/db").startswith("jdbc:")


def test_provider_hadoop_conf_applied(spark):
    storage.register_provider(
        "cold", "/lake/cold", {"fs.test.dlt.marker": "cold-creds"}
    )
    out = storage.resolve("cold://t", spark)
    assert out == "/lake/cold/t"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.test.dlt.marker") == "cold-creds"


def test_load_providers_from_config_section():
    ps = storage.load_providers(
        [
            {"name": "a", "root": "/ra"},
            {"name": "b", "root": "s3a://bkt/px", "conf": {"k": "v"}},
        ]
    )
    assert [p.name for p in ps] == ["a", "b"]
    assert storage.resolve("b://d") == "s3a://bkt/px/d"
    assert storage.providers()["b"].hadoop_conf == {"k": "v"}


def test_cli_provider_end_to_end(spark, tmp_path, capsys):
    """gen → load → status, all addressed through a provider URI."""
    from dlt_spark.cli import main

    root = str(tmp_path)
    assert main([
        "--provider", f"store={root}",
        "gen", "--out", "store://log", "--events", "2000",
        "--part-width", "1000",
    ]) == 0
    assert main([
        "--provider", f"store={root}",
        "load", "--log", "store://log", "--table", "store://tbl",
        "--batch-width", "1000", "--n-buckets", "8",
        "--log-part-width", "1000",
    ]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    res = json.loads(out[-1])
    # 2000 logical events + 5% duplicate deliveries (generator default)
    assert res["events_read"] >= 2000 and res["batches_applied"] == 2
    assert main([
        "--provider", f"store={root}", "status", "--table", "store://tbl",
    ]) == 0
    st = json.loads(capsys.readouterr().out)  # status pretty-prints JSON
    assert st["watermark"] == 1999
