"""Schema-evolution test (SURVEY §5): a log whose payload format evolves
over time — v1 arrays early, v2 CSV strings mid-stream, v3 JSON late —
must land in ONE coherent output schema with recomputed n_tok, across
separate incremental runs (not just separate batches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dlt_spark.lakehouse import LakehouseTable
from dlt_spark.plans.runner import run_incremental
from dlt_spark.sources.changelog import write_change_log
from dlt_spark.sources.generator import generate_change_log

from tests.oracle import assert_table_matches, fold_expected_state


def test_payload_versions_over_time(spark, tmp_path):
    # three epochs with different payload encodings, same logical stream
    parts = []
    for epoch, mix in [(0, (1.0, 0.0, 0.0)), (1, (0.0, 1.0, 0.0)), (2, (0.0, 0.0, 1.0))]:
        df = generate_change_log(
            spark, 900, n_keys=120, seed=11, dup_frac=0.0, version_mix=mix
        ).where(F.col("commit_seq").between(epoch * 300, epoch * 300 + 299))
        parts.append(df)
    log = parts[0].unionByName(parts[1]).unionByName(parts[2])
    log_path = str(tmp_path / "log")
    write_change_log(log, log_path, part_width=300)

    table_path = str(tmp_path / "tbl")
    # three separate runs — the v2/v3 epochs arrive after v1 is applied
    for epoch in range(3):
        run_incremental(
            spark, log_path, table_path,
            seq_from=epoch * 300, seq_to=epoch * 300 + 299,
            batch_width=300, n_buckets=8, log_part_width=300,
            use_arrow_udf=(epoch == 2),  # mix both normalizer paths
        )

    table = LakehouseTable.load(spark, table_path)
    actual = table.read().select(
        "doc_id", "tokens", "n_tok", "source", "_commit_seq"
    ).toPandas()
    expected = fold_expected_state(
        spark.read.parquet(log_path).drop("seq_part").toPandas()
    )
    assert_table_matches(actual, expected)
    # one coherent schema: every live row has real tokens + n_tok
    assert actual["tokens"].notna().all() and actual["n_tok"].notna().all()
    # n_tok was recomputed (== len(tokens)), not trusted from the source
    assert all(int(n) == len(t) for n, t in zip(actual["n_tok"], actual["tokens"]))
