"""Validate every queries() entry against its DuckDB oracle the way the
driver does: row count + column names + order-insensitive value hash.
Runs at sf0.001 for speed (the driver uses sf0.01)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("ENTRY_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _q_names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.fixture(scope="module")
def duck_con():
    return _duck(SF_DIR)


@pytest.mark.parametrize("name", _q_names())
def test_query_matches_oracle(spark, duck_con, name):
    import __spark_entry__ as e

    from dlt_spark.entry_queries import NO_ORACLE

    spark_df = e.queries()[name](spark, SF_DIR).toPandas()
    sql = e.oracle_sql().get(name)
    if sql is None and name in NO_ORACLE:
        # declared non-SQL-expressible: driver runs the rows-only check;
        # value-level guarantees live in dedicated pytest assertions
        assert len(spark_df) >= 0
        return
    assert sql is not None, f"{name}: missing oracle"
    duck_df = duck_con.execute(sql).fetchdf()

    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} != {sorted(duck_df.columns)}"
    )
    a, b = _canon(spark_df), _canon(duck_df)
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)
