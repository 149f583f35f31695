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


def test_pii_scrub_redacts(spark):
    """Planted-PII redaction semantics (the corpus itself is clean, so
    the entry query's counts are zero — this pins what the scrub DOES):
    same SQL as the entry query, on a view with planted SSNs/emails,
    and the DuckDB oracle agrees byte-for-byte."""
    import duckdb
    import pandas as pd

    from dlt_spark.entry_queries import oracles, pii_scrub_spark_sql

    rows = [
        (1, "call 123-45-6789 or mail a.b@x-co.com today"),
        (2, "ssn 999-11-2222 twice 999-11-2222 and bob@mail.org"),
        (3, "no pii here at all"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("documents")
    got = {r["doc_id"]: r for r in spark.sql(pii_scrub_spark_sql()).collect()}
    assert (got[1]["n_ssn"], got[1]["n_email"]) == (1, 1)
    assert (got[2]["n_ssn"], got[2]["n_email"]) == (2, 1)
    assert (got[3]["n_ssn"], got[3]["n_email"]) == (0, 0)
    # redaction really replaced the spans: md5 of the expected string
    import hashlib

    exp1 = "call <SSN> or mail <EMAIL> today"
    assert got[1]["scrubbed_md5"] == hashlib.md5(exp1.encode()).hexdigest()

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    duck = {
        r[0]: r for r in con.execute(oracles()["docs_pii_scrub"]).fetchall()
    }
    for d in (1, 2, 3):
        assert (duck[d][1], duck[d][2], duck[d][3]) == (
            got[d]["n_ssn"], got[d]["n_email"], got[d]["scrubbed_md5"]
        )
    spark.catalog.dropTempView("documents")


def test_dedup_clusters_long_chain_single_cluster(spark, tmp_path):
    """End-to-end long-chain lock (VERDICT r3 next-#1): 120 sliding-
    window documents form a near-dup CHAIN whose verified-pair graph
    has diameter >= 10 — deeper than the r3 fixed 8-round propagation
    could merge.  The full pipeline (MinHash -> LSH bands -> Jaccard
    verify -> connected components) must resolve them into exactly ONE
    cluster with canonical doc 0, and agree with the recursive-CTE
    DuckDB oracle on the same fixture."""
    import duckdb

    import __spark_entry__ as e

    n_docs, m = 120, 60
    words = [f"w{i:04d}" for i in range(n_docs + m)]
    rows = [
        (i, " ".join(words[i:i + m]), "en", "fixture",
         len(" ".join(words[i:i + m])))
        for i in range(n_docs)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    got = e.queries()["docs_dedup_clusters"](spark, sf_dir).toPandas()
    assert len(got) == n_docs, "every chain doc must be clustered"
    assert set(got["cluster_id"]) == {0}, (
        "chain split into %d clusters - diameter-bounded propagation bug"
        % got["cluster_id"].nunique()
    )
    assert set(got.loc[got["is_canonical"], "doc_id"]) == {0}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{sf_dir}/documents.parquet/*.parquet')"
    )
    oracle = con.execute(e.oracle_sql()["docs_dedup_clusters"]).fetchdf()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = oracle.sort_values("doc_id").reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_seq_packing_sharded_refines_global_and_has_no_global_sort(spark):
    """VERDICT r3 next-#4 lock: (a) the sharded packing plan contains
    no single-partition global Sort — every Sort in the physical plan
    sits above a hash-partitioned exchange on the shard key; (b) each
    shard's offsets are exactly the global form's cumsum restricted to
    that shard's documents in the same doc_id order
    (permutation-consistent refinement)."""
    import __spark_entry__ as e

    sharded = e.queries()["docs_seq_packing_sharded"](spark, SF_DIR)
    plan = sharded._jdf.queryExecution().executedPlan().toString()
    # a global window materializes as Exchange SinglePartition + Sort
    assert "SinglePartition" not in plan, plan

    got = sharded.toPandas().sort_values("doc_id").reset_index(drop=True)
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "n_chars").toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    docs["shard"] = docs["doc_id"] % 16
    docs["shard_offset"] = (
        docs.groupby("shard")["n_chars"].cumsum() - docs["n_chars"]
    )
    merged = got.merge(docs, on="doc_id", suffixes=("", "_ref"))
    assert len(merged) == len(docs)
    assert (merged["shard"] == merged["shard_ref"]).all()
    assert (merged["shard_offset"] == merged["shard_offset_ref"]).all()
    assert (merged["pack_start"] == merged["shard_offset_ref"] // 512).all()
