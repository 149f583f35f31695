"""Driver-contract queries + DuckDB oracles (SURVEY §2 coverage).

Each entry exercises one operator family from SURVEY.md §2 on the
driver's deterministic parquet tables, with an equivalent DuckDB SQL
oracle.  The CDC queries derive a change log from ``orders`` via pure
arithmetic (identical semantics in both engines):

    commit_seq = o_orderkey                  (unique, monotone)
    doc_id     = 'doc_' || lpad(o_custkey % 300, 4, '0')   (hot keys)
    op         = seq%10==9 → D, >=6 → U, else I
    n_tok      = seq % 97 + 8
    tokens[i]  = (seq * (i+7)) % 1000
    source     = o_orderpriority

Cross-engine primitives verified bit-identical: md5/sha256 hex, the
60-bit hash  spark ``conv(substr(md5(s),1,15),16,10)``  ==  duckdb
``('0x'||substr(md5(s),1,15))::BIGINT``, and double math folded in a
fixed order.  Arrays are compared stringified; all ints cast to BIGINT;
doubles rounded — the driver hashes values column-name-sorted.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dlt_spark.operators.components import connected_components

# ---------------------------------------------------------------------------
# shared SQL fragments (sp=Spark SQL, dk=DuckDB SQL)
# ---------------------------------------------------------------------------

_EVENTS_SP = """
SELECT o_orderkey AS commit_seq,
       'doc_' || lpad(cast(o_custkey % 300 AS string), 4, '0') AS doc_id,
       CASE WHEN o_orderkey % 10 = 9 THEN 'D'
            WHEN o_orderkey % 10 >= 6 THEN 'U' ELSE 'I' END AS op,
       cast(o_orderkey % 97 + 8 AS bigint) AS n_tok,
       o_orderpriority AS source,
       transform(sequence(0, cast(o_orderkey % 97 + 7 AS int)),
                 i -> (o_orderkey * (i + 7)) % 1000) AS tokens
FROM orders
"""

_EVENTS_DK = """
SELECT o_orderkey AS commit_seq,
       'doc_' || lpad(cast(o_custkey % 300 AS varchar), 4, '0') AS doc_id,
       CASE WHEN o_orderkey % 10 = 9 THEN 'D'
            WHEN o_orderkey % 10 >= 6 THEN 'U' ELSE 'I' END AS op,
       cast(o_orderkey % 97 + 8 AS bigint) AS n_tok,
       o_orderpriority AS source,
       list_transform(range(o_orderkey % 97 + 8),
                      i -> (o_orderkey * (i + 7)) % 1000) AS tokens
FROM orders
"""

# word-length token arrays from documents (the token-payload analog)
_DOCTOKS_SP = """
SELECT doc_id, text,
       transform(split(text, ' '), w -> cast(length(w) AS int)) AS toks
FROM documents
"""
_DOCTOKS_DK = """
SELECT doc_id, text,
       list_transform(string_split(text, ' '), w -> cast(length(w) AS int)) AS toks
FROM documents
"""

_HASH60_SP = "cast(conv(substr(md5({x}), 1, 15), 16, 10) AS bigint)"
_HASH60_DK = "cast(('0x' || substr(md5({x}), 1, 15)) AS bigint)"


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# CDC queries (SURVEY §2.1/2.2/2.4/2.5)
# ---------------------------------------------------------------------------

def q_cdc_lww_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2+M3: LWW dedup via the engine's dedup_lww operator, tombstones
    dropped → final visible state.

    Round-6 restructure (guide §8: decide on lightweight rows, derive
    heavy columns once): ``tokens`` is BY CONSTRUCTION a pure function
    of ``commit_seq`` (tokens[i] = (seq*(i+7)) % 1000, len = seq%97+8 —
    the derivation both engines share, see module docstring), and the
    LWW winner per doc_id is decided by commit_seq alone (o_orderkey is
    unique, so the op-rank/hash tie-breaks are unreachable).  Running
    dedup_lww on the narrow columns and regenerating the winner's
    tokens afterwards therefore yields bit-identical results (oracle-
    locked) while the shuffle carries ~50 bytes/row instead of the
    ~500-byte token arrays and the array generation runs for ~300
    winners instead of every event."""
    from dlt_spark.operators.dedup import dedup_lww

    _views(spark, sf_dir, "orders")
    events = spark.sql(_EVENTS_SP).drop("tokens")
    final = dedup_lww(events).where(F.col("op") != "D")
    tokens = F.expr(
        "transform(sequence(0, cast(commit_seq % 97 + 7 AS int)),"
        " i -> (commit_seq * (i + 7)) % 1000)"
    )
    return final.select(
        "doc_id",
        F.col("commit_seq").alias("last_seq"),
        F.col("n_tok").cast("bigint").alias("n_tok"),
        "source",
        F.array_join(tokens.cast("array<string>"), ",").alias("tokens_str"),
    )


_SQL_LWW_FINAL = f"""
WITH events AS ({{events}}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY commit_seq DESC) AS rn
  FROM events)
SELECT doc_id, commit_seq AS last_seq, n_tok, source,
       {{arr2str}} AS tokens_str
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


def q_cdc_merge_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+M4: the full engine path — write the derived log, run
    incremental batches through LWW+MERGE into a temp lakehouse table,
    read back the final state.  Must equal the one-shot LWW fold."""
    from dlt_spark.lakehouse import LakehouseTable
    from dlt_spark.plans.runner import run_incremental
    from dlt_spark.sources.changelog import write_change_log

    _views(spark, sf_dir, "orders")
    events = spark.sql(_EVENTS_SP).select(
        "commit_seq",
        "doc_id",
        "op",
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.lit(None).cast("string").alias("payload"),
        F.lit(1).alias("payload_version"),
        "source",
        F.current_timestamp().alias("extracted_at"),
    )
    tmp = tempfile.mkdtemp(prefix="dlt_entry_")
    log_path = os.path.join(tmp, "log")
    tbl_path = os.path.join(tmp, "tbl")
    write_change_log(events, log_path, part_width=5_000)
    run_incremental(
        spark, log_path, tbl_path, batch_width=5_000, n_buckets=16,
        log_part_width=5_000,
    )
    t = LakehouseTable.load(spark, tbl_path)
    return t.read().select(
        "doc_id",
        F.col("_commit_seq").alias("last_seq"),
        F.col("n_tok").cast("bigint").alias("n_tok"),
        "source",
        F.array_join(F.col("tokens").cast("array<string>"), ",").alias("tokens_str"),
    )


def q_cdc_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/P2: resume-point aggregation over the log."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        f"SELECT max(commit_seq) AS watermark, count(*) AS n_events FROM ({_EVENTS_SP})"
    )


def q_cdc_batch_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/L2: per-batch lineage (min/max seq + key range + count)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT cast(floor(commit_seq / 1000) AS bigint) AS batch_id,
               min(commit_seq) AS seq_from, max(commit_seq) AS seq_to,
               count(*) AS n_events,
               min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM ({_EVENTS_SP}) GROUP BY 1
    """)


def q_cdc_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: commit_seq range predicate + per-op counts."""
    _views(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT op, count(*) AS n FROM ({_EVENTS_SP})
        WHERE commit_seq BETWEEN 3000 AND 7999 GROUP BY op
    """)


def q_cdc_replay_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: left-anti join of planned batches vs applied manifest."""
    _views(spark, sf_dir, "orders")
    batches = spark.sql(
        f"SELECT DISTINCT cast(floor(commit_seq/1000) AS bigint) AS batch_id FROM ({_EVENTS_SP})"
    )
    applied = batches.where(F.col("batch_id") < 5)
    return batches.join(applied, "batch_id", "left_anti").select("batch_id")


def q_cdc_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 metrics: op distribution of the post-LWW update set."""
    from dlt_spark.operators.dedup import dedup_lww

    _views(spark, sf_dir, "orders")
    return (
        dedup_lww(spark.sql(_EVENTS_SP))
        .groupBy("op")
        .agg(F.count("*").alias("n"))
    )


def q_cdc_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: deterministic surrogate row ids (sha256 of identity)."""
    from dlt_spark.functions.ids import deterministic_row_id

    _views(spark, sf_dir, "orders")
    ev = spark.sql(_EVENTS_SP).where(F.col("commit_seq") < 100)
    return ev.select(
        "doc_id",
        "commit_seq",
        deterministic_row_id(F.col("doc_id"), F.col("commit_seq")).alias("row_id"),
    )


def q_cdc_normalize_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: payload schema evolution — round-trip v1 array / v2 CSV
    string / v3 JSON through the engine normalizer."""
    from dlt_spark.functions.normalize import normalize_events

    _views(spark, sf_dir, "documents")
    base = spark.sql(_DOCTOKS_SP).select(
        F.col("doc_id").alias("commit_seq"),
        F.col("doc_id").cast("string").alias("doc_id_s"),
        (F.col("doc_id") % 3 + 1).cast("int").alias("payload_version"),
        F.col("toks").cast("array<int>").alias("raw_toks"),
    )
    ev = base.select(
        "commit_seq",
        F.col("doc_id_s").alias("doc_id"),
        F.lit("I").alias("op"),
        F.when(F.col("payload_version") == 1, F.col("raw_toks")).alias("tokens"),
        F.when(
            F.col("payload_version") == 2,
            F.array_join(F.col("raw_toks").cast("array<string>"), ","),
        )
        .when(
            F.col("payload_version") == 3,
            F.to_json(F.struct(F.col("raw_toks").alias("ids"))),
        )
        .alias("payload"),
        "payload_version",
    )
    out = normalize_events(ev)
    return out.select(
        F.col("commit_seq").alias("doc_id"),
        F.array_join(F.col("tokens").cast("array<string>"), ",").alias("tokens_str"),
        F.col("n_tok").cast("bigint").alias("n_tok"),
    )


def q_cdc_explode_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: explode with positional provenance (posexplode ==
    the reference's array_index, schema/tendermint_preprocessed.go:156-208)."""
    _views(spark, sf_dir, "documents")
    toks = spark.sql(_DOCTOKS_SP).where(F.col("doc_id") < 50)
    return toks.select(
        "doc_id", F.posexplode(F.col("toks")).alias("array_index", "token")
    ).select(
        "doc_id",
        F.col("array_index").cast("bigint").alias("array_index"),
        F.col("token").cast("bigint").alias("token"),
    )


# Exploded-schema event fragments (ExplodedAdapter / reference
# tendermint_preprocessed): per parent event, a block token array plus
# 0-3 tx arrays and 0-2 event arrays, all pure integer arithmetic so
# DuckDB regenerates the children bit-identically.
_EXP_EVENTS_SP = """
SELECT o_orderkey AS commit_seq,
       'doc_' || lpad(cast(o_custkey % 150 AS string), 4, '0') AS doc_id,
       CASE WHEN o_orderkey % 10 = 9 THEN 'D'
            WHEN o_orderkey % 10 >= 6 THEN 'U' ELSE 'I' END AS op,
       o_orderpriority AS source,
       transform(sequence(0, cast(o_orderkey % 13 + 2 AS int)),
                 i -> cast((o_orderkey * (i + 7)) % 1000 AS int)) AS block,
       slice(transform(sequence(0, 3), j ->
             transform(sequence(0, cast((o_orderkey + j) % 5 + 1 AS int)),
                       k -> cast((o_orderkey * (j + 3) + k) % 1000 AS int))),
             1, cast(o_orderkey % 4 AS int)) AS txs,
       slice(transform(sequence(0, 2), j ->
             transform(sequence(0, cast((o_orderkey + 2 * j) % 4 AS int)),
                       k -> cast((o_orderkey * (j + 11) + 2 * k) % 1000 AS int))),
             1, cast((o_orderkey + 1) % 3 AS int)) AS events
FROM orders WHERE o_orderkey < 3000
"""


def q_cdc_exploded_adapter_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SchemaAdapter registry end-to-end (reference loader/setup.go:68-78
    three-schema switch; schema/tendermint_preprocessed.go:131-209
    explode): events whose JSON payload carries a block + tx/event
    arrays run the FULL runner path under the 'exploded' adapter —
    posexplode-style child rows keyed (parent, kind, array_index) ride
    the shared LWW+MERGE engine; provenance columns land via the
    lakehouse schema-evolution path."""
    from dlt_spark.lakehouse import LakehouseTable
    from dlt_spark.plans.runner import run_incremental
    from dlt_spark.sources.changelog import write_change_log

    _views(spark, sf_dir, "orders")
    base = spark.sql(_EXP_EVENTS_SP)
    events = base.select(
        "commit_seq",
        "doc_id",
        "op",
        F.lit(None).cast("array<int>").alias("tokens"),
        F.when(
            F.col("op") != "D",
            F.to_json(F.struct("block", "txs", "events")),
        ).alias("payload"),
        F.lit(1).alias("payload_version"),
        "source",
        F.current_timestamp().alias("extracted_at"),
    )
    tmp = tempfile.mkdtemp(prefix="dlt_exploded_")
    log_path = os.path.join(tmp, "log")
    tbl_path = os.path.join(tmp, "tbl")
    write_change_log(events, log_path, part_width=1_000)
    run_incremental(
        spark, log_path, tbl_path, schema="exploded",
        batch_width=1_000, n_buckets=8, log_part_width=1_000,
    )
    t = LakehouseTable.load(spark, tbl_path)
    return t.read().select(
        "doc_id",
        "kind",
        "array_index",
        "parent_doc_id",
        F.col("_commit_seq").alias("last_seq"),
        F.col("n_tok").cast("bigint").alias("n_tok"),
        "source",
        F.array_join(F.col("tokens").cast("array<string>"), ",").alias("tokens_str"),
    )


def q_cdc_exploded_cascade_final_state(
    spark: SparkSession, sf_dir: str, cascade_mode: str = "eager"
) -> DataFrame:
    """Cascade document deletes on the exploded schema: a parent D event
    tombstones every child key the parent has (engine expands deletes
    against table state + in-batch history; LWW settles re-inserts).
    Final-state law the oracle mirrors: a child is live iff its newest
    containing insert outranks every parent delete.  ``cascade_mode``
    selects eager tombstones or the opt-in equality-delete markers —
    the SAME oracle validates both (identical final-state law; the
    marker variant exercises the read-time marker application with the
    markers still PENDING, i.e. before any materialize)."""
    from dlt_spark.lakehouse import LakehouseTable
    from dlt_spark.plans.runner import run_incremental
    from dlt_spark.sources.changelog import write_change_log

    _views(spark, sf_dir, "orders")
    base = spark.sql(_EXP_EVENTS_SP)
    events = base.select(
        "commit_seq", "doc_id", "op",
        F.lit(None).cast("array<int>").alias("tokens"),
        F.when(F.col("op") != "D",
               F.to_json(F.struct("block", "txs", "events"))).alias("payload"),
        F.lit(1).alias("payload_version"),
        "source",
        F.current_timestamp().alias("extracted_at"),
    )
    tmp = tempfile.mkdtemp(prefix="dlt_cascade_")
    log_path = os.path.join(tmp, "log")
    tbl_path = os.path.join(tmp, "tbl")
    write_change_log(events, log_path, part_width=1_000)
    run_incremental(
        spark, log_path, tbl_path, schema="exploded_cascade",
        batch_width=1_000, n_buckets=8, log_part_width=1_000,
        cascade_mode=cascade_mode,
    )
    t = LakehouseTable.load(spark, tbl_path)
    return t.read().select(
        "doc_id", "kind", "array_index", "parent_doc_id",
        F.col("_commit_seq").alias("last_seq"),
        F.col("n_tok").cast("bigint").alias("n_tok"),
        F.array_join(F.col("tokens").cast("array<string>"), ",").alias("tokens_str"),
    )


def q_cdc_exploded_marker_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opt-in equality-delete MARKER mode (r5) against the SAME oracle
    as the eager cascade: the engine records (parent, del_seq) markers
    at ingest and applies the max-marker-per-parent map at read time —
    the DuckDB recursive final-state law must hold with the markers
    still pending (no materialize ran)."""
    return q_cdc_exploded_cascade_final_state(
        spark, sf_dir, cascade_mode="markers"
    )


def q_cdc_widened_column_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution fold across a TYPE WIDEN (VERDICT r1 next-#6):
    early batches carry an int `score` value column, later batches a
    bigint; the table widens, pre-widen files up-cast at scan (Spark 4
    parquet widening), and the LWW fold stays correct across eras."""
    from dlt_spark.lakehouse import LakehouseTable
    from dlt_spark.operators.dedup import dedup_lww

    _views(spark, sf_dir, "orders")
    ev = (
        spark.sql(_EVENTS_SP)
        .where(F.col("commit_seq") < 4000)
        .withColumn("tokens", F.col("tokens").cast("array<int>"))
    )
    narrow = ev.where(F.col("commit_seq") < 2000).withColumn(
        "score", (F.col("commit_seq") % 100).cast("int")
    )
    wide = ev.where(F.col("commit_seq") >= 2000).withColumn(
        "score", (F.col("commit_seq") % 100 + F.lit(1) * 10**12).cast("bigint")
    )
    tmp = tempfile.mkdtemp(prefix="dlt_widen_")
    t = LakehouseTable.create(spark, os.path.join(tmp, "tbl"), n_buckets=8)
    t.merge(dedup_lww(narrow), "widen", 0, 0, 1999)
    t.merge(dedup_lww(wide), "widen", 1, 2000, 3999)
    return t.read().select(
        "doc_id",
        F.col("_commit_seq").alias("last_seq"),
        F.col("score").cast("bigint").alias("score"),
        F.array_join(F.col("tokens").cast("array<string>"), ",").alias("tokens_str"),
    )


def q_cdc_height_adapter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HeightAdapter (reference schema/height.go:101-108): the record key
    parses to an integer height column — one vectorized regexp+cast
    instead of the reference's per-row strconv.ParseUint."""
    from dlt_spark.adapters import get_adapter

    _views(spark, sf_dir, "orders")
    ev = spark.sql(_EVENTS_SP).select(
        "commit_seq", "doc_id", "op",
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.lit(None).cast("string").alias("payload"),
        F.lit(1).alias("payload_version"),
        "source",
        F.current_timestamp().alias("extracted_at"),
    ).where(F.col("commit_seq") < 2000)
    out = get_adapter("height").normalize(ev)
    return out.select(
        "doc_id", "commit_seq", F.col("height").cast("bigint").alias("height"),
        F.col("n_tok").cast("bigint").alias("n_tok"),
    )


def q_cdc_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 diagnostics: hottest keys by event count (skew profile)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT doc_id, count(*) AS n FROM ({_EVENTS_SP})
        GROUP BY doc_id ORDER BY n DESC, doc_id LIMIT 10
    """)


# ---------------------------------------------------------------------------
# Training-data pipeline ops (documents / embeddings)
# ---------------------------------------------------------------------------

def q_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the driver's events stream table
    (the batch form of the streaming windowed agg; SURVEY §2.9)."""
    _views(spark, sf_dir, "events")
    return spark.sql("""
        SELECT date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:00') AS hour,
               event_type,
               count(*) AS n,
               round(sum(value), 4) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
    """)


def q_docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text)."""
    _views(spark, sf_dir, "documents")
    return spark.sql("""
        SELECT md5(text) AS h, count(*) AS n_copies, min(doc_id) AS keeper
        FROM documents GROUP BY 1
    """)


def q_docs_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures over 3-word shingles (4 hash families).

    Round-6 restructure (guide §4.1: built-ins with codegen beat
    interpreted paths): higher-order-function lambdas are evaluated
    INTERPRETED per element (HOFs are CodegenFallback), so the previous
    ``array_min(transform(shingles, s -> md5...))`` paid interpreted
    md5+conv per shingle × 4 families.  Exploding the shingles to rows
    evaluates the same 4 hashes under whole-stage codegen, and the
    per-doc min becomes a fixed-width HashAggregate with map-side
    partial aggregation — the exchange carries 4 longs per (doc,
    partition), not the shingle strings.  Result set is identical
    (same min over the same shingle multiset; same doc filter)."""
    _views(spark, sf_dir, "documents")
    mh_terms = ", ".join(
        "min({h}) AS mh{k}".format(
            h=_HASH60_SP.format(x=f"concat('{k}|', s)"), k=k
        )
        for k in range(4)
    )
    return spark.sql(f"""
        WITH w AS (SELECT doc_id, split(text, ' ') AS ws FROM documents),
        sh AS (
          SELECT doc_id, concat_ws(' ', ws[i], ws[i+1], ws[i+2]) AS s
          FROM w LATERAL VIEW explode(sequence(0, size(ws) - 3)) t AS i
          WHERE size(ws) >= 3)
        SELECT doc_id, {mh_terms}
        FROM sh GROUP BY doc_id
    """)


def q_docs_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: 2 bands × 2 rows, band-hash join."""
    sig = q_docs_minhash_sig(spark, sf_dir)
    sig.createOrReplaceTempView("mh_sig")
    return spark.sql("""
        WITH bands AS (
          SELECT doc_id, md5(concat_ws(',', cast(mh0 AS string), cast(mh1 AS string))) AS b
          FROM mh_sig
          UNION ALL
          SELECT doc_id, md5(concat_ws(',', cast(mh2 AS string), cast(mh3 AS string))) AS b
          FROM mh_sig)
        SELECT DISTINCT a.doc_id AS a_id, c.doc_id AS b_id
        FROM bands a JOIN bands c ON a.b = c.b AND a.doc_id < c.doc_id
    """)


def q_docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over word hashes (majority vote per bit)."""
    _views(spark, sf_dir, "documents")
    h = _HASH60_SP.format(x="w")
    bit_sums = ", ".join(
        f"sum(CASE WHEN cast(floor(h16 / {1 << b}) AS bigint) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(16)
    )
    bit_or = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
    return spark.sql(f"""
        WITH words AS (
          SELECT doc_id, explode(split(text, ' ')) AS w FROM documents),
        hashed AS (SELECT doc_id, {h} % 65536 AS h16 FROM words),
        bits AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id)
        SELECT doc_id, cast({bit_or} AS bigint) AS simhash FROM bits
    """)


def _simhash32_sql(dialect: str) -> str:
    """32-bit SimHash CTE (both dialects): per-word 60-bit hash → 32
    majority-vote bits.  Wider than the 16-bit signature query so the
    banded join below has 256-way buckets per band; production would use
    64-bit + 16-bit bands (65536-way) — same shape, more bits."""
    h = (_HASH60_SP if dialect == "sp" else _dk_hash60("w")).format(x="w")
    unnest = (
        "explode(split(text, ' '))" if dialect == "sp"
        else "unnest(string_split(text, ' '))"
    )
    bit_sums = ", ".join(
        f"sum(CASE WHEN cast(floor(h32 / {1 << b}) AS bigint) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS s{b}"
        for b in range(32)
    )
    bit_or = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32)
    )
    return f"""
words AS (SELECT doc_id, {unnest} AS w FROM documents),
hashed AS (SELECT doc_id, {h} % 4294967296 AS h32 FROM words),
bits AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id),
sims AS (SELECT doc_id, cast({bit_or} AS bigint) AS sh FROM bits)
"""


def q_docs_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-neighbor join (closes VERDICT r1's 'signature
    only' gap): 4 bands of 8 bits — by pigeonhole any pair within
    Hamming distance 3 shares at least one intact band, so candidates
    come from a banded EQUI-join (256-way buckets per band, never
    all-pairs), then exact bit_count(XOR) verifies ≤ 3 on candidates
    only.  Scale path: widen to 64-bit simhash + 16-bit bands (65536-way
    buckets) — identical shape."""
    _views(spark, sf_dir, "documents")
    bands = " UNION ALL ".join(
        f"SELECT doc_id, sh, {k} AS k, cast(sh div {1 << (8 * k)} AS bigint) % 256 AS byte"
        " FROM sims"
        for k in range(4)
    )
    return spark.sql(f"""
        WITH {_simhash32_sql("sp")},
        bands AS ({bands}),
        cand AS (
          SELECT DISTINCT a.doc_id AS a_id, a.sh AS ha, b.doc_id AS b_id, b.sh AS hb
          FROM bands a JOIN bands b
            ON a.k = b.k AND a.byte = b.byte AND a.doc_id < b.doc_id)
        SELECT a_id, b_id, cast(bit_count(ha ^ hb) AS bigint) AS hamming
        FROM cand WHERE bit_count(ha ^ hb) <= 3
    """)


def q_docs_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by word-set Jaccard >= 0.5 (docs < 60)."""
    _views(spark, sf_dir, "documents")
    return spark.sql("""
        WITH w AS (
          SELECT DISTINCT doc_id, explode(split(text, ' ')) AS word
          FROM documents WHERE doc_id < 60),
        sizes AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
          FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT a_id, b_id,
               round(cast(i AS double) / cast(sa.sz + sb.sz - i AS double), 5) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE cast(i AS double) / cast(sa.sz + sb.sz - i AS double) >= 0.5
    """)


def q_docs_neardup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable near-dup Jaccard (VERDICT r1 next-#4): MinHash-LSH
    candidate pairs first (banded equi-join — bounded buckets), exact
    word-set Jaccard verified on the CANDIDATES ONLY.  No word-level
    self-join anywhere, so no join key with document-frequency blowup
    and no doc_id cap; cost O(candidates · avg_doc_len)."""
    sig = q_docs_minhash_sig(spark, sf_dir)
    sig.createOrReplaceTempView("mh_sig_v")
    return spark.sql("""
        WITH bands AS (
          SELECT doc_id, md5(concat_ws(',', cast(mh0 AS string), cast(mh1 AS string))) AS b
          FROM mh_sig_v
          UNION ALL
          SELECT doc_id, md5(concat_ws(',', cast(mh2 AS string), cast(mh3 AS string))) AS b
          FROM mh_sig_v),
        cand AS (
          SELECT DISTINCT a.doc_id AS a_id, c.doc_id AS b_id
          FROM bands a JOIN bands c ON a.b = c.b AND a.doc_id < c.doc_id),
        w AS (SELECT DISTINCT doc_id, explode(split(text, ' ')) AS word
              FROM documents),
        sizes AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
        inter AS (
          SELECT cand.a_id, cand.b_id, count(*) AS i
          FROM cand
          JOIN w wa ON wa.doc_id = cand.a_id
          JOIN w wb ON wb.doc_id = cand.b_id AND wb.word = wa.word
          GROUP BY 1, 2)
        SELECT a_id, b_id,
               round(cast(i AS double) / cast(sa.sz + sb.sz - i AS double), 5) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE cast(i AS double) / cast(sa.sz + sb.sz - i AS double) >= 0.5
    """)


def q_docs_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components clustering of the verified near-duplicate
    pairs — the canonicalization step after near-dup detection (keep
    one representative per duplicate cluster).  Delegates to
    operators.components.connected_components: alternating large-star/
    small-star edge contraction (Kiveris et al. SoCC'14), iterated to
    a detected fixpoint — so the
    cluster id is the true component minimum at ANY diameter (the r3
    fixed-8-round unroll silently under-merged chains longer than 8
    hops, VERDICT r3 wrong-#2; locked by the long-chain fixture in
    tests/test_operators.py).  The DuckDB oracle is a recursive CTE
    computing the same fixpoint, so the iterative algorithm stays
    value-hash checkable without pinning a round count on either side.
    Output: (doc_id, cluster_id = min doc_id in component,
    is_canonical)."""
    pairs = q_docs_neardup_verified(spark, sf_dir).select("a_id", "b_id")
    labels = connected_components(pairs, src="a_id", dst="b_id")
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_canonical"),
    )


def q_docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation decision — the composition a training-data
    pipeline actually ships: exact-dedup (md5 keep-smallest-id) ∥
    quality score ∥ language band ∥ length window, folded into one
    keep/drop verdict per document with the reason flags exposed.  One
    window over md5(text) (the dedup shuffle) + per-row Catalyst
    features — no other exchange; every stage is the same expression
    its standalone query uses, so this is plan-fusion of the whole
    pipeline, not a driver-side loop over stages."""
    _views(spark, sf_dir, "documents")
    return spark.sql("""
      WITH base AS (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id)
                 AS dup_rank
        FROM documents),
      f AS (
        SELECT doc_id, dup_rank,
               size(split(text, ' ')) AS n_words,
               size(filter(split(text, ' '),
                    w -> w IN ('the', 'and', 'of', 'a', 'to', 'in'))) AS n_stop,
               length(replace(text, ' ', '')) AS n_lchars,
               length(regexp_replace(text, '[^aeiou]', '')) AS v,
               length(regexp_replace(text, '[^a-z]', '')) AS l
        FROM base),
      d AS (
        SELECT doc_id,
               dup_rank > 1 AS is_dup,
               cast(n_words AS bigint) AS n_words,
               round(1.0 / (1.0 + exp(-(0.01 * n_words
                        + 2.0 * cast(n_stop AS double) / n_words
                        - 0.1 * abs(cast(n_lchars AS double) / n_words - 5.0)))),
                     5) AS score,
               -- keep-threshold in EXACT integer arithmetic (VERDICT r3
               -- next-#9): score >= 0.5 iff the logit >= 0; multiplying
               -- the logit by the positive 100*n_words clears every
               -- denominator, so the comparison is pure int64 on both
               -- engines and the float boundary risk is retired:
               --   w^2 + 200*n_stop - 10*|n_lchars - 5*w| >= 0
               -- (bigint throughout: size() is int32 and w^2 overflows
               -- it past ~46k words; the n_words cap is 100k)
               (cast(n_words AS bigint) * n_words + 200 * cast(n_stop AS bigint)
                - 10 * abs(cast(n_lchars AS bigint) - 5 * n_words) >= 0)
                 AS score_ok,
               CASE WHEN cast(v AS double) / l >= 0.40 THEN 'vowel-heavy'
                    WHEN cast(v AS double) / l >= 0.30 THEN 'en-like'
                    ELSE 'consonantal' END AS pred_lang
        FROM f WHERE n_words > 0 AND l > 0)
      SELECT doc_id, is_dup, n_words, score, pred_lang,
             (NOT is_dup AND score_ok AND pred_lang != 'consonantal'
              AND n_words BETWEEN 5 AND 100000) AS keep
      FROM d
    """)


def q_docs_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the concat-then-chunk pretraining step: lay
    documents end to end in a deterministic order and cut fixed
    512-token training windows; each doc reports its global token
    offset and the pack range it spans.  One window cumsum (single
    sort); at 100 TB you run exactly this per SHARD (pack_id keyed by
    (shard, local offset)) so no global sort exists — the per-shard
    plan is this one."""
    _views(spark, sf_dir, "documents")
    return spark.sql("""
      WITH c AS (
        SELECT doc_id, n_chars,
               sum(n_chars) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS off0
        FROM documents)
      SELECT doc_id,
             cast(coalesce(off0, 0) AS bigint) AS global_offset,
             cast(floor(coalesce(off0, 0) / 512) AS bigint) AS pack_start,
             cast(floor((coalesce(off0, 0) + n_chars - 1) / 512) AS bigint)
               AS pack_end
      FROM c
    """)


def q_docs_seq_packing_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, SHARDED — the form that actually runs at
    100 TB (VERDICT r3 next-#4: the global query's single-partition
    window was prose-only).  Documents hash-shard by doc_id; each shard
    lays its documents end to end independently (window PARTITIONED by
    shard → one sort per shard, all shards in parallel, no global
    sort anywhere in the plan) and cuts 512-token windows; pack
    identity is the PAIR (shard, pack index) so no cross-shard
    coordination exists.  This is exactly how packing shards in
    practice: each shard produces its own stream of training windows.
    tests/test_entry_oracles.py locks (a) the plan has no
    single-partition Sort and (b) each shard's offsets are the same
    cumsum the global form would produce restricted to that shard's
    documents in the same order (permutation-consistent refinement)."""
    _views(spark, sf_dir, "documents")
    return spark.sql("""
      WITH c AS (
        SELECT doc_id, n_chars,
               pmod(doc_id, 16) AS shard,
               sum(n_chars) OVER (PARTITION BY pmod(doc_id, 16)
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS off0
        FROM documents)
      SELECT doc_id,
             cast(shard AS bigint) AS shard,
             cast(coalesce(off0, 0) AS bigint) AS shard_offset,
             cast(floor(coalesce(off0, 0) / 512) AS bigint) AS pack_start,
             cast(floor((coalesce(off0, 0) + n_chars - 1) / 512) AS bigint)
               AS pack_end
      FROM c
    """)


def q_emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors 0-4.
    Double-precision left-to-right fold on both engines → bit-stable."""
    _views(spark, sf_dir, "embeddings")
    return spark.sql("""
        WITH e AS (
          SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS emb
          FROM embeddings),
        n AS (
          SELECT vec_id, emb,
                 sqrt(aggregate(emb, cast(0.0 AS double), (a, x) -> a + x * x)) AS nrm
          FROM e),
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 aggregate(zip_with(q.emb, c.emb, (x, y) -> x * y),
                           cast(0.0 AS double), (a, x) -> a + x) / (q.nrm * c.nrm) AS sim
          FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id >= 5),
        ranked AS (
          SELECT query_id, neighbor_id, sim,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id) AS rnk
          FROM pairs)
        SELECT query_id, neighbor_id, cast(rnk AS bigint) AS rnk,
               round(sim, 5) AS sim_r
        FROM ranked WHERE rnk <= 5
    """)


def q_emb_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: multi-table sign-LSH cosine top-k — 8 hyperplanes
    per table (256-way key space; planes scale with corpus via
    recommended_planes) × 2 independent tables OR-ed for recall
    (VERDICT r1 next-#3: no 8-key skew catastrophe, no .first() dim
    probe)."""
    from dlt_spark.functions.similarity import lsh_bucket_topk

    _views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    out = lsh_bucket_topk(
        emb.where(F.col("vec_id") < 5),
        emb.where(F.col("vec_id") >= 5),
        dim=64,
        k=5,
        n_planes=8,
        n_tables=2,
    )
    return out.select(
        "query_id", "neighbor_id", "rnk", F.round("sim", 5).alias("sim_r")
    )


def q_emb_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path #2: IVF — 8 fixed centroid cells, nprobe=2."""
    from dlt_spark.functions.similarity import ivf_topk

    _views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    out = ivf_topk(
        emb.where(F.col("vec_id") < 5),
        emb.where(F.col("vec_id") >= 13),
        centroids=emb.where(F.col("vec_id").between(5, 12)),
        k=5,
        nprobe=2,
    )
    return out.select(
        "query_id", "neighbor_id", "rnk", F.round("sim", 5).alias("sim_r")
    )


def q_emb_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with TRAINED centroids, now fully oracle-checked (VERDICT r2
    #5): training is integer-exact k-means (md5-selected sample,
    quantized vectors, floor-div means — similarity.py
    train_centroids_exact), so DuckDB re-derives bit-identical centroids
    in pure SQL and the driver hash-compares assignment + ranking like
    any other query.  Assignment and candidate ranking stay
    distributed (broadcast centroid join + cell equi-join)."""
    from dlt_spark.functions.similarity import ivf_topk, train_centroids_exact

    _views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    corpus = emb.where(F.col("vec_id") >= 5)
    cents = train_centroids_exact(corpus, k=8, n_iters=3, sample=512)
    out = ivf_topk(
        emb.where(F.col("vec_id") < 5), corpus, centroids=cents, k=5, nprobe=2
    )
    return out.select(
        "query_id", "neighbor_id", "rnk", F.round("sim", 5).alias("sim_r")
    )


def q_emb_ann_ivf_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF whose k-means training runs FULLY DISTRIBUTED — every Lloyd
    pass one Spark job over the whole corpus (shuffle-free literal-
    centroid assignment + one map-side-combined aggregate; similarity.py
    train_centroids_distributed).  Integer-exact arithmetic makes the
    result independent of partitioning AND bit-identical to the
    driver-side exact trainer on the same rows, so the SAME DuckDB
    oracle re-derives it with the sample cap lifted to the corpus.
    This is the trainer for corpora where a hash-sample can't represent
    the distribution (VERDICT r2 missing-#3)."""
    from dlt_spark.functions.similarity import (
        ivf_topk,
        train_centroids_distributed,
    )

    _views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    corpus = emb.where(F.col("vec_id") >= 5)
    cents = train_centroids_distributed(corpus, k=8, n_iters=3)
    out = ivf_topk(
        emb.where(F.col("vec_id") < 5), corpus, centroids=cents, k=5, nprobe=2
    )
    return out.select(
        "query_id", "neighbor_id", "rnk", F.round("sim", 5).alias("sim_r")
    )


def q_emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets."""
    from dlt_spark.functions.similarity import near_dup_pairs_cosine

    _views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings").where(F.col("vec_id") < 150)
    out = near_dup_pairs_cosine(emb, dim=64, threshold=0.3, n_planes=4, n_tables=2)
    return out.select("a_id", "b_id", F.round("sim", 5).alias("sim_r"))


def q_docs_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profiling — the first thing a pretraining-data run
    reports: documents bucketed by power-of-2 length with per-bucket
    count/char mass/extremes and a whitespace-token estimate.  The
    bucket id is length(bin(n_chars)) = floor(log2)+1 computed on the
    INTEGER binary representation, so no float log enters the bucket
    boundary on either engine.  One map-side-combined hash aggregate;
    at 100 TB this is a single scan + k≈30-row result."""
    _views(spark, sf_dir, "documents")
    return spark.sql("""
      SELECT length(bin(n_chars)) AS len_bucket,
             cast(count(*) AS bigint) AS n_docs,
             cast(sum(n_chars) AS bigint) AS total_chars,
             cast(min(n_chars) AS bigint) AS min_chars,
             cast(max(n_chars) AS bigint) AS max_chars,
             cast(sum(size(split(text, ' ')) ) AS bigint) AS total_words
      FROM documents WHERE n_chars > 0
      GROUP BY length(bin(n_chars))
    """)


def q_docs_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filter (the Gopher/MassiveText rule
    family: drop documents whose duplicate n-gram mass is high).  For
    each document: fraction of word-3-gram OCCURRENCES that are
    repeats, 1 - distinct/total over the shingle array — pure Catalyst
    array functions (split → sliding shingles → array_distinct), zero
    shuffle, zero UDF; the repeated mass of the most-frequent 3-gram
    alone is reported too (top_gram_frac).  Flag threshold 0.2 kept as
    an exact comparison on integer counts (5·distinct ≥ 4·total)."""
    _views(spark, sf_dir, "documents")
    return spark.sql("""
      WITH s AS (
        SELECT doc_id, split(text, ' ') AS ws FROM documents),
      g AS (
        SELECT doc_id,
               transform(sequence(0, size(ws) - 3),
                         i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) AS grams
        FROM s WHERE size(ws) >= 3)
      SELECT doc_id,
             cast(size(grams) AS bigint) AS n_grams,
             cast(size(array_distinct(grams)) AS bigint) AS n_distinct,
             round(1.0 - cast(size(array_distinct(grams)) AS double)
                       / size(grams), 5) AS rep_ratio,
             (5 * size(array_distinct(grams)) < 4 * size(grams))
               AS flag_repetitive
      FROM g
    """)


def q_docs_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation split — the assignment every
    pipeline needs to be reproducible and join-free: md5(doc_id) mod
    100 < 95 → train, else val (hash-stratified, stable across runs and
    engines, no RNG state).  Emits the assignment plus per-split
    aggregate sanity counts via a window so the query is one scan.  At
    100 TB this is a per-row expression — no shuffle for the
    assignment itself (the audit counts add one tiny aggregate)."""
    _views(spark, sf_dir, "documents")
    return spark.sql("""
      WITH a AS (
        SELECT doc_id, n_chars,
               cast(conv(substring(md5(cast(doc_id AS string)), 1, 6), 16, 10)
                    AS bigint) % 100 AS h
        FROM documents)
      SELECT doc_id,
             CASE WHEN h < 95 THEN 'train' ELSE 'val' END AS split,
             cast(h AS bigint) AS bucket_pct,
             cast(count(*) OVER (PARTITION BY h < 95) AS bigint)
               AS split_docs,
             cast(sum(n_chars) OVER (PARTITION BY h < 95) AS bigint)
               AS split_chars
      FROM a
    """)


def q_emb_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space duplicate clusters: cosine near-dup pairs (LSH
    buckets, exact cosine verified per pair) fed through the same
    alternating-star connected-components operator the text pipeline
    uses — the canonicalization step for semantic dedup (keep one
    representative per cluster of near-identical embeddings).  Same
    fixpoint guarantees as docs_dedup_clusters: correct at any cluster
    diameter, loud failure if unconverged; oracle is the recursive-CTE
    reachability fixpoint over the same pair SQL."""
    pairs = q_emb_neardup_pairs(spark, sf_dir).select("a_id", "b_id")
    labels = connected_components(pairs, src="a_id", dst="b_id")
    return labels.select(
        F.col("node").alias("vec_id"),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_canonical"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload column → mapInPandas feature
    extraction over Arrow batches (decode kernel stubbed — byte-level
    features the oracle can recompute from the source text)."""
    from dlt_spark.functions.multimodal import (
        extract_features,
        media_from_documents,
    )

    _views(spark, sf_dir, "documents")
    media = media_from_documents(spark.table("documents"))
    feats = extract_features(media, n_samples=4)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.col("first_byte").cast("bigint").alias("first_byte"),
        F.col("last_byte").cast("bigint").alias("last_byte"),
        F.array_join(F.col("samples").cast("array<string>"), ",").alias("samples_str"),
    )


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: mapInPandas fan-out (3 frames per
    payload), byte-window kernel stub (documents are ASCII so the oracle
    reconstructs frames from substrings)."""
    from dlt_spark.functions.multimodal import frame_sample, media_from_documents

    _views(spark, sf_dir, "documents")
    media = media_from_documents(spark.table("documents").where(F.col("doc_id") < 200))
    frames = frame_sample(media, n_frames=3, frame_size=16)
    return frames.select(
        F.col("media_id").alias("doc_id"),
        F.col("frame_index").cast("bigint").alias("frame_index"),
        "frame_start",
        F.decode(F.col("frame"), "utf-8").alias("frame_text"),
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: mapInPandas even-stride byte downsample to 24
    bytes (nearest-neighbor stand-in), byte-exact oracle via substr."""
    from dlt_spark.functions.multimodal import media_from_documents, resize_media

    _views(spark, sf_dir, "documents")
    media = media_from_documents(spark.table("documents").where(F.col("doc_id") < 200))
    out = resize_media(media, target_bytes=24)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "mime",
        F.decode(F.col("data"), "utf-8").alias("resized_text"),
    )


def q_emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding count + mean L2 norm."""
    _views(spark, sf_dir, "embeddings")
    return spark.sql("""
        SELECT cast(label AS bigint) AS label, count(*) AS n,
               round(avg(sqrt(aggregate(transform(embedding, x -> cast(x AS double)),
                                        cast(0.0 AS double), (a, x) -> a + x * x))), 5) AS avg_norm
        FROM embeddings GROUP BY label
    """)


def q_docs_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: vowel-ratio bands over letters."""
    _views(spark, sf_dir, "documents")
    return spark.sql("""
        WITH s AS (
          SELECT doc_id,
                 length(regexp_replace(text, '[^aeiou]', '')) AS v,
                 length(regexp_replace(text, '[^a-z]', '')) AS l
          FROM documents)
        SELECT doc_id, round(cast(v AS double) / cast(l AS double), 4) AS vowel_ratio,
               CASE WHEN cast(v AS double) / cast(l AS double) >= 0.40 THEN 'vowel-heavy'
                    WHEN cast(v AS double) / cast(l AS double) >= 0.30 THEN 'en-like'
                    ELSE 'consonantal' END AS pred_lang
        FROM s WHERE l > 0
    """)


def q_docs_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword-ratio / word-length features."""
    _views(spark, sf_dir, "documents")
    return spark.sql("""
        WITH f AS (
          SELECT doc_id,
                 size(split(text, ' ')) AS n_words,
                 size(filter(split(text, ' '),
                             w -> w IN ('the', 'and', 'of', 'a', 'to', 'in'))) AS n_stop,
                 length(replace(text, ' ', '')) AS n_lchars
          FROM documents)
        SELECT doc_id, cast(n_words AS bigint) AS n_words,
               round(cast(n_stop AS double) / n_words, 5) AS stop_ratio,
               round(1.0 / (1.0 + exp(-(0.01 * n_words
                                        + 2.0 * cast(n_stop AS double) / n_words
                                        - 0.1 * abs(cast(n_lchars AS double) / n_words - 5.0)))),
                     5) AS score
        FROM f WHERE n_words > 0
    """)


def q_docs_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace split vs alnum-run regex tokenizer."""
    _views(spark, sf_dir, "documents")
    return spark.sql("""
        SELECT doc_id,
               cast(size(split(text, ' ')) AS bigint) AS n_ws,
               cast(size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS bigint) AS n_re,
               cast(length(regexp_replace(text, '[^a-z0-9]', '')) AS bigint) AS n_alnum
        FROM documents
    """)


def q_docs_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing, Schleimer et al.
    MOSS): hash every character 5-gram, take the min per sliding window
    of 4 — content-defined fingerprints robust to local edits, the
    near-dup primitive exact-hash fingerprints can't give.  Pure
    Catalyst array expressions; DuckDB regenerates bit-identically."""
    _views(spark, sf_dir, "documents")
    h = _HASH60_SP.format(x="substr(text, i + 1, 5)")
    return spark.sql(f"""
        WITH g AS (
          SELECT doc_id,
                 transform(sequence(0, cast(length(text) - 5 AS int)),
                           i -> {h} % 1000000) AS grams
          FROM documents WHERE length(text) >= 8),
        w AS (
          SELECT doc_id,
                 array_sort(array_distinct(
                   transform(sequence(0, cast(size(grams) - 4 AS int)),
                             j -> array_min(slice(grams, j + 1, 4))))) AS fps
          FROM g)
        SELECT doc_id,
               cast(size(fps) AS bigint) AS n_fp,
               array_join(cast(slice(fps, 1, 8) AS array<string>), ',') AS fp_head
        FROM w
    """)


def q_docs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check — the n-gram-overlap
    decontamination step every large training pipeline runs before
    training (GPT-3 App. C / PaLM style): docs sharing any distinct
    word-5-gram with the benchmark set (stand-in: doc_id % 97 == 0,
    i.e. an eval suite registered by id) are flagged with their
    shared-gram count.  Plan shape: per-doc distinct gram hashes (one
    projection, no shuffle) → explode → EQUI-JOIN on the gram hash —
    never an all-pairs comparison; at corpus scale the join is
    hash-partitioned over the gram key space and the benchmark side
    broadcasts (an eval suite is small by construction)."""
    _views(spark, sf_dir, "documents")
    h = _HASH60_SP.format(x="concat_ws(' ', slice(ws, cast(i + 1 AS int), 5))")
    return spark.sql(f"""
      WITH w AS (SELECT doc_id, split(text, ' ') AS ws FROM documents),
      g AS (SELECT doc_id,
              array_distinct(transform(sequence(0, cast(size(ws) - 5 AS int)),
                i -> {h})) AS grams
            FROM w WHERE size(ws) >= 5),
      bench AS (SELECT DISTINCT gh FROM (
                  SELECT explode(grams) AS gh FROM g WHERE doc_id % 97 = 0)),
      cand AS (SELECT doc_id, explode(grams) AS gh
               FROM g WHERE doc_id % 97 != 0)
      SELECT cand.doc_id, cast(count(*) AS bigint) AS shared_grams
      FROM cand JOIN bench ON cand.gh = bench.gh
      GROUP BY cand.doc_id
    """)


# Portable PII scrub: character classes only ([.] instead of an escaped
# dot), so the Java-regex (Spark) and RE2 (DuckDB) texts are IDENTICAL
# byte-for-byte — no escaping asymmetry between engines.
_PII_SSN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
_PII_EMAIL = "[a-zA-Z0-9._]+@[a-zA-Z0-9-]+[.][a-zA-Z][a-zA-Z]+"
# GFLAG: Spark's regexp_replace is replace-ALL with 3 args; DuckDB
# replaces only the FIRST match unless given the 'g' flag — the one
# engine asymmetry in this statement (caught by the planted-PII test).
_PII_SCRUB_SQL = f"""
SELECT doc_id,
       cast(COUNT_SSN AS bigint) AS n_ssn,
       cast(COUNT_EMAIL AS bigint) AS n_email,
       md5(regexp_replace(regexp_replace(text,
           '{_PII_SSN}', '<SSN>'GFLAG),
           '{_PII_EMAIL}', '<EMAIL>'GFLAG)) AS scrubbed_md5
FROM documents
"""


def pii_scrub_spark_sql() -> str:
    """The scrub statement over a ``documents`` view (shared by the
    entry query and the planted-PII redaction test)."""
    return _PII_SCRUB_SQL.replace(
        "COUNT_SSN", f"size(regexp_extract_all(text, '{_PII_SSN}', 0))"
    ).replace(
        "COUNT_EMAIL", f"size(regexp_extract_all(text, '{_PII_EMAIL}', 0))"
    ).replace("GFLAG", "")


def q_docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — scrub SSN- and email-shaped spans and count the
    redactions (the pre-training privacy pass).  Pure Catalyst
    regexp_replace/regexp_extract_all (JVM-side, codegen'd, no shuffle,
    trivially row-parallel at 100 TB); the synthetic corpus contains no
    PII so the counts are zero here — the redaction semantics are
    pinned by tests/test_entry_oracles.py::test_pii_scrub_redacts with
    planted SSNs/emails running this same SQL."""
    _views(spark, sf_dir, "documents")
    return spark.sql(pii_scrub_spark_sql())


def q_docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-text md5 + head-shingle md5."""
    _views(spark, sf_dir, "documents")
    return spark.sql("""
        SELECT doc_id, md5(text) AS fp_full,
               md5(array_join(slice(split(text, ' '), 1, 5), ' ')) AS fp_head
        FROM documents
    """)


# ---------------------------------------------------------------------------
# registry + oracles
# ---------------------------------------------------------------------------

QUERIES = {
    "cdc_lww_final_state": q_cdc_lww_final_state,
    "cdc_merge_final_state": q_cdc_merge_final_state,
    "cdc_watermark": q_cdc_watermark,
    "cdc_batch_lineage": q_cdc_batch_lineage,
    "cdc_range_scan": q_cdc_range_scan,
    "cdc_replay_guard": q_cdc_replay_guard,
    "cdc_dedup_counts": q_cdc_dedup_counts,
    "cdc_row_ids": q_cdc_row_ids,
    "cdc_normalize_versions": q_cdc_normalize_versions,
    "cdc_explode_provenance": q_cdc_explode_provenance,
    "cdc_exploded_adapter_final_state": q_cdc_exploded_adapter_final_state,
    "cdc_exploded_cascade_final_state": q_cdc_exploded_cascade_final_state,
    "cdc_exploded_marker_final_state": q_cdc_exploded_marker_final_state,
    "cdc_widened_column_final_state": q_cdc_widened_column_final_state,
    "cdc_height_adapter": q_cdc_height_adapter,
    "cdc_hot_keys": q_cdc_hot_keys,
    "events_hourly_rollup": q_events_hourly_rollup,
    "docs_exact_dedup": q_docs_exact_dedup,
    "docs_minhash_sig": q_docs_minhash_sig,
    "docs_minhash_lsh_pairs": q_docs_minhash_lsh_pairs,
    "docs_simhash": q_docs_simhash,
    "docs_simhash_neardup": q_docs_simhash_neardup,
    "docs_ngram_jaccard": q_docs_ngram_jaccard,
    "docs_neardup_verified": q_docs_neardup_verified,
    "docs_dedup_clusters": q_docs_dedup_clusters,
    "docs_seq_packing": q_docs_seq_packing,
    "docs_seq_packing_sharded": q_docs_seq_packing_sharded,
    "docs_length_histogram": q_docs_length_histogram,
    "docs_repetition_ratio": q_docs_repetition_ratio,
    "docs_train_val_split": q_docs_train_val_split,
    "docs_curation_pipeline": q_docs_curation_pipeline,
    "emb_cosine_topk": q_emb_cosine_topk,
    "emb_ann_lsh_topk": q_emb_ann_lsh_topk,
    "emb_ann_ivf_topk": q_emb_ann_ivf_topk,
    "emb_ann_ivf_trained": q_emb_ann_ivf_trained,
    "emb_ann_ivf_distributed": q_emb_ann_ivf_distributed,
    "emb_neardup_pairs": q_emb_neardup_pairs,
    "emb_dedup_clusters": q_emb_dedup_clusters,
    "multimodal_features": q_multimodal_features,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_resize": q_multimodal_resize,
    "emb_norm_stats": q_emb_norm_stats,
    "docs_lang_id": q_docs_lang_id,
    "docs_quality_score": q_docs_quality_score,
    "docs_token_count": q_docs_token_count,
    "docs_fingerprint": q_docs_fingerprint,
    "docs_winnow_fingerprint": q_docs_winnow_fingerprint,
    "docs_contamination": q_docs_contamination,
    "docs_pii_scrub": q_docs_pii_scrub,
}


def _dk_hash60(x: str) -> str:
    return _HASH60_DK.format(x=x)


_DK_ARR2STR = "array_to_string(tokens, ',')"

_ORACLES: dict[str, str] = {}

_ORACLES["cdc_lww_final_state"] = _SQL_LWW_FINAL.format(
    events=_EVENTS_DK, arr2str=_DK_ARR2STR
)
_ORACLES["cdc_merge_final_state"] = _ORACLES["cdc_lww_final_state"]

_ORACLES["cdc_watermark"] = (
    f"SELECT max(commit_seq) AS watermark, count(*) AS n_events FROM ({_EVENTS_DK})"
)

_ORACLES["cdc_batch_lineage"] = f"""
SELECT cast(floor(commit_seq / 1000) AS bigint) AS batch_id,
       min(commit_seq) AS seq_from, max(commit_seq) AS seq_to,
       count(*) AS n_events, min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM ({_EVENTS_DK}) GROUP BY 1
"""

_ORACLES["cdc_range_scan"] = f"""
SELECT op, count(*) AS n FROM ({_EVENTS_DK})
WHERE commit_seq BETWEEN 3000 AND 7999 GROUP BY op
"""

_ORACLES["cdc_replay_guard"] = f"""
WITH batches AS (
  SELECT DISTINCT cast(floor(commit_seq/1000) AS bigint) AS batch_id FROM ({_EVENTS_DK}))
SELECT batch_id FROM batches WHERE batch_id >= 5
"""

_ORACLES["cdc_dedup_counts"] = f"""
WITH ranked AS (
  SELECT op, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY commit_seq DESC) AS rn
  FROM ({_EVENTS_DK}))
SELECT op, count(*) AS n FROM ranked WHERE rn = 1 GROUP BY op
"""

_ORACLES["cdc_row_ids"] = f"""
SELECT doc_id, commit_seq,
       sha256(doc_id || '|' || cast(commit_seq AS varchar)) AS row_id
FROM ({_EVENTS_DK}) WHERE commit_seq < 100
"""

_ORACLES["cdc_normalize_versions"] = f"""
SELECT doc_id, array_to_string(toks, ',') AS tokens_str,
       cast(len(toks) AS bigint) AS n_tok
FROM ({_DOCTOKS_DK})
"""

_ORACLES["cdc_explode_provenance"] = f"""
WITH t AS (SELECT doc_id, toks FROM ({_DOCTOKS_DK}) WHERE doc_id < 50)
SELECT doc_id, cast(i - 1 AS bigint) AS array_index,
       cast(toks[i] AS bigint) AS token
FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)
"""

# DuckDB twin of _EXP_EVENTS_SP: children regenerated arithmetically
# (no JSON round-trip needed — the payload IS a pure function of the
# event), then LWW per child key.  Tx/event children only exist on
# non-delete events; a delete tombstones the block child, sub-rows of
# earlier versions persist until individually deleted — matching the
# adapter's documented upsert-by-PK semantics (and the reference's).
_EXP_EV_DK = """
SELECT o_orderkey AS commit_seq,
       'doc_' || lpad(cast(o_custkey % 150 AS varchar), 4, '0') AS doc_id,
       CASE WHEN o_orderkey % 10 = 9 THEN 'D'
            WHEN o_orderkey % 10 >= 6 THEN 'U' ELSE 'I' END AS op,
       o_orderpriority AS source
FROM orders WHERE o_orderkey < 3000
"""

_ORACLES["cdc_exploded_adapter_final_state"] = f"""
WITH ev AS ({_EXP_EV_DK}),
children AS (
  SELECT doc_id || '/block/0' AS doc_id, 'block' AS kind,
         cast(0 AS bigint) AS array_index, doc_id AS parent_doc_id,
         op, commit_seq, source,
         CASE WHEN op = 'D' THEN NULL
              ELSE list_transform(range(commit_seq % 13 + 3),
                                  i -> (commit_seq * (i + 7)) % 1000)
         END AS toks
  FROM ev
  UNION ALL
  SELECT doc_id || '/tx/' || u.j, 'tx', cast(u.j AS bigint), doc_id,
         op, commit_seq, source,
         list_transform(range((commit_seq + u.j) % 5 + 2),
                        k -> (commit_seq * (u.j + 3) + k) % 1000)
  FROM ev, LATERAL (SELECT unnest(range(ev.commit_seq % 4)) AS j) u
  WHERE op <> 'D'
  UNION ALL
  SELECT doc_id || '/event/' || u.j, 'event', cast(u.j AS bigint), doc_id,
         op, commit_seq, source,
         list_transform(range((commit_seq + 2 * u.j) % 4 + 1),
                        k -> (commit_seq * (u.j + 11) + 2 * k) % 1000)
  FROM ev, LATERAL (SELECT unnest(range((ev.commit_seq + 1) % 3)) AS j) u
  WHERE op <> 'D'),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY commit_seq DESC) AS rn
  FROM children)
SELECT doc_id, kind, array_index, parent_doc_id,
       commit_seq AS last_seq, cast(len(toks) AS bigint) AS n_tok, source,
       array_to_string(toks, ',') AS tokens_str
FROM ranked WHERE rn = 1 AND op <> 'D'
"""

# Cascade-delete law (see q_cdc_exploded_cascade_final_state): a child
# is live iff its newest containing insert outranks every parent delete.
_ORACLES["cdc_exploded_cascade_final_state"] = f"""
WITH ev AS ({_EXP_EV_DK}),
children AS (
  SELECT doc_id || '/block/0' AS doc_id, 'block' AS kind,
         cast(0 AS bigint) AS array_index, doc_id AS parent_doc_id,
         commit_seq,
         list_transform(range(commit_seq % 13 + 3),
                        i -> (commit_seq * (i + 7)) % 1000) AS toks
  FROM ev WHERE op <> 'D'
  UNION ALL
  SELECT doc_id || '/tx/' || u.j, 'tx', cast(u.j AS bigint), doc_id,
         commit_seq,
         list_transform(range((commit_seq + u.j) % 5 + 2),
                        k -> (commit_seq * (u.j + 3) + k) % 1000)
  FROM ev, LATERAL (SELECT unnest(range(ev.commit_seq % 4)) AS j) u
  WHERE op <> 'D'
  UNION ALL
  SELECT doc_id || '/event/' || u.j, 'event', cast(u.j AS bigint), doc_id,
         commit_seq,
         list_transform(range((commit_seq + 2 * u.j) % 4 + 1),
                        k -> (commit_seq * (u.j + 11) + 2 * k) % 1000)
  FROM ev, LATERAL (SELECT unnest(range((ev.commit_seq + 1) % 3)) AS j) u
  WHERE op <> 'D'),
del_max AS (
  SELECT doc_id AS p, max(commit_seq) AS dmax FROM ev WHERE op = 'D' GROUP BY 1),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY commit_seq DESC) AS rn
  FROM children)
SELECT doc_id, kind, array_index, parent_doc_id,
       commit_seq AS last_seq, cast(len(toks) AS bigint) AS n_tok,
       array_to_string(toks, ',') AS tokens_str
FROM ranked r LEFT JOIN del_max d ON r.parent_doc_id = d.p
WHERE rn = 1 AND (d.dmax IS NULL OR r.commit_seq > d.dmax)
"""

_ORACLES["cdc_exploded_marker_final_state"] = (
    _ORACLES["cdc_exploded_cascade_final_state"]
)

_ORACLES["cdc_widened_column_final_state"] = f"""
WITH ev AS (SELECT * FROM ({_EVENTS_DK}) WHERE commit_seq < 4000),
scored AS (
  SELECT *, CASE WHEN commit_seq < 2000 THEN commit_seq % 100
                 ELSE commit_seq % 100 + 1000000000000 END AS score
  FROM ev),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY commit_seq DESC) AS rn
  FROM scored)
SELECT doc_id, commit_seq AS last_seq, score, {_DK_ARR2STR} AS tokens_str
FROM ranked WHERE rn = 1 AND op <> 'D'
"""

_ORACLES["cdc_height_adapter"] = f"""
SELECT doc_id, commit_seq,
       cast(regexp_extract(doc_id, '(\\d+)$', 1) AS bigint) AS height,
       CASE WHEN op = 'D' THEN NULL ELSE n_tok END AS n_tok
FROM ({_EVENTS_DK}) WHERE commit_seq < 2000
"""

_ORACLES["cdc_hot_keys"] = f"""
SELECT doc_id, count(*) AS n FROM ({_EVENTS_DK})
GROUP BY doc_id ORDER BY n DESC, doc_id LIMIT 10
"""

_ORACLES["events_hourly_rollup"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""

_ORACLES["docs_exact_dedup"] = """
SELECT md5(text) AS h, count(*) AS n_copies, min(doc_id) AS keeper
FROM documents GROUP BY 1
"""

_mh_terms = ", ".join(
    "list_min(list_transform(shingles, s -> {h})) AS mh{k}".format(
        h=_dk_hash60(f"'{k}|' || s"), k=k
    )
    for k in range(4)
)
_ORACLES["docs_minhash_sig"] = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id,
         list_transform(range(len(ws) - 2),
                        i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) AS shingles
  FROM w WHERE len(ws) >= 3)
SELECT doc_id, {_mh_terms} FROM sh
"""

_ORACLES["docs_minhash_lsh_pairs"] = f"""
WITH sig AS ({_ORACLES["docs_minhash_sig"]}),
bands AS (
  SELECT doc_id, md5(cast(mh0 AS varchar) || ',' || cast(mh1 AS varchar)) AS b FROM sig
  UNION ALL
  SELECT doc_id, md5(cast(mh2 AS varchar) || ',' || cast(mh3 AS varchar)) AS b FROM sig)
SELECT DISTINCT a.doc_id AS a_id, c.doc_id AS b_id
FROM bands a JOIN bands c ON a.b = c.b AND a.doc_id < c.doc_id
"""

_dk_bit_sums = ", ".join(
    f"sum(CASE WHEN cast(floor(h16 / {1 << b}) AS bigint) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(16)
)
_dk_bit_or = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
_ORACLES["docs_simhash"] = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
hashed AS (SELECT doc_id, {_dk_hash60('w')} % 65536 AS h16 FROM words),
bits AS (SELECT doc_id, {_dk_bit_sums} FROM hashed GROUP BY doc_id)
SELECT doc_id, cast({_dk_bit_or} AS bigint) AS simhash FROM bits
"""

_dk_nd_bands = " UNION ALL ".join(
    f"SELECT doc_id, sh, {k} AS k, cast(sh // {1 << (8 * k)} AS bigint) % 256 AS byte"
    " FROM sims"
    for k in range(4)
)
_ORACLES["docs_simhash_neardup"] = f"""
WITH {_simhash32_sql("dk")},
bands AS ({_dk_nd_bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, a.sh AS ha, b.doc_id AS b_id, b.sh AS hb
  FROM bands a JOIN bands b
    ON a.k = b.k AND a.byte = b.byte AND a.doc_id < b.doc_id)
SELECT a_id, b_id, cast(bit_count(xor(ha, hb)) AS bigint) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 3
"""

_ORACLES["docs_ngram_jaccard"] = """
WITH w AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE doc_id < 60),
sizes AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT a_id, b_id,
       round(cast(i AS double) / cast(sa.sz + sb.sz - i AS double), 5) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE cast(i AS double) / cast(sa.sz + sb.sz - i AS double) >= 0.5
"""

_ORACLES["docs_neardup_verified"] = f"""
WITH sig AS ({_ORACLES["docs_minhash_sig"]}),
bands AS (
  SELECT doc_id, md5(cast(mh0 AS varchar) || ',' || cast(mh1 AS varchar)) AS b FROM sig
  UNION ALL
  SELECT doc_id, md5(cast(mh2 AS varchar) || ',' || cast(mh3 AS varchar)) AS b FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, c.doc_id AS b_id
  FROM bands a JOIN bands c ON a.b = c.b AND a.doc_id < c.doc_id),
w AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents),
sizes AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
inter AS (
  SELECT cand.a_id, cand.b_id, count(*) AS i
  FROM cand
  JOIN w wa ON wa.doc_id = cand.a_id
  JOIN w wb ON wb.doc_id = cand.b_id AND wb.word = wa.word
  GROUP BY 1, 2)
SELECT a_id, b_id,
       round(cast(i AS double) / cast(sa.sz + sb.sz - i AS double), 5) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE cast(i AS double) / cast(sa.sz + sb.sz - i AS double) >= 0.5
"""

# Fixpoint oracle (r4): a recursive CTE enumerates, per node, the
# labels of ALL reachable nodes (UNION dedup bounds the recursion) and
# takes the min — the true component minimum, matching the Spark side's
# iterate-to-fixpoint semantics at ANY diameter.  This replaces the r3
# fixed-round unroll, which replicated the Spark side's under-merge bug
# instead of catching it (VERDICT r3 wrong-#2).  Tuple count is
# O(Σ component_size²) — near-dup components are small near-cliques, so
# this is cheap at oracle scale and exact at any scale.
_ORACLES["docs_dedup_clusters"] = f"""
WITH RECURSIVE verified AS MATERIALIZED ({_ORACLES["docs_neardup_verified"]}),
p AS MATERIALIZED (SELECT a_id AS u, b_id AS v FROM verified
      UNION ALL
      SELECT b_id AS u, a_id AS v FROM verified),
reach(node, label) AS (
  SELECT DISTINCT u, u FROM p
  UNION
  SELECT p.u, r.label FROM p JOIN reach r ON r.node = p.v
)
SELECT node AS doc_id, min(label) AS cluster_id,
       node = min(label) AS is_canonical
FROM reach GROUP BY node
"""

# Queries with NO SQL-expressible oracle.  Empty since round 3: the one
# former member (emb_ann_ivf_trained) trains in integer-exact arithmetic
# now, so its k-means is SQL-reproducible (VERDICT r2 #5) — and even the
# ITERATIVE connected-components query carries a full oracle, now via a
# recursive-CTE fixpoint (docs_dedup_clusters).
NO_ORACLE = frozenset()

_ORACLES["emb_cosine_topk"] = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS emb
  FROM embeddings),
n AS (
  SELECT vec_id, emb,
         sqrt(list_reduce(list_transform(emb, x -> x * x), (a, b) -> a + b)) AS nrm
  FROM e),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, len(q.emb) + 1),
                                    i -> q.emb[i] * c.emb[i]),
                     (a, b) -> a + b) / (q.nrm * c.nrm) AS sim
  FROM n q, n c WHERE q.vec_id < 5 AND c.vec_id >= 5),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
  FROM pairs)
SELECT query_id, neighbor_id, cast(rnk AS bigint) AS rnk, round(sim, 5) AS sim_r
FROM ranked WHERE rnk <= 5
"""

# sign-LSH oracle: hyperplanes regenerated in SQL from md5 — identical
# to functions/similarity.hyperplane() by construction.
def _dk_plane_dot(j: int) -> str:
    hv = _dk_hash60(f"'{j}|' || (i - 1)")
    return (
        "list_reduce(list_transform(range(1, len(v) + 1), "
        f"i -> v[i] * ((({hv} % 2001) - 1000) / 1000.0)), (a, b) -> a + b)"
    )


def _dk_sig_family(t: int, n_planes: int) -> str:
    """Per-table signature: bits from plane family [t*n_planes, ...)."""
    return " + ".join(
        f"(CASE WHEN {_dk_plane_dot(t * n_planes + j)} >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    )


def _dk_lsh_base(n_planes: int, n_tables: int) -> str:
    sig_cols = ", ".join(
        f"{_dk_sig_family(t, n_planes)} AS s{t}" for t in range(n_tables)
    )
    return f"""
e AS (SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
      FROM embeddings),
sig AS (
  SELECT vec_id, v, {sig_cols},
         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
  FROM e)
"""


_ORACLES["emb_ann_lsh_topk"] = f"""
WITH {_dk_lsh_base(8, 2)},
pairs AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, len(q.v) + 1),
                                    i -> q.v[i] * c.v[i]),
                     (a, b) -> a + b) / (q.nrm * c.nrm) AS sim
  FROM sig q JOIN sig c ON (q.s0 = c.s0 OR q.s1 = c.s1)
  WHERE q.vec_id < 5 AND c.vec_id >= 5),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
  FROM pairs)
SELECT query_id, neighbor_id, cast(rnk AS bigint) AS rnk, round(sim, 5) AS sim_r
FROM ranked WHERE rnk <= 5
"""

_DK_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]),"
    " (x, y) -> x + y)"
)

_ORACLES["emb_ann_ivf_topk"] = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v,
             sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
      FROM e),
cent AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM n
         WHERE vec_id BETWEEN 5 AND 12),
corp_assign AS (
  SELECT neighbor_id, c, cn2, cell FROM (
    SELECT x.vec_id AS neighbor_id, x.v AS c, x.nrm AS cn2, cent.cell,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
               ORDER BY {_DK_DOT.format(a='x.v', b='cent.cv')} / (x.nrm * cent.cn) DESC,
                        cent.cell) AS crk
    FROM n x, cent WHERE x.vec_id >= 13)
  WHERE crk = 1),
qry_assign AS (
  SELECT query_id, q, qn, cell FROM (
    SELECT x.vec_id AS query_id, x.v AS q, x.nrm AS qn, cent.cell,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
               ORDER BY {_DK_DOT.format(a='x.v', b='cent.cv')} / (x.nrm * cent.cn) DESC,
                        cent.cell) AS crk
    FROM n x, cent WHERE x.vec_id < 5)
  WHERE crk <= 2),
pairs AS (
  SELECT DISTINCT query_id, neighbor_id,
         {_DK_DOT.format(a='q', b='c')} / (qn * cn2) AS sim
  FROM qry_assign JOIN corp_assign USING (cell)),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
  FROM pairs)
SELECT query_id, neighbor_id, cast(rnk AS bigint) AS rnk, round(sim, 5) AS sim_r
FROM ranked WHERE rnk <= 5
"""


def _ivf_trained_oracle_sql(
    k=8, n_iters=3, sample=512, dim=64, scale=1024, centroids_only=False
) -> str:
    """DuckDB re-derivation of train_centroids_exact + the ivf_topk
    assignment/rank (mirrors similarity.py exactly — see its docstring
    for why every training step is integer-exact and therefore
    bit-identical across engines).  Each Lloyd iteration is one
    assign/per-dim-mean/re-pack CTE chain; floor-division means and
    smallest-cell tie-breaks match numpy's floor_divide and argmin."""
    sqdist = (
        "list_reduce(list_transform(range(1, {d} + 1), "
        "i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])), (x, y) -> x + y)"
    ).format(d=dim)
    iters = []
    for it in range(1, n_iters + 1):
        prev = f"c{it - 1}"
        iters.append(f"""
a{it} AS (
  SELECT sid, qv, cell FROM (
    SELECT q.sid, q.qv, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.sid
               ORDER BY {sqdist} ASC, c.cell ASC) AS rk
    FROM q, {prev} c) WHERE rk = 1),
u{it} AS (
  SELECT cell, r.range AS dim, qv[r.range] AS val
  FROM a{it} CROSS JOIN range(1, {dim + 1}) r),
m{it} AS (
  SELECT cell, dim,
         CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT) AS cval
  FROM u{it} GROUP BY cell, dim),
cr{it} AS (SELECT cell, list(cval ORDER BY dim) AS cv FROM m{it} GROUP BY cell),
c{it} AS (
  SELECT cells.cell,
         COALESCE(cr{it}.cv,
                  (SELECT qv FROM q
                   WHERE sid = cells.cell % (SELECT count(*) FROM q) + 1)) AS cv
  FROM (SELECT r.range AS cell FROM range(0, {k}) r) cells
  LEFT JOIN cr{it} USING (cell))""")
    prefix = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v,
             sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
      FROM e),
samp AS (
  SELECT vec_id, v, sid FROM (
    SELECT vec_id, v,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS sid
    FROM e WHERE vec_id >= 5) WHERE sid <= {sample}),
q AS (SELECT sid,
             list_transform(v, x -> CAST(floor(x * {scale}.0 + 0.5) AS BIGINT)) AS qv
      FROM samp),
c0 AS (SELECT sid - 1 AS cell, qv AS cv FROM q WHERE sid <= {k}),
{",".join(iters)}"""
    if centroids_only:  # training prefix alone (centroid-parity tests)
        return prefix + f"\nSELECT cell, cv FROM c{n_iters} ORDER BY cell"
    return prefix + f""",
cent AS (
  SELECT cell,
         list_transform(cv, x -> CAST(x AS DOUBLE)) AS cv,
         sqrt(list_reduce(list_transform(cv, x -> CAST(x AS DOUBLE) * x),
                          (a, b) -> a + b)) AS cn
  FROM c{n_iters}),
corp_assign AS (
  SELECT neighbor_id, c, cn2, cell FROM (
    SELECT x.vec_id AS neighbor_id, x.v AS c, x.nrm AS cn2, cent.cell,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
               ORDER BY {_DK_DOT.format(a='x.v', b='cent.cv')} / (x.nrm * cent.cn) DESC,
                        cent.cell) AS crk
    FROM n x, cent WHERE x.vec_id >= 5)
  WHERE crk = 1),
qry_assign AS (
  SELECT query_id, q2, qn, cell FROM (
    SELECT x.vec_id AS query_id, x.v AS q2, x.nrm AS qn, cent.cell,
           ROW_NUMBER() OVER (PARTITION BY x.vec_id
               ORDER BY {_DK_DOT.format(a='x.v', b='cent.cv')} / (x.nrm * cent.cn) DESC,
                        cent.cell) AS crk
    FROM n x, cent WHERE x.vec_id < 5)
  WHERE crk <= 2),
pairs AS (
  SELECT DISTINCT query_id, neighbor_id,
         {_DK_DOT.format(a='q2', b='c')} / (qn * cn2) AS sim
  FROM qry_assign JOIN corp_assign USING (cell)),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
  FROM pairs)
SELECT query_id, neighbor_id, cast(rnk AS bigint) AS rnk, round(sim, 5) AS sim_r
FROM ranked WHERE rnk <= 5
"""


_ORACLES["emb_ann_ivf_trained"] = _ivf_trained_oracle_sql()
# distributed trainer: same integer-exact derivation with the sample cap
# lifted past the corpus size — training covers every corpus row, exactly
# like the Spark-side distributed Lloyd passes.  The cap only matches
# the fully-distributed trainer while the corpus fits under it, so the
# oracle GUARDS its own precondition (ADVICE r3): if the corpus ever
# outgrows the cap at a larger scale factor, the oracle errors loudly
# instead of silently training on a truncated sample and reporting a
# false mismatch.
_IVF_DIST_SAMPLE_CAP = 1_000_000
_ORACLES["emb_ann_ivf_distributed"] = _ivf_trained_oracle_sql(
    sample=_IVF_DIST_SAMPLE_CAP
).replace(
    "FROM ranked WHERE rnk <= 5",
    f"""FROM ranked WHERE rnk <= 5
  AND (SELECT CASE WHEN count(*) > {_IVF_DIST_SAMPLE_CAP}
       THEN error('emb_ann_ivf_distributed oracle: corpus exceeds the '
                  '{_IVF_DIST_SAMPLE_CAP}-row sample cap - raise '
                  '_IVF_DIST_SAMPLE_CAP so the oracle trains on every '
                  'corpus row like the distributed trainer does')
       ELSE 1 END FROM embeddings WHERE vec_id >= 5) = 1""",
)
assert "error(" in _ORACLES["emb_ann_ivf_distributed"]  # guard wired in

_ORACLES["emb_neardup_pairs"] = f"""
WITH {_dk_lsh_base(4, 2)},
flt AS (SELECT * FROM sig WHERE vec_id < 150),
pairs AS (
  SELECT DISTINCT a.vec_id AS a_id, c.vec_id AS b_id,
         list_reduce(list_transform(range(1, len(a.v) + 1),
                                    i -> a.v[i] * c.v[i]),
                     (a2, b2) -> a2 + b2) / (a.nrm * c.nrm) AS sim
  FROM flt a JOIN flt c
    ON (a.s0 = c.s0 OR a.s1 = c.s1) AND a.vec_id < c.vec_id)
SELECT a_id, b_id, round(sim, 5) AS sim_r
FROM pairs WHERE sim >= 0.3
"""

# same recursive-CTE fixpoint idiom as docs_dedup_clusters, over the
# embedding near-dup pair SQL (threshold column dropped — clustering
# needs only the pair list)
_ORACLES["emb_dedup_clusters"] = f"""
WITH RECURSIVE verified AS MATERIALIZED ({_ORACLES["emb_neardup_pairs"]}),
p AS MATERIALIZED (SELECT a_id AS u, b_id AS v FROM verified
      UNION ALL
      SELECT b_id AS u, a_id AS v FROM verified),
reach(node, label) AS (
  SELECT DISTINCT u, u FROM p
  UNION
  SELECT p.u, r.label FROM p JOIN reach r ON r.node = p.v
)
SELECT node AS vec_id, min(label) AS cluster_id,
       node = min(label) AS is_canonical
FROM reach GROUP BY node
"""

# byte features: documents text is ASCII by construction → utf-8 bytes
# == characters, so the mapInPandas stub is reproducible in SQL.
_ORACLES["multimodal_features"] = """
SELECT doc_id,
       cast(length(text) AS bigint) AS n_bytes,
       cast(ascii(substr(text, 1, 1)) AS bigint) AS first_byte,
       cast(ascii(substr(text, length(text), 1)) AS bigint) AS last_byte,
       array_to_string(list_transform(range(0, 4),
           i -> ascii(substr(text, cast(floor(i * length(text) / 4) AS int) + 1, 1))),
           ',') AS samples_str
FROM documents
"""

# frame j of size F over n bytes starts at (j*(n-F))//(n_frames-1),
# clamped at 0 — substr is 1-based in DuckDB; documents are ASCII so
# bytes == characters.
_ORACLES["multimodal_frame_sample"] = """
WITH m AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE doc_id < 200)
SELECT doc_id, cast(u.j AS bigint) AS frame_index,
       cast((u.j * greatest(0, n - 16)) // 2 AS bigint) AS frame_start,
       substr(text, cast((u.j * greatest(0, n - 16)) // 2 AS int) + 1, 16) AS frame_text
FROM m, LATERAL (SELECT unnest(range(3)) AS j) u
"""

_ORACLES["multimodal_resize"] = """
WITH m AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE doc_id < 200)
SELECT doc_id, 'text/plain' AS mime,
       CASE WHEN n = 0 THEN NULL
            ELSE array_to_string(
              list_transform(range(24),
                             i -> substr(text, cast((i * n) // 24 AS int) + 1, 1)),
              '')
       END AS resized_text
FROM m
"""

_ORACLES["emb_norm_stats"] = """
SELECT cast(label AS bigint) AS label, count(*) AS n,
       round(avg(sqrt(list_reduce(list_transform(embedding, x -> cast(x AS double) * x),
                                  (a, b) -> a + b))), 5) AS avg_norm
FROM embeddings GROUP BY label
"""

_ORACLES["docs_lang_id"] = """
WITH s AS (
  SELECT doc_id,
         length(regexp_replace(text, '[^aeiou]', '', 'g')) AS v,
         length(regexp_replace(text, '[^a-z]', '', 'g')) AS l
  FROM documents)
SELECT doc_id, round(cast(v AS double) / cast(l AS double), 4) AS vowel_ratio,
       CASE WHEN cast(v AS double) / cast(l AS double) >= 0.40 THEN 'vowel-heavy'
            WHEN cast(v AS double) / cast(l AS double) >= 0.30 THEN 'en-like'
            ELSE 'consonantal' END AS pred_lang
FROM s WHERE l > 0
"""

_ORACLES["docs_quality_score"] = """
WITH f AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         len(list_filter(string_split(text, ' '),
                         w -> w IN ('the', 'and', 'of', 'a', 'to', 'in'))) AS n_stop,
         length(replace(text, ' ', '')) AS n_lchars
  FROM documents)
SELECT doc_id, cast(n_words AS bigint) AS n_words,
       round(cast(n_stop AS double) / n_words, 5) AS stop_ratio,
       round(1.0 / (1.0 + exp(-(0.01 * n_words
                                + 2.0 * cast(n_stop AS double) / n_words
                                - 0.1 * abs(cast(n_lchars AS double) / n_words - 5.0)))),
             5) AS score
FROM f WHERE n_words > 0
"""

_ORACLES["docs_token_count"] = """
SELECT doc_id,
       cast(len(string_split(text, ' ')) AS bigint) AS n_ws,
       cast(len(regexp_extract_all(text, '[a-z0-9]+')) AS bigint) AS n_re,
       cast(length(regexp_replace(text, '[^a-z0-9]', '', 'g')) AS bigint) AS n_alnum
FROM documents
"""

_ORACLES["docs_winnow_fingerprint"] = f"""
WITH g AS (
  SELECT doc_id,
         list_transform(range(length(text) - 4),
                        i -> {_dk_hash60("substr(text, i + 1, 5)")} % 1000000) AS grams
  FROM documents WHERE length(text) >= 8),
w AS (
  SELECT doc_id,
         list_sort(list_distinct(
           list_transform(range(len(grams) - 3),
                          j -> list_min(grams[j + 1:j + 4])))) AS fps
  FROM g)
SELECT doc_id,
       cast(len(fps) AS bigint) AS n_fp,
       array_to_string(list_transform(fps[1:8], x -> cast(x AS varchar)), ',') AS fp_head
FROM w
"""

_ORACLES["docs_curation_pipeline"] = """
WITH base AS (
  SELECT doc_id, text,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rank
  FROM documents),
f AS (
  SELECT doc_id, dup_rank,
         len(string_split(text, ' ')) AS n_words,
         len(list_filter(string_split(text, ' '),
              w -> w IN ('the', 'and', 'of', 'a', 'to', 'in'))) AS n_stop,
         length(replace(text, ' ', '')) AS n_lchars,
         length(regexp_replace(text, '[^aeiou]', '', 'g')) AS v,
         length(regexp_replace(text, '[^a-z]', '', 'g')) AS l
  FROM base),
d AS (
  SELECT doc_id,
         dup_rank > 1 AS is_dup,
         cast(n_words AS bigint) AS n_words,
         round(1.0 / (1.0 + exp(-(0.01 * n_words
                  + 2.0 * cast(n_stop AS double) / n_words
                  - 0.1 * abs(cast(n_lchars AS double) / n_words - 5.0)))),
               5) AS score,
         -- exact integer threshold: score >= 0.5 iff logit >= 0 iff
         -- w^2 + 200*n_stop - 10*|n_lchars - 5w| >= 0 (see the Spark
         -- twin; retires the float-boundary risk class)
         (n_words * n_words + 200 * n_stop
          - 10 * abs(n_lchars - 5 * n_words) >= 0) AS score_ok,
         CASE WHEN cast(v AS double) / l >= 0.40 THEN 'vowel-heavy'
              WHEN cast(v AS double) / l >= 0.30 THEN 'en-like'
              ELSE 'consonantal' END AS pred_lang
  FROM f WHERE n_words > 0 AND l > 0)
SELECT doc_id, is_dup, n_words, score, pred_lang,
       (NOT is_dup AND score_ok AND pred_lang != 'consonantal'
        AND n_words BETWEEN 5 AND 100000) AS keep
FROM d
"""

_ORACLES["docs_seq_packing"] = """
WITH c AS (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off0
  FROM documents)
SELECT doc_id,
       cast(coalesce(off0, 0) AS bigint) AS global_offset,
       cast(floor(coalesce(off0, 0) / 512) AS bigint) AS pack_start,
       cast(floor((coalesce(off0, 0) + n_chars - 1) / 512) AS bigint) AS pack_end
FROM c
"""

_ORACLES["docs_seq_packing_sharded"] = """
WITH c AS (
  SELECT doc_id, n_chars,
         ((doc_id % 16) + 16) % 16 AS shard,
         sum(n_chars) OVER (PARTITION BY ((doc_id % 16) + 16) % 16
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off0
  FROM documents)
SELECT doc_id,
       cast(shard AS bigint) AS shard,
       cast(coalesce(off0, 0) AS bigint) AS shard_offset,
       cast(floor(coalesce(off0, 0) / 512) AS bigint) AS pack_start,
       cast(floor((coalesce(off0, 0) + n_chars - 1) / 512) AS bigint) AS pack_end
FROM c
"""

_ORACLES["docs_repetition_ratio"] = """
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         list_transform(range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS grams
  FROM s WHERE len(ws) >= 3)
SELECT doc_id,
       cast(len(grams) AS bigint) AS n_grams,
       cast(len(list_distinct(grams)) AS bigint) AS n_distinct,
       round(1.0 - cast(len(list_distinct(grams)) AS double)
                 / len(grams), 5) AS rep_ratio,
       (5 * len(list_distinct(grams)) < 4 * len(grams)) AS flag_repetitive
FROM g
"""

_ORACLES["docs_train_val_split"] = """
WITH a AS (
  SELECT doc_id, n_chars,
         cast(('0x' || substring(md5(cast(doc_id AS varchar)), 1, 6))::bigint
              AS bigint) % 100 AS h
  FROM documents)
SELECT doc_id,
       CASE WHEN h < 95 THEN 'train' ELSE 'val' END AS split,
       cast(h AS bigint) AS bucket_pct,
       cast(count(*) OVER (PARTITION BY h < 95) AS bigint) AS split_docs,
       cast(sum(n_chars) OVER (PARTITION BY h < 95) AS bigint) AS split_chars
FROM a
"""

_ORACLES["docs_length_histogram"] = """
SELECT length(bin(n_chars)) AS len_bucket,
       cast(count(*) AS bigint) AS n_docs,
       cast(sum(n_chars) AS bigint) AS total_chars,
       cast(min(n_chars) AS bigint) AS min_chars,
       cast(max(n_chars) AS bigint) AS max_chars,
       cast(sum(len(string_split(text, ' '))) AS bigint) AS total_words
FROM documents WHERE n_chars > 0
GROUP BY length(bin(n_chars))
"""

_ORACLES["docs_fingerprint"] = """
SELECT doc_id, md5(text) AS fp_full,
       md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp_head
FROM documents
"""

_ORACLES["docs_contamination"] = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id,
        list_distinct(list_transform(range(len(ws) - 4),
          i -> {_dk_hash60("array_to_string(ws[i + 1:i + 5], ' ')")})) AS grams
      FROM w WHERE len(ws) >= 5),
bench AS (SELECT DISTINCT unnest(grams) AS gh FROM g WHERE doc_id % 97 = 0),
cand AS (SELECT doc_id, unnest(grams) AS gh FROM g WHERE doc_id % 97 <> 0)
SELECT cand.doc_id, cast(count(*) AS bigint) AS shared_grams
FROM cand JOIN bench USING (gh)
GROUP BY cand.doc_id
"""

_ORACLES["docs_pii_scrub"] = _PII_SCRUB_SQL.replace(
    "COUNT_SSN", f"len(regexp_extract_all(text, '{_PII_SSN}'))"
).replace(
    "COUNT_EMAIL", f"len(regexp_extract_all(text, '{_PII_EMAIL}'))"
).replace("GFLAG", ", 'g'")


def oracles() -> dict[str, str]:
    return dict(_ORACLES)
