"""Deterministic synthetic change-event generator (Spark-native).

Stands in for the reference's chain-API bundle source
(loader/collector/bundles_collector.go:46-142): an append-only log of
insert/update/delete events over tokenized training sequences.  Every
attribute of an event is a pure hash function of its ``commit_seq`` (and
the seed), so the log is byte-identical across runs, partition counts
and parallelism levels — the property the whole test/bench harness rests
on.  Generation is ``spark.range`` + built-in column expressions: no
Python on data, no driver-side loops, scales linearly to 10^10 events.

Realism knobs (SURVEY §5 fixture requirements):
- hot-key skew: doc_id drawn via u^alpha warp → Zipf-ish head keys;
- duplicate delivery: a tail fraction of arrivals repeats an earlier
  commit_seq verbatim (at-least-once source semantics);
- out-of-order arrival: commit_seq is a bijective scramble of arrival
  order (XOR permutation), so log-file order ≠ commit order;
- mixed payload versions: v1 native array<int>, v2 CSV string,
  v3 JSON-wrapped — the schema-evolution surface (SURVEY §2.3 E3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_VOCAB = 50_000
# Sized like real pre-tokenized training sequences (BASELINE.json
# input_hint): avg ~288 tokens ≈ 1.2 KB/event → 10^10 events ≈ 12 TB.
MIN_TOKENS, MAX_TOKENS = 64, 512


def _h(col: Column, salt: str, seed: int) -> Column:
    """Deterministic non-negative 63-bit hash of (col, salt, seed)."""
    return F.abs(F.xxhash64(col, F.lit(salt), F.lit(seed)))


def _unit(col: Column, salt: str, seed: int) -> Column:
    """Deterministic uniform double in [0, 1)."""
    return (_h(col, salt, seed) % 1_000_000) / 1_000_000.0


def generate_change_log(
    spark: SparkSession,
    n_events: int,
    n_keys: int | None = None,
    seed: int = 42,
    dup_frac: float = 0.05,
    skew: float = 3.0,
    version_mix: tuple[float, float, float] = (1.0, 0.0, 0.0),
    delete_frac: float = 0.10,
    update_frac: float = 0.35,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return a change-event DataFrame matching CHANGE_EVENT_SCHEMA.

    ``n_events`` distinct commit_seq values in [0, n_events); an extra
    ``dup_frac`` of arrivals duplicate earlier seqs.  ``version_mix``
    gives the (v1, v2, v3) payload-version proportions.
    """
    if n_keys is None:
        n_keys = max(16, n_events // 8)
    n_arrivals = int(n_events * (1.0 + dup_frac))

    df = spark.range(0, n_arrivals, 1, num_partitions or spark.sparkContext.defaultParallelism)

    # Arrival → commit_seq: tail arrivals replay an earlier seq
    # (duplicate delivery); head arrivals map via an XOR scramble so the
    # log arrives out of commit order.  XOR with a sub-range mask is a
    # bijection on [0, n) when applied only where the result stays < n.
    mask = 0
    m = n_events
    while m > 1:
        mask = (mask << 1) | 1
        m >>= 2
    scrambled = F.col("id").bitwiseXOR(F.lit(mask))
    seq_head = F.when(scrambled < n_events, scrambled).otherwise(F.col("id"))
    seq = F.when(F.col("id") < n_events, seq_head).otherwise(
        _h(F.col("id"), "dup", seed) % n_events
    )
    df = df.select(seq.cast("long").alias("commit_seq"))

    # Everything below is f(commit_seq, seed) — duplicates are verbatim.
    s = F.col("commit_seq")
    key_u = _unit(s, "key", seed)
    key_idx = F.floor(F.lit(float(n_keys)) * F.pow(key_u, F.lit(skew))).cast("long")
    doc_id = F.format_string("doc_%010d", key_idx)

    op_u = _unit(s, "op", seed)
    op = (
        F.when(op_u < delete_frac, F.lit("D"))
        .when(op_u < delete_frac + update_frac, F.lit("U"))
        .otherwise(F.lit("I"))
    )

    n_tok = (MIN_TOKENS + (_h(s, "len", seed) % (MAX_TOKENS - MIN_TOKENS))).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda i: (F.abs(F.xxhash64(s, i, F.lit(seed))) % TOKEN_VOCAB).cast("int"),
    )

    v1, v2, _v3 = version_mix
    ver_u = _unit(s, "ver", seed)
    version = (
        F.when(ver_u < v1, F.lit(1)).when(ver_u < v1 + v2, F.lit(2)).otherwise(F.lit(3))
    ).cast("int")

    # v2: comma-joined ints; v3: JSON {"ids": [...]}.  Deletes carry no
    # payload at all (tombstones).
    payload = F.when(
        version == 2, F.array_join(tokens.cast("array<string>"), ",")
    ).when(version == 3, F.to_json(F.struct(tokens.alias("ids"))))

    is_delete = op == "D"
    source = F.concat(F.lit("src_"), (_h(s, "src", seed) % 4).cast("string"))
    extracted_at = F.timestamp_seconds(F.lit(1_700_000_000) + s % 86_400)

    return df.select(
        s.alias("commit_seq"),
        doc_id.alias("doc_id"),
        op.alias("op"),
        F.when(~is_delete & (version == 1), tokens).alias("tokens"),
        F.when(~is_delete, payload).alias("payload"),
        version.alias("payload_version"),
        F.when(~is_delete, source).alias("source"),
        extracted_at.alias("extracted_at"),
    )
