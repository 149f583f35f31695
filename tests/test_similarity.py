"""ANN quality tests (VERDICT r1 next-#3/#8): recall vs brute force for
multi-table LSH and trained-IVF, plane-scaling math, determinism.

Recall is asserted on PLANTED near-duplicates (a perturbed copy of each
corpus vector, cos ≈ 0.99): on uniform random vectors the exact top-k
has no angular structure, so sign-LSH recall there measures nothing —
per-plane collision at θ≈66° is ~0.63, i.e. ~2.5% per 8-bit table by
construction, for random and exhaustive search alike."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dlt_spark.functions.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucket_topk,
    recommended_planes,
    train_centroids,
)

SF_DIR = os.environ.get("ENTRY_TEST_SF", "/root/testdata/sf0.001")
EMB = os.path.join(SF_DIR, "embeddings.parquet")


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(EMB).where(F.col("vec_id") >= 10).cache()


@pytest.fixture(scope="module")
def planted(spark, corpus):
    """50 queries: corpus vectors with deterministic ±10% multiplicative
    noise — cos(query, source) ≈ 0.99, everything else far."""
    return (
        corpus.where(F.col("vec_id") % 4 == 2)
        .limit(50)
        .select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.col("vec_id").alias("src_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                * (
                    1.0
                    + 0.1
                    * (F.pmod(F.col("vec_id") * 31 + i, F.lit(7)) - 3).cast("double")
                    / 3.0
                ),
            ).alias("embedding"),
        )
        .cache()
    )


def _found(approx, planted_pairs) -> float:
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    return sum(1 for p in planted_pairs if p in a) / len(planted_pairs)


@pytest.fixture(scope="module")
def planted_pairs(planted):
    return [(r["vec_id"], r["src_id"]) for r in planted.select("vec_id", "src_id").collect()]


def test_recommended_planes_scaling():
    # expected bucket ≈ target ⇒ planes grow log2 with corpus
    assert recommended_planes(10_000, 10_000) == 4      # floor
    assert recommended_planes(10**7, 10_000) == 10      # 1024 buckets
    assert recommended_planes(10**10, 10_000) == 20     # the design point
    assert recommended_planes(10**30, 10_000) == 30     # clamp


def test_brute_force_finds_planted(spark, corpus, planted, planted_pairs):
    exact = brute_force_topk(planted, corpus, k=5)
    assert _found(exact, planted_pairs) == 1.0


def test_lsh_recall_vs_brute_force(spark, corpus, planted, planted_pairs):
    """n_planes=8 (256-way key space) with 4 OR-ed tables recovers ≥90%
    of what brute force finds (=100% of planted pairs); more tables
    never hurt."""
    lsh4 = lsh_bucket_topk(planted, corpus, dim=64, k=5, n_planes=8, n_tables=4)
    r4 = _found(lsh4, planted_pairs)
    lsh1 = lsh_bucket_topk(planted, corpus, dim=64, k=5, n_planes=8, n_tables=1)
    r1 = _found(lsh1, planted_pairs)
    assert r4 >= 0.9, f"4-table recall {r4}"
    assert r4 >= r1, f"OR-recall must not hurt: {r4} < {r1}"


def test_ivf_trained_recall_and_determinism(spark, corpus, planted, planted_pairs):
    """Trained k-means cells: a ±10% perturbed query lands in its
    source's cell, so nprobe=2 over k=8 trained cells recovers ≥90% of
    planted pairs; training is deterministic across invocations
    (hash-sampled init, fixed Lloyd order)."""
    cents_a = train_centroids(corpus, dim=64, k=8, n_iters=3, sample=512)
    cents_b = train_centroids(corpus, dim=64, k=8, n_iters=3, sample=512)
    assert sorted(map(tuple, cents_a.collect())) == sorted(
        map(tuple, cents_b.collect())
    )
    approx = ivf_topk(planted, corpus, centroids=cents_a, k=5, nprobe=2)
    r = _found(approx, planted_pairs)
    assert r >= 0.9, f"trained-IVF recall {r}"


def test_no_driver_side_row_probe():
    """VERDICT r1 #3: dim must be explicit — no first-row collect on the
    data path (code only; the docstring may discuss the rule)."""
    import ast
    import inspect

    from dlt_spark.functions import similarity

    tree = ast.parse(inspect.getsource(similarity))
    probes = [
        n
        for n in ast.walk(tree)
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Attribute)
        and n.func.attr in ("first", "head", "take")
    ]
    assert not probes


def test_ivf_trained_exact_matches_duckdb_and_recalls(
    spark, corpus, planted, planted_pairs
):
    """VERDICT r2 #5: the exact-integer trainer produces centroids a SQL
    engine re-derives BIT-IDENTICALLY (md5 sample, quantized vectors,
    int distances, floor-div means) — this is what upgraded the trained-
    IVF entry query from rows-only to a full value-hash oracle.  Recall
    and determinism must hold like the float trainer's."""
    import duckdb

    from dlt_spark.entry_queries import _ivf_trained_oracle_sql
    from dlt_spark.functions.similarity import train_centroids_exact

    cents_a = train_centroids_exact(corpus, k=8, n_iters=3, sample=512)
    cents_b = train_centroids_exact(corpus, k=8, n_iters=3, sample=512)
    got = sorted((r["vec_id"], tuple(r["embedding"])) for r in cents_a.collect())
    assert got == sorted(
        (r["vec_id"], tuple(r["embedding"])) for r in cents_b.collect()
    )

    con = duckdb.connect()
    pdf = corpus.toPandas()
    pdf["embedding"] = pdf["embedding"].map(list)
    con.register("corpus_pd", pdf)
    # the oracle trains on vec_id >= 5; give it ALL fixture rows by
    # shifting ids up so none are excluded as queries
    con.execute(
        "CREATE VIEW embeddings AS SELECT vec_id + 5 AS vec_id, "
        "CAST(embedding AS DOUBLE[]) AS embedding FROM corpus_pd"
    )
    duck = con.execute(
        _ivf_trained_oracle_sql(centroids_only=True)
    ).fetchall()
    duck_cents = sorted((c, tuple(float(x) for x in v)) for c, v in duck)
    spark_shift = sorted(
        (r["vec_id"], tuple(r["embedding"]))
        for r in train_centroids_exact(
            corpus.withColumn("vec_id", F.col("vec_id") + 5), k=8, n_iters=3,
            sample=512,
        ).collect()
    )
    assert duck_cents == spark_shift, "centroid drift between engines"

    approx = ivf_topk(planted, corpus, centroids=cents_a, k=5, nprobe=2)
    assert _found(approx, planted_pairs) >= 0.9

def test_distributed_trainer_bitwise_matches_exact_and_partitioning(
    spark, corpus, planted, planted_pairs
):
    """The fully distributed trainer (every Lloyd pass a Spark job,
    int64-exact sums) must be BIT-IDENTICAL to the driver-side exact
    trainer given the same rows (sample ≥ corpus), and independent of
    partitioning — integer sums are commutative, so parallelism can't
    change the result.  Recall must hold like the other trainers'."""
    from dlt_spark.functions.similarity import (
        train_centroids_distributed,
        train_centroids_exact,
    )

    def key(df):
        return sorted((r["vec_id"], tuple(r["embedding"])) for r in df.collect())

    exact = key(train_centroids_exact(corpus, k=8, n_iters=3, sample=10_000))
    dist = key(train_centroids_distributed(corpus, k=8, n_iters=3))
    assert dist == exact, "distributed trainer drifted from exact trainer"
    dist13 = key(
        train_centroids_distributed(corpus.repartition(13), k=8, n_iters=3)
    )
    dist3 = key(
        train_centroids_distributed(corpus.repartition(3), k=8, n_iters=3)
    )
    assert dist13 == dist3 == dist, "result depends on partitioning"

    cents = train_centroids_distributed(corpus, k=8, n_iters=3)
    approx = ivf_topk(planted, corpus, centroids=cents, k=5, nprobe=2)
    assert _found(approx, planted_pairs) >= 0.9


def test_distributed_trainer_arrow_assignment_bitwise(spark, corpus):
    """literal_cap=0 forces the Arrow pandas-UDF assignment (broadcast
    centroid matrix, the k·dim>cap regime) — must be bit-identical to
    the Catalyst-literal path: same int64 arithmetic, same
    first-minimum tie rule."""
    from dlt_spark.functions.similarity import train_centroids_distributed

    def key(df):
        return sorted((r["vec_id"], tuple(r["embedding"])) for r in df.collect())

    lit = key(train_centroids_distributed(corpus, k=8, n_iters=3))
    arrow = key(
        train_centroids_distributed(corpus, k=8, n_iters=3, literal_cap=0)
    )
    assert arrow == lit, "Arrow assignment drifted from Catalyst literal"
