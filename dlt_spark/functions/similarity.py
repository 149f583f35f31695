"""Embedding similarity search over `array<float>` columns.

Two strategies (the entry queries expose both with DuckDB oracles):

- ``brute_force_topk`` — exact cosine top-k via cross join; the baseline
  and the correctness oracle for ANN variants.  Cost O(|Q|·|C|·d); fine
  for |Q| small, prohibitive at corpus scale.
- ``lsh_bucket_topk`` — the scale path: sign-LSH with ``n_planes``
  deterministic pseudo-random hyperplanes (hash-derived, so both Spark
  and any oracle engine regenerate them bit-identically).  Vectors join
  on their bucket signature, so the candidate join is hash-partitioned
  by bucket instead of a cross product: cost O(|Q|·|C|/2^n_planes·d)
  expected, shuffle keyed and broadcastable.  Recall < 1 by design;
  raise recall with multiple tables (``n_tables``) ORed together.

All arithmetic folds left-to-right in float64 (cast first), which makes
results bit-stable across engines — the property the driver's
value-hash comparison needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rnk, sim).

    Plan shape: corpus norms precomputed once, cross join (broadcast the
    query side — it is small by construction), window rank per query.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q")
    ).withColumn("qn", l2_norm(F.col("q")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c")
    ).withColumn("cn", l2_norm(F.col("c")))
    pairs = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("q"), F.col("c")) / (F.col("qn") * F.col("cn"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.col("rnk").cast("long").alias("rnk"), "sim")
    )


def hyperplane(plane_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component h[d] ∈ [-1, 1):
    derived from md5, reproducible in any engine (see entry oracle)."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"{plane_idx}|{d}".encode()).hexdigest()[:15], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return out


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id = bits of sign(dot(vec, plane_j)), j ascending."""
    sig = F.lit(0)
    for j, plane in enumerate(planes):
        pl = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(vec, pl) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = sig + bit
    return sig.cast("int")


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates share the sign-LSH bucket.

    The join is an equi-join on the bucket signature → hash shuffle on
    a low-cardinality key (2^n_planes buckets), each bucket ~|C|/2^n
    candidates.  At corpus scale add more planes (smaller buckets) or
    more tables (higher recall)."""
    from pyspark.sql import Window

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = [hyperplane(j, dim) for j in range(n_planes)]

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q")
    )
    q = q.withColumn("b", lsh_signature(F.col("q"), planes)).withColumn(
        "qn", l2_norm(F.col("q"))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c")
    )
    c = c.withColumn("b", lsh_signature(F.col("c"), planes)).withColumn(
        "cn", l2_norm(F.col("c"))
    )
    pairs = q.join(c, "b").select(
        "query_id",
        "neighbor_id",
        (dot(F.col("q"), F.col("c")) / (F.col("qn") * F.col("cn"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.col("rnk").cast("long").alias("rnk"), "sim")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus vectors are assigned to their
    nearest centroid's cell; a query probes its ``nprobe`` closest cells
    and ranks exactly within the candidates.

    Plan shape at scale: centroid assignment is a broadcast join against
    the (small) centroid set; the candidate join is an equi-join on
    ``cell`` — hash-partitioned, never a cross product.  Cell recall is
    tunable via nprobe.  Centroid *training* (k-means) is orthogonal —
    any deterministic centroid set works; callers supply it (tests use a
    fixed corpus sample, production would use a sampled k-means fit).
    """
    from pyspark.sql import Window

    c_named = centroids.select(
        F.col(id_col).alias("cell"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))

    def assign(df: DataFrame, name: str, top: int) -> DataFrame:
        v = df.select(
            F.col(id_col).alias(name), _as_double(F.col(vec_col)).alias("v")
        ).withColumn("vn", l2_norm(F.col("v")))
        sims = v.join(F.broadcast(c_named)).select(
            name, "v", "vn", "cell",
            (dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cn"))).alias("csim"),
        )
        w = Window.partitionBy(name).orderBy(F.col("csim").desc(), F.col("cell"))
        return (
            sims.withColumn("crk", F.row_number().over(w))
            .where(F.col("crk") <= top)
            .drop("csim", "crk")
        )

    corp = assign(corpus, "neighbor_id", 1)
    qrys = assign(queries, "query_id", nprobe)

    pairs = qrys.join(
        corp.select("neighbor_id", F.col("v").alias("c"), F.col("vn").alias("cn2"), "cell"),
        "cell",
    ).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("v"), F.col("c")) / (F.col("vn") * F.col("cn2"))).alias("sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.col("rnk").cast("long").alias("rnk"), "sim")
    )


def near_dup_pairs_cosine(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing:
    (a_id, b_id, sim) with a_id < b_id and sim >= threshold.  Exactness
    within a bucket; cross-bucket near-dups are missed by design
    (bounded by the LSH collision probability at the threshold)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = [hyperplane(j, dim) for j in range(n_planes)]
    v = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    v = v.withColumn("b", lsh_signature(F.col("v"), planes)).withColumn(
        "n", l2_norm(F.col("v"))
    )
    a = v.select(
        F.col("id").alias("a_id"), F.col("v").alias("va"),
        F.col("b"), F.col("n").alias("na"),
    )
    c = v.select(
        F.col("id").alias("b_id"), F.col("v").alias("vb"),
        F.col("b"), F.col("n").alias("nb"),
    )
    return (
        a.join(c, "b")
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
