"""Similarity search over embedding columns (north-star, SURVEY.md §7 stage 7).

Vectors are plain ``array<float>`` columns; all math is built-in
``zip_with``/``aggregate`` expressions (JVM-side, codegen) — no UDFs.

Two tiers:

- **brute-force top-k** — exact; broadcast the (small) query set against
  the corpus, so the corpus scan stays pipelined with no shuffle of the
  big side. The per-query top-k goes through a ranking window partitioned
  by query id (map-side WindowGroupLimit keeps ≤ k rows per query per
  task before the shuffle).
- **sign-LSH bucketed** — approximate; random-hyperplane sign bits bucket
  the corpus once, queries probe only their own bucket (equi-join on the
  bucket key). Recall tunable via bits/bands; candidate verification is
  exact cosine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    """array<float> → array<double> (do all math in double: deterministic
    across engines and immune to float accumulation error)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (sequential left fold —
    deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors per query (self-matches excluded).

    Output: (query_id, neighbor_id, cosine_sim, rk). Ties broken by
    neighbor id — fully deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", cosine(F.col("_qv"), F.col("_cv")))
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, tiny)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def sign_lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Pack sign(plane·vec) bits into a long bucket key."""
    acc = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(w)) for w in plane])
        positive = dot(vec, plane_col) > 0
        acc = acc + F.when(positive, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
    return acc


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 8,
    tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table sign-LSH candidates, verified with
    exact cosine. Same output shape as :func:`brute_force_topk`.

    ``tables`` independent hyperplane sets (the banding trick): a
    neighbor is a candidate iff it shares the full ``bits``-bit bucket in
    at least one table — recall ≈ 1-(1-p^bits)^tables with
    p = 1 - θ/π. Per table the bucket key prunes candidates ~2^bits-fold;
    the candidate join is an equi-join on (table, bucket). Tune
    bits↑/tables↓ for throughput, bits↓/tables↑ for recall.
    """
    all_planes = [
        _hyperplanes(dim, bits, seed + 1000 * t) for t in range(tables)
    ]

    def bucketed(df: DataFrame, idname: str, vecname: str) -> DataFrame:
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    sign_lsh_bucket(F.col(vecname), all_planes[t]).alias("bkt"),
                )
                for t in range(tables)
            ]
        )
        return df.select(
            idname, vecname, F.explode(buckets).alias("_b")
        ).select(idname, vecname, "_b.tbl", "_b.bkt")

    q = bucketed(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv")
        ),
        "query_id",
        "_qv",
    )
    c = bucketed(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("_cv")
        ),
        "neighbor_id",
        "_cv",
    )
    scored = (
        c.join(F.broadcast(q), ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_qv", "_cv")
        .dropDuplicates(["query_id", "neighbor_id"])  # candidate ∈ >1 table
        .withColumn("cosine_sim", cosine(F.col("_qv"), F.col("_cv")))
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


def near_duplicate_embeddings(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).

    Self-join on the sign-LSH bucket: near-identical vectors almost surely
    share every sign bit, so candidates collapse to within-bucket pairs.
    """
    planes = _hyperplanes(dim, bits, seed)
    c = corpus.select(
        F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_bucket", sign_lsh_bucket(F.col("_v"), planes))
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(
            b,
            (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .withColumn("cosine_sim", cosine(F.col("a._v"), F.col("b._v")))
        .filter(F.col("cosine_sim") >= F.lit(threshold))
        .select(
            F.col("a._id").cast("long").alias("id_a"),
            F.col("b._id").cast("long").alias("id_b"),
            F.round("cosine_sim", 6).alias("cosine_sim"),
        )
    )
