"""Similarity search over embedding columns: exact brute-force cosine
top-k (the baseline) and a hyperplane-LSH bucketed ANN (the scale path).

The ANN plan: H seeded random hyperplanes -> sign bits -> bucket id;
vectors shuffle on the SHORT bucket key; queries probe their bucket plus
``multiprobe`` single-bit-flipped neighbors; exact cosine inside the
candidate set only. Recall tunes with (n_planes, multiprobe) and is
measured against the exact operator in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda s, v: s + v)


def cosine_topk_exact(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "q_id",
    q_col: str = "q_emb",
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k per query (JVM-side arithmetic; queries
    broadcast). Output: (q_id, vec_id, cos_sim, rank)."""
    v = vectors.select(vec_id, F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(q_id, F.col(q_col).cast("array<double>").alias("q"))
    j = v.crossJoin(F.broadcast(q)).filter(F.col(vec_id) != F.col(q_id))
    sim = _dot(F.col("v"), F.col("q")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("q"), F.col("q")))
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(vec_id))
    return (
        j.withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, vec_id, F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def _bucket_udf(planes: np.ndarray, col_name: str):
    @F.pandas_udf("long")
    def _b(embs: pd.Series) -> pd.Series:
        m = np.array(embs.tolist(), dtype=np.float64)
        bits = (m @ planes.T) > 0
        out = np.zeros(len(m), np.int64)
        for i in range(planes.shape[0]):
            out = (out << 1) | bits[:, i]
        return pd.Series(out)

    return _b(F.col(col_name))


def cosine_near_dup_pairs(
    vectors: DataFrame,
    *,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int | None = 10,
    bands: int = 2,
    seed: int = 11,
    target_bucket: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= t).

    Banded hyperplane LSH: ``bands`` independent plane sets; vectors
    colliding in ANY band become candidates (near-identical vectors
    collide in all bands with overwhelming probability), then exact
    cosine verification. Shuffle key = (band, bucket), never the vector.
    ``n_planes=None`` sizes buckets to the table (~target_bucket
    vectors each at any corpus size).
    """
    if n_planes is None:
        n = vectors.count()
        n_planes = max(4, int(np.ceil(np.log2(max(n, 2) / target_bucket))))
    rng = np.random.default_rng(seed)
    planes = [rng.standard_normal((n_planes, dim)) for _ in range(bands)]

    v = vectors.select(vec_id, F.col(vec_col).cast("array<double>").alias("v"))
    for b in range(bands):
        v = v.withColumn(f"_b{b}", _bucket_udf(planes[b], "v"))
    banded = v.select(
        vec_id,
        "v",
        F.posexplode(F.array(*[F.col(f"_b{b}") for b in range(bands)])).alias(
            "band", "bucket"
        ),
    )
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col(f"x.{vec_id}") < F.col(f"y.{vec_id}")),
        )
        .select(
            F.col(f"x.{vec_id}").alias("id_a"),
            F.col(f"y.{vec_id}").alias("id_b"),
            F.col("x.v").alias("va"),
            F.col("y.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    return (
        cand.withColumn("cos_sim", F.round(sim, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "q_id",
    q_col: str = "q_emb",
    k: int = 5,
    dim: int = 64,
    n_planes: int | None = 8,
    multiprobe: int = 2,
    seed: int = 7,
    target_bucket: int = 64,
) -> DataFrame:
    """ANN top-k: hyperplane-LSH buckets + multiprobe, exact cosine on
    candidates. Same output schema as cosine_topk_exact (rank may pick
    different vectors where recall < 1 — measured in tests).

    ``n_planes=None`` sizes the bucket count to the TABLE (VERDICT r1):
    2^n_planes ~ N / target_bucket, so buckets hold ~target_bucket
    vectors at any corpus size instead of blowing up with N."""
    if n_planes is None:
        n = vectors.count()
        n_planes = max(4, int(np.ceil(np.log2(max(n, 2) / target_bucket))))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    v = vectors.select(
        vec_id, F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("bucket", _bucket_udf(planes, "v"))
    q = queries.select(
        q_id, F.col(q_col).cast("array<double>").alias("q")
    ).withColumn("bucket0", _bucket_udf(planes, "q"))
    # multiprobe: the query's own bucket + single-bit flips of the
    # `multiprobe` lowest-order planes
    probes = F.array(
        F.col("bucket0"),
        *[F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(multiprobe)],
    )
    qp = q.select(q_id, "q", F.explode(probes).alias("bucket"))
    cand = v.join(qp, "bucket").filter(F.col(vec_id) != F.col(q_id))
    sim = _dot(F.col("v"), F.col("q")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("q"), F.col("q")))
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(vec_id))
    return (
        cand.withColumn("cos_sim", sim)
        .dropDuplicates([q_id, vec_id])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, vec_id, F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )
