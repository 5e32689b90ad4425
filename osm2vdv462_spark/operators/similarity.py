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


# ------------------------------------------------------------------- IVF


def kmeans_centroids(
    mat: np.ndarray, n_cells: int, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Deterministic Lloyd k-means (numpy, seeded init) -> L2-normalized
    centroids. Runs driver-side on a bounded sample — the coarse
    quantizer of an IVF index is dimension-table-sized by design."""
    rng = np.random.default_rng(seed)
    init = rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)
    cents = mat[np.sort(init)].copy()
    for _ in range(iters):
        sims = mat @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            sel = mat[assign == c]
            if len(sel):
                cents[c] = sel.mean(axis=0)
        norms = np.linalg.norm(cents, axis=1, keepdims=True)
        cents = cents / np.where(norms == 0, 1.0, norms)
    return cents


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "q_id",
    q_col: str = "q_emb",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    sample_limit: int = 100_000,
    seed: int = 5,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer (driver-side on a
    bounded sample), JVM-side cell assignment (argmax of dot products
    against centroid literals — codegen-friendly, no Python workers),
    queries probe their n_probe nearest cells, exact cosine rerank on
    the probed inverted lists. Same output schema as cosine_topk_exact.

    The scale shape: the fact table shuffles on an int cell id (or not
    at all — assignment is a map); centroids are O(n_cells x dim).
    Pass ``centroids`` to pin a pre-trained quantizer (e.g. for
    cross-engine reproducibility); default trains k-means on a sample.
    """
    if centroids is not None:
        cents = np.asarray(centroids, np.float64)
    else:
        sample = np.array(
            [
                r[0]
                for r in vectors.select(
                    F.col(vec_col).cast("array<double>")
                ).limit(sample_limit).collect()
            ],
            dtype=np.float64,
        )
        cents = kmeans_centroids(sample, n_cells, seed=seed)

    def _cell_expr(vcol: str) -> F.Column:
        # argmax over centroid dot products, smallest cell id on ties:
        # array_min over struct(-dot, cell)
        return F.array_min(
            F.array(
                *[
                    F.struct(
                        (-_dot(
                            F.col(vcol),
                            F.array(*[F.lit(float(x)) for x in cents[c]]),
                        )).alias("negdot"),
                        F.lit(c).alias("cell"),
                    )
                    for c in range(len(cents))
                ]
            )
        )["cell"]

    def _probe_cells(vcol: str) -> F.Column:
        # n_probe best cells: sort struct(-dot, cell), take cell of first n
        arr = F.array_sort(
            F.array(
                *[
                    F.struct(
                        (-_dot(
                            F.col(vcol),
                            F.array(*[F.lit(float(x)) for x in cents[c]]),
                        )).alias("negdot"),
                        F.lit(c).alias("cell"),
                    )
                    for c in range(len(cents))
                ]
            )
        )
        return F.transform(F.slice(arr, 1, n_probe), lambda s: s["cell"])

    v = vectors.select(
        vec_id, F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("cell", _cell_expr("v"))
    q = queries.select(
        q_id, F.col(q_col).cast("array<double>").alias("q")
    ).withColumn("cell", F.explode(_probe_cells("q")))
    cand = v.join(q, "cell").filter(F.col(vec_id) != F.col(q_id))
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
