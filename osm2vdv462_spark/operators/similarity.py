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


def ivf_cell_expr(cents: np.ndarray, vcol: str) -> F.Column:
    """Argmax over centroid dot products, smallest cell id on ties:
    array_min over struct(-dot, cell). Pure codegen — no Python."""
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


def ivf_probe_expr(cents: np.ndarray, vcol: str, n_probe: int) -> F.Column:
    """n_probe best cells: sort struct(-dot, cell), take cell of first n."""
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
        return ivf_cell_expr(cents, vcol)

    def _probe_cells(vcol: str) -> F.Column:
        return ivf_probe_expr(cents, vcol, n_probe)

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


# ---- product quantization (IVF-PQ's compression half) ----------------------


def pq_codebooks(seed: int = 7, m: int = 8, k: int = 16, dsub: int = 8) -> np.ndarray:
    """Seeded random PQ codebooks, shape (m, k, dsub) — sf-independent,
    so they can be embedded as literals in ONE oracle string (the
    _ivf_centroids precedent). Random codebooks quantize worse than
    trained ones (tests assert that), but the encode/ADC machinery under
    test is identical."""
    return np.random.default_rng(seed).standard_normal((m, k, dsub))


def pq_train(
    mat: np.ndarray, m: int = 8, k: int = 16, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """Per-subspace L2 Lloyd k-means on a bounded sample (driver-side:
    a PQ codebook is m*k*dsub doubles — dimension-table-sized by
    design, like the IVF coarse quantizer)."""
    n, d = mat.shape
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub))
    for mi in range(m):
        sub = mat[:, mi * dsub : (mi + 1) * dsub]
        init = rng.choice(n, size=min(k, n), replace=False)
        cents = sub[np.sort(init)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                sel = sub[assign == c]
                if len(sel):
                    cents[c] = sel.mean(axis=0)
        books[mi] = cents
    return books


def _pq_dims(codebooks: np.ndarray) -> tuple[int, int, int]:
    m, k, dsub = codebooks.shape
    return m, k, dsub


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    *,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector into m uint codes (argmin L2 per subspace,
    smallest code on ties). All JVM-side: per subspace the distance to
    code j is the fixed-order expression -2*dot(s, C[m][j]) + |C[m][j]|^2
    (the |s|^2 term is constant across j and dropped), so the argmin is
    bit-reproducible against the SQL twin. Codes are 1/64th the bytes of
    the raw doubles — the compressed-scan payload of IVF-PQ. One
    projection per subspace keeps each codegen method small (the janino
    1g-heap discipline from pipeline/export.py)."""
    m, k, dsub = _pq_dims(codebooks)
    c2 = (codebooks**2).sum(axis=2)  # (m, k) exact-input literals
    out = vectors.select(vec_id, F.col(vec_col).cast("array<double>").alias("v"))
    for mi in range(m):
        s = F.slice(F.col("v"), mi * dsub + 1, dsub)
        cands = F.array(
            *[
                F.struct(
                    (
                        F.lit(-2.0)
                        * _dot(s, F.array(*[F.lit(float(x)) for x in codebooks[mi, j]]))
                        + F.lit(float(c2[mi, j]))
                    ).alias("d"),
                    F.lit(j).alias("code"),
                )
                for j in range(k)
            ]
        )
        out = out.withColumn(f"_c{mi}", F.array_min(cands)["code"])
    return out.select(
        vec_id,
        "v",
        F.array(*[F.col(f"_c{mi}") for mi in range(m)]).alias("codes"),
    )


def pq_adc_expr(codebooks: np.ndarray) -> F.Column:
    """ADC(q, codes) = sum_m |q_m - C[m][code_m]|^2 with the per-subspace
    terms summed in fixed order (engine-reproducible); expects columns
    ``q`` (array<double>) and ``codes`` (array<int>)."""
    m, kk, dsub = _pq_dims(codebooks)
    c2 = (codebooks**2).sum(axis=2)
    clit = F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(x)) for x in codebooks[mi, j]])
                    for j in range(kk)
                ]
            )
            for mi in range(m)
        ]
    )
    c2lit = F.array(
        *[F.array(*[F.lit(float(c2[mi, j])) for j in range(kk)]) for mi in range(m)]
    )
    adc = None
    for mi in range(m):
        qm = F.slice(F.col("q"), mi * dsub + 1, dsub)
        code1 = F.element_at("codes", mi + 1) + 1
        cvec = F.element_at(F.element_at(clit, mi + 1), code1)
        term = (
            _dot(qm, qm)
            - F.lit(2.0) * _dot(qm, cvec)
            + F.element_at(F.element_at(c2lit, mi + 1), code1)
        )
        adc = term if adc is None else adc + term
    return adc


def ivfpq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    *,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "q_id",
    q_col: str = "q_emb",
    k: int = 3,
    n_probe: int = 4,
) -> DataFrame:
    """The COMPOSED IVF-PQ index (Jegou et al., PAMI'11): coarse-cell
    pruning (ivf_cell_expr / ivf_probe_expr) over PQ codes with ADC
    rerank (pq_adc_expr) — the two halves this module gates separately
    (ivf_cosine_top3, pq_adc_top3), joined into the plan an actual
    10^12-vector deployment runs. The scan side carries (cell:int,
    codes:m bytes) — never raw vectors; queries explode into n_probe
    cells and the candidate join is a plain equi-join on the cell id.
    Each vector lives in exactly one cell, so multiprobe generates no
    duplicate (q, vec) pairs and no dedup pass is needed.

    Recall caveat vs flat PQ: a neighbor outside the probed cells is
    missed — that is the IVF trade; tests assert the composed result
    equals pq_adc_topk restricted to the probed-cell candidates."""
    cents = np.asarray(centroids, np.float64)
    enc = pq_encode(vectors, codebooks, vec_id=vec_id, vec_col=vec_col)
    enc = enc.withColumn("cell", ivf_cell_expr(cents, "v")).select(
        vec_id, "cell", "codes"
    )
    q = queries.select(
        q_id, F.col(q_col).cast("array<double>").alias("q")
    ).withColumn("cell", F.explode(ivf_probe_expr(cents, "q", n_probe)))
    cand = enc.join(q, "cell").filter(F.col(vec_id) != F.col(q_id))
    w = Window.partitionBy(q_id).orderBy(F.col("adc").asc(), F.col(vec_id))
    return (
        cand.withColumn("adc", pq_adc_expr(codebooks))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, vec_id, F.round("adc", 6).alias("adc_r6"), "rank")
    )


def pq_adc_topk(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    *,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "q_id",
    q_col: str = "q_emb",
    k: int = 3,
) -> DataFrame:
    """PQ asymmetric-distance top-k: queries stay exact, vectors are
    their m codes; ADC(q, v) = sum_m |q_m - C[m][code_m]|^2 with the
    per-subspace terms summed in fixed order (engine-reproducible).
    This is the compression half of IVF-PQ — at 100 TB the codes table
    is ~1/64th the scan bytes of raw embeddings and the codebook lookup
    is a literal (no join); compose with ivf_topk's cell pruning for
    the full index. Output: (q_id, vec_id, adc_r6, rank)."""
    enc = pq_encode(vectors, codebooks, vec_id=vec_id, vec_col=vec_col).select(
        vec_id, "codes"
    )
    q = queries.select(q_id, F.col(q_col).cast("array<double>").alias("q"))
    j = enc.crossJoin(F.broadcast(q)).filter(F.col(vec_id) != F.col(q_id))
    w = Window.partitionBy(q_id).orderBy(F.col("adc").asc(), F.col(vec_id))
    return (
        j.withColumn("adc", pq_adc_expr(codebooks))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, vec_id, F.round("adc", 6).alias("adc_r6"), "rank")
    )
