"""Image-table and near-dup/ANN queries (training-data pipeline ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup, similarity
from ..pipeline import images as im
from . import register


@register(
    "image_integrity",
    """
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           true AS pixel_ok, true AS caption_ok, true AS phash_ok
    FROM events
    """,
)
def image_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input_hint per-row invariant as a query: every synthesized
    image must decode to pixels identical to the reference generator
    (PSNR=inf for lossless PNG), with caption equality and phash
    recompute equality. The oracle asserts ALL rows pass."""
    imgs = im.images_df(spark, sf_dir)
    v = im.with_decode_verify(imgs)
    return v.select("image_id", "pixel_ok", "caption_ok", "phash_ok")


@register("image_thumb_phash", None)
def image_thumb_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> box-resize -> thumbnail phash (multimodal feature
    extraction plumbing; rows-only check, exactness in tests)."""
    imgs = im.images_df(spark, sf_dir).limit(200)
    return im.with_resized_phash(imgs, 8, 8).select("image_id", "thumb_phash")


@register("minhash_dup_pairs", None)
def minhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs over documents + injected duplicates
    (1 appended word). Non-SQL-expressible: exactness vs brute-force
    Jaccard in tests/test_dedup_similarity.py."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
    )
    return dedup.minhash_lsh_pairs(docs.unionByName(dups), threshold=0.7).orderBy(
        "id_a", "id_b"
    )


@register("simhash_near_pairs", None)
def simhash_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 8) via chunk banding."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
    )
    return dedup.simhash_near_pairs(docs.unionByName(dups), max_hamming=8).orderBy(
        "id_a", "id_b"
    )


@register("ann_cosine_top3", None)
def ann_cosine_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-3 cosine neighbors (the scale path;
    exact baseline embedding_top1 has a full SQL oracle)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    return similarity.cosine_topk_lsh(
        emb, queries, k=3, n_planes=4, multiprobe=4
    ).orderBy("q_id", "rank")


@register("embedding_near_dup", None)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded hyperplane LSH
    candidates + exact cosine >= 0.98, over embeddings plus injected
    noisy copies of vec_id < 10 (recall tested in
    tests/test_dedup_similarity.py)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    noisy = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 300000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * 1.0001 + 0.00001
        ).alias("embedding"),
    )
    return similarity.cosine_near_dup_pairs(
        emb.unionByName(noisy), threshold=0.98
    ).orderBy("id_a", "id_b")
