"""Near-duplicate detection for training-data pipelines: MinHash+LSH and
SimHash, built for 100 TB document tables.

Plan shapes (all shuffle-on-short-keys, never on document text):
* MinHash+LSH: shingle -> 64 minhashes (vectorized numpy, universal
  hashing) -> band into b buckets of r rows -> equi-join on
  (band, band_hash) -> exact Jaccard verify on candidate pairs. The
  shuffle key is a 16-byte band hash; each document's text crosses the
  wire only for final verification of candidate pairs.
* SimHash: 64-bit signature; near-dups = Hamming distance <= k found by
  banding the signature into k+1 chunks (pigeonhole: any pair within
  distance k shares at least one exact chunk).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

_MERSENNE = (1 << 61) - 1


def _hash_params(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, n_hashes, dtype=np.int64)
    return a, b


def _shingle_hashes(text: str, shingle: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < shingle:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + shingle]) for i in range(len(toks) - shingle + 1)]
    import zlib

    return np.unique(
        np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.int64)
    )


def minhash_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>) — vectorized minhash over word shingles."""
    a, b = _hash_params(n_hashes, seed)

    def _sig(batches):
        for pdf in batches:
            ids, sigs = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sh = _shingle_hashes(text or "", shingle)
                # universal hash: (a*x + b) mod p, min over shingles
                vals = (a[None, :] * sh[:, None] + b[None, :]) % _MERSENNE
                sigs.append(vals.min(axis=0).tolist())
                ids.append(did)
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    return docs.select(id_col, text_col).mapInPandas(
        _sig, f"{id_col} long, sig array<long>"
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Candidate generation via LSH banding; exact word-shingle Jaccard
    verification on candidates only.
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(
        docs, id_col=id_col, text_col=text_col, n_hashes=n_hashes,
        shingle=shingle, seed=seed,
    )
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "band_hash"),
    )
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .distinct()
    )
    texts = docs.select(
        F.col(id_col), F.array_distinct(F.split(text_col, " ")).alias("toks")
    )
    ta = texts.select(F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a"))
    tb = texts.select(F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = F.size("toks_a") + F.size("toks_b") - F.size(
        F.array_intersect("toks_a", "toks_b")
    )
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash64(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash long): sign of per-bit weighted token-hash sums."""

    def _sh(batches):
        import zlib

        for pdf in batches:
            ids, hs = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").split()
                acc = np.zeros(64, np.int64)
                for tok in toks:
                    h = np.uint64(
                        zlib.crc32(tok.encode())
                        | (zlib.crc32(tok.encode()[::-1]) << 32)
                    )
                    bits = ((h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                        np.int64
                    )
                    acc += 2 * bits - 1
                v = int("".join("1" if x > 0 else "0" for x in acc), 2)
                hs.append(v - (1 << 64) if v >= 1 << 63 else v)
                ids.append(did)
            yield pd.DataFrame({id_col: ids, "simhash": hs})

    return docs.select(id_col, text_col).mapInPandas(
        _sh, f"{id_col} long, simhash long"
    )


def simhash_near_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming via chunk banding
    (k+1 16-bit chunks => any pair within distance k collides on one)."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    sh = simhash64(docs, id_col=id_col, text_col=text_col)
    chunks = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("chunk_no", "chunk"),
    )
    cand = (
        chunks.alias("x")
        .join(
            chunks.alias("y"),
            (F.col("x.chunk_no") == F.col("y.chunk_no"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )
