"""Text analysis operators: n-gram language ID and winnowing document
fingerprints (task brief: text-analysis primitives for training-data
pipelines).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# tiny public-knowledge character-trigram marker profiles; a real system
# would train these — the OPERATOR (profile scoring, argmax, vectorized
# batching) is what the engine provides
_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", " an", "and", "ing", " of", "ion", " to", "ed "),
    "de": ("der", "die", " un", "und", "ein", "sch", "ich", " de", "en ", "cht"),
    "fr": (" le", "les", " de", "de ", "ent", " et", "que", "ion", " la", "eur"),
    "es": (" de", "de ", " la", "la ", "os ", " el", "que", "ión", "ent", "ado"),
    "it": (" di", "di ", " il", "che", "la ", "to ", " co", "re ", "one", "ato"),
}


def lang_id_ngram(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, lang_pred, lang_score): argmax of marker-trigram hit rates.

    Deterministic, vectorized per batch; 'und' (undetermined) when no
    profile scores above zero.
    """

    def _lid(batches):
        for pdf in batches:
            ids, preds, scores = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                s = f" {(text or '').lower()} "
                n = max(len(s) - 2, 1)
                best_lang, best = "und", 0.0
                for lang, grams in _PROFILES.items():
                    hits = sum(s.count(g) for g in grams)
                    score = hits / n
                    if score > best:
                        best_lang, best = lang, score
                ids.append(did)
                preds.append(best_lang)
                scores.append(round(best * 1000, 4))
            yield pd.DataFrame(
                {id_col: ids, "lang_pred": preds, "lang_score": scores}
            )

    return docs.select(id_col, text_col).mapInPandas(
        _lid, f"{id_col} long, lang_pred string, lang_score double"
    )


def winnow_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 6,
) -> DataFrame:
    """(id, fingerprints array<long>): winnowing (Schleimer et al. 2003) —
    rolling k-gram hashes, minimum per sliding window, deduped. Two
    documents sharing a substring of length >= k + window - 1 share at
    least one fingerprint (the plagiarism/dedup guarantee)."""

    def _fp(batches):
        for pdf in batches:
            ids, fps = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                s = (text or "").lower()
                if len(s) < k:
                    ids.append(did)
                    fps.append([])
                    continue
                hs = np.array(
                    [zlib.crc32(s[i : i + k].encode()) for i in range(len(s) - k + 1)],
                    dtype=np.int64,
                )
                if len(hs) >= window:
                    # sliding-window minimum via stride trick
                    sw = np.lib.stride_tricks.sliding_window_view(hs, window)
                    mins = sw.min(axis=1)
                else:
                    mins = np.array([hs.min()])
                ids.append(did)
                fps.append(sorted(set(int(x) for x in mins)))
            yield pd.DataFrame({id_col: ids, "fingerprints": fps})

    return docs.select(id_col, text_col).mapInPandas(
        _fp, f"{id_col} long, fingerprints array<long>"
    )


def fingerprint_match_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 6,
    min_shared: int = 3,
) -> DataFrame:
    """Candidate containment/overlap pairs: explode fingerprints,
    equi-join on the hash (short shuffle key), count shared prints."""
    fp = winnow_fingerprints(docs, id_col=id_col, text_col=text_col, k=k, window=window)
    ex = fp.select(F.col(id_col), F.explode("fingerprints").alias("fp"))
    pairs = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.countDistinct("a.fp").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    return pairs
