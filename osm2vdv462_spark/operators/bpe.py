"""Distributed BPE tokenizer training (the Sennrich et al. 2016
algorithm, public), Spark-shaped the way industrial trainers are:

1. ONE corpus pass builds the word-frequency dict — `(word, count)` via
   a partial-agg groupBy. By Heaps' law the distinct-word table is tiny
   relative to the corpus (100 TB of text -> ~10^7 rows), so this is
   the only stage that touches the data.
2. K merge rounds run on that small cached table: adjacent-pair counts
   weighted by word frequency (posexplode + partial-agg sum), argmax
   pair (deterministic tie-break: count desc, then pair lexicographic),
   then the merge applied to every word's symbol array in an
   Arrow-batched UDF. Each round is a bounded shuffle over vocab-sized
   rows — never over the corpus.

Corpus text never re-enters the loop, so the trainer's cost model is
`O(corpus)` once plus `O(K * vocab)` — the property that makes BPE
training feasible at all at web scale.

Verification (tests/test_bpe.py): the merge list must be IDENTICAL to a
from-scratch serial reference implementation run on the same collected
frequency dict, and encoding with the learned merges must round-trip.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

END = "</w>"  # end-of-word marker (standard BPE)


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, count): lowercase whitespace words, one corpus
    pass, partial-agg combine. The ONLY stage that reads the corpus."""
    return (
        docs.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """One merge round's kernel: adjacent-symbol pair frequencies
    weighted by word count — (a, b, n). Vocab-sized shuffle with
    map-side combine; this is the piece a SQL engine can replicate
    (the `bpe_pair_counts` oracle), the iteration around it cannot."""
    return (
        words.select(
            F.posexplode(
                F.slice(F.col("symbols"), 1, F.size("symbols") - 1)
            ).alias("i", "a"),
            F.col("symbols"),
            F.col("count"),
        )
        .select(
            F.col("a"),
            F.element_at(F.col("symbols"), F.col("i") + 2).alias("b"),
            F.col("count"),
        )
        .groupBy("a", "b")
        .agg(F.sum("count").alias("n"))
    )


def symbolize(freqs: DataFrame) -> DataFrame:
    """(word, count) -> (symbols array, count): chars + end-of-word."""
    return freqs.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("symbols"),
        F.col("count").cast("long").alias("count"),
    )


def _merge_udf(a: str, b: str):
    """Arrow-batched merge of one adjacent symbol pair in every word."""

    def _apply(batches):
        for pdf in batches:
            out = []
            for syms, cnt in zip(pdf["symbols"], pdf["count"]):
                syms = list(syms)
                i, merged = 0, []
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                out.append((merged, int(cnt)))
            yield pd.DataFrame(out, columns=["symbols", "count"])

    return _apply


def train_bpe(
    freqs: DataFrame, num_merges: int, *, min_count: int = 1
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from a (word, count) frequency
    table. Returns the ordered merge list [(left, right), ...].

    Each round: pair counts via posexplode over (sym[i], sym[i+1]) —
    a vocab-sized shuffle with map-side combine — argmax with the
    deterministic tie-break (count desc, pair asc), merge applied
    distributively, vocab re-cached. Stops early when no pair reaches
    ``min_count``."""
    words = symbolize(freqs).localCheckpoint()

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = pair_counts(words)
        top = pairs.orderBy(
            F.col("n").desc(), F.col("a").asc(), F.col("b").asc()
        ).limit(1).collect()
        if not top or top[0]["n"] < min_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.mapInPandas(
            _merge_udf(a, b), "symbols array<string>, count long"
        ).localCheckpoint()  # cut lineage: K rounds must not stack plans
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a learned merge list to one word (driver-side helper; the
    distributed encoder is `encode_tokens`)."""
    syms = list(word) + [END]
    for a, b in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_tokens(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Corpus -> (doc_id, n_tokens) under the learned vocabulary: one
    Arrow-batched pass; the merge list rides to executors as a closure
    (KBs — the model is broadcast-sized by construction)."""

    def _enc(batches):
        for pdf in batches:
            out = []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                n = 0
                for w in str(text).lower().split():
                    n += len(encode_word(w, merges))
                out.append((did, n))
            yield pd.DataFrame(out, columns=["doc_id", "n_tokens"])

    return docs.mapInPandas(_enc, "doc_id long, n_tokens long")
