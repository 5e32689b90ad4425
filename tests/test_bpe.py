"""Distributed BPE training (operators/bpe.py) vs a from-scratch serial
reference implementation on the same frequency dict: the learned merge
lists must be IDENTICAL, and distributed encoding must agree with
serial encoding."""

import pytest

from osm2vdv462_spark.operators import bpe


def _ref_bpe(freqs: dict, k: int, min_count: int = 1):
    """Serial reference: Sennrich-style BPE over a word-frequency dict,
    same tie-break (count desc, then pair lexicographic asc)."""
    vocab = {tuple(list(w) + [bpe.END]): c for w, c in freqs.items()}
    merges = []
    for _ in range(k):
        pc = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + c
        if not pc:
            break
        pair, n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append(pair)
        a, b = pair
        nv = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def test_merges_match_serial_reference(spark, corpus):
    freqs_df = bpe.word_freqs(corpus)
    got = bpe.train_bpe(freqs_df, 30)
    freqs = {r["word"]: r["count"] for r in freqs_df.collect()}
    want = _ref_bpe(freqs, 30)
    assert got == want
    assert len(got) == 30  # corpus is big enough to sustain 30 merges


def test_min_count_stops_early(spark):
    tiny = spark.createDataFrame(
        [(1, "aa aa bb")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(bpe.word_freqs(tiny), 50, min_count=2)
    # only pairs occurring >=2 times survive; the trainer must stop on
    # its own well before 50 merges
    assert 0 < len(merges) < 50


def test_distributed_encode_matches_serial(spark, corpus):
    sample = corpus.limit(50)
    merges = bpe.train_bpe(bpe.word_freqs(sample), 15)
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe.encode_tokens(sample, merges).collect()
    }
    for r in sample.collect():
        want = sum(
            len(bpe.encode_word(w, merges))
            for w in str(r["text"]).lower().split()
        )
        assert got[r["doc_id"]] == want


def test_merges_compress(spark, corpus):
    """Learned merges must actually reduce token counts vs char-level."""
    sample = corpus.limit(50)
    merges = bpe.train_bpe(bpe.word_freqs(sample), 15)
    with_m = bpe.encode_tokens(sample, merges)
    without = bpe.encode_tokens(sample, [])
    a = with_m.agg({"n_tokens": "sum"}).first()[0]
    b = without.agg({"n_tokens": "sum"}).first()[0]
    assert a < b
