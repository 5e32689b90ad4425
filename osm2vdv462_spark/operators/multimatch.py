"""Aho-Corasick multi-pattern matching — the blocklist/keyword-scan
primitive of a content-filtering pipeline (profanity lists, licence
strings, PII trigger words, contamination canaries).

The reference has no multi-pattern scan (its tag predicates are exact
key lookups — pipeline.lua tag dispatch); this operator is part of the
LLM-training-pipeline mandate: a single-pass scan of the corpus against
a fixed pattern set, where the automaton — NOT the number of patterns —
bounds per-byte work.

Spark-first shape: the DFA is built once on the driver (size = total
pattern bytes x 256, a few KB for real blocklists up to ~1e5 patterns),
shipped in the task closure (broadcast-equivalent for this size), and
the scan is VECTORIZED ACROSS DOCUMENTS inside each Arrow batch: the
only Python-level loop is over character positions of the batch matrix
(max doc length), each step a numpy gather `state = delta[state, col]`
over every document in the batch at once — the same
vectorize-across-rows trick the PBF varint decoder uses
(sources/pbf.py::decode_packed_varints). All-occurrence semantics
(every end position, every pattern, overlaps included) via cumulative
output-bitmask links.
"""

from __future__ import annotations

import numpy as np

ALPHABET = 256


def build_dfa(patterns: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Dense Aho-Corasick DFA over the byte alphabet.

    Returns (delta, outmask): delta is int32 [n_states, 256] with the
    goto-or-fail transition already resolved (a true DFA — no fail
    chasing at scan time); outmask is int64 [n_states], bit p set iff
    pattern p ends at this state OR at any state on its fail chain
    (cumulative output links), so a single lookup per step reports
    every overlapping match. Patterns must be non-empty and <= 63.
    """
    if not patterns or any(not p for p in patterns):
        raise ValueError("patterns must be non-empty byte strings")
    if len(patterns) > 63:
        raise ValueError("outmask packs pattern ids into an int64 bitmask")
    # trie
    goto: list[dict[int, int]] = [{}]
    out: list[int] = [0]
    for pid, pat in enumerate(patterns):
        s = 0
        for b in pat:
            if b not in goto[s]:
                goto.append({})
                out.append(0)
                goto[s][b] = len(goto) - 1
            s = goto[s][b]
        out[s] |= 1 << pid
    n = len(goto)
    fail = np.zeros(n, dtype=np.int32)
    delta = np.zeros((n, ALPHABET), dtype=np.int32)
    outmask = np.array(out, dtype=np.int64)
    # BFS: resolve fail links and densify transitions level by level
    from collections import deque

    q = deque()
    for b, s in goto[0].items():
        delta[0, b] = s
        q.append(s)
    while q:
        s = q.popleft()
        outmask[s] |= outmask[fail[s]]
        for b, t in goto[s].items():
            fail[t] = delta[fail[s], b]
            q.append(t)
        # densify: unspecified bytes follow the (already dense) fail row
        row = delta[fail[s]].copy()
        for b, t in goto[s].items():
            row[b] = t
        delta[s] = row
    return delta, outmask


def count_batch(
    texts: list[str], delta: np.ndarray, outmask: np.ndarray, n_patterns: int
) -> np.ndarray:
    """Per-document all-occurrence counts, int64 [n_docs, n_patterns].

    One automaton step per character POSITION of the padded batch
    matrix; every document advances simultaneously via a numpy gather.
    Padding byte 0 must not appear in any pattern (it parks finished
    documents on the root state, contributing nothing).
    """
    if not texts:
        return np.zeros((0, n_patterns), dtype=np.int64)
    bufs = [t.encode("utf-8") for t in texts]
    width = max(len(b) for b in bufs) or 1
    mat = np.zeros((len(bufs), width), dtype=np.uint8)
    for r, b in enumerate(bufs):
        mat[r, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    state = np.zeros(len(bufs), dtype=np.int32)
    counts = np.zeros((len(bufs), n_patterns), dtype=np.int64)
    for j in range(width):
        state = delta[state, mat[:, j]]
        om = outmask[state]
        if om.any():
            for p in range(n_patterns):
                counts[:, p] += (om >> p) & 1
    return counts
