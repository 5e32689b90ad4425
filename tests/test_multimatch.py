"""Aho-Corasick DFA unit tests: overlap semantics, fail-link outputs,
and the vectorized batch scanner vs a naive per-position reference."""

import numpy as np
import pytest

from osm2vdv462_spark.operators import multimatch


def naive_counts(text: str, pats: list[str]) -> list[int]:
    b = text.encode("utf-8")
    out = []
    for p in pats:
        pb = p.encode("utf-8")
        out.append(
            sum(
                1
                for i in range(len(b) - len(pb) + 1)
                if b[i : i + len(pb)] == pb
            )
        )
    return out


@pytest.mark.parametrize(
    "pats,texts",
    [
        # the classic fail-link diagram: 'hers' must also fire 'he'
        # and (via the output link) 'she' -> 'he'
        (["he", "she", "his", "hers"], ["ushers", "shehishers", "xxx"]),
        # self-overlapping pattern: 'aa' in 'aaaa' = 3 (all positions)
        (["aa", "aaa"], ["aaaa", "a", ""]),
        # suffix-embedded: 'spark' fires 'park' and 'ark' too
        (["spark", "park", "ark", "a a"], ["spark a a a park", "sparkpark"]),
    ],
)
def test_batch_matches_naive(pats, texts):
    delta, outmask = multimatch.build_dfa([p.encode() for p in pats])
    got = multimatch.count_batch(texts, delta, outmask, len(pats))
    exp = np.array([naive_counts(t, pats) for t in texts], dtype=np.int64)
    assert (got == exp).all(), (got, exp)


def test_empty_pattern_rejected():
    with pytest.raises(ValueError):
        multimatch.build_dfa([b"ok", b""])


def test_empty_batch():
    delta, outmask = multimatch.build_dfa([b"x"])
    assert multimatch.count_batch([], delta, outmask, 1).shape == (0, 1)
