"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) a
DuckDB oracle SQL string over the driver's parquet views.

The driver's correctness gate (see repo __spark_entry__.py) runs both and
compares row count + schema + order-insensitive value hash, so column
names/types must line up exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}

# Physical-plan variants and derivative reports whose SEMANTICS are
# already hash-gated by a sibling REGISTRY row. The driver's correctness
# gate runs at most GATE_BUDGET queries (CORRECTNESS_r02: exactly the
# first 50 of 55 registered, in registration order — a count cap), so
# these run only through the local pytest mirror
# (tests/test_oracle_parity.py), which checks them against the SAME
# DuckDB oracles.
EXTRA_REGISTRY: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {}

GATE_BUDGET = 50


def register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def register_extra(name: str, oracle: str | None):
    def deco(fn):
        EXTRA_REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The gate registry, hard-capped at GATE_BUDGET entries (insertion
    order — the same order the driver truncates at). Never raises: an
    over-budget registry must degrade to the first 50, not kill the
    whole gate; tests/test_oracle_parity.py asserts the exact count so
    over-registration still fails CI."""
    _load_all()
    out = {}
    for k, v in REGISTRY.items():
        if len(out) >= GATE_BUDGET:
            break
        out[k] = v[0]
    return out


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {k: v[1] for k, v in REGISTRY.items() if v[1] is not None}


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {k: v[0] for k, v in EXTRA_REGISTRY.items()}


def extra_oracle_sql() -> dict[str, str]:
    _load_all()
    return {k: v[1] for k, v in EXTRA_REGISTRY.items() if v[1] is not None}


_loaded = False


def _load_all():
    global _loaded
    if _loaded:
        return
    from . import (  # noqa: F401
        extract_queries,
        geo_queries,
        graph_queries,
        media_queries,
        mining_queries,
        pipeline_queries,
        relational,
        sketch_queries,
        source_queries,
        temporal_queries,
        text_queries,
        vision_queries,
    )

    _loaded = True
