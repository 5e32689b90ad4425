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


def register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {k: v[0] for k, v in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {k: v[1] for k, v in REGISTRY.items() if v[1] is not None}


_loaded = False


def _load_all():
    global _loaded
    if _loaded:
        return
    from . import (  # noqa: F401
        extract_queries,
        geo_queries,
        media_queries,
        pipeline_queries,
        relational,
        source_queries,
        text_queries,
    )

    _loaded = True
