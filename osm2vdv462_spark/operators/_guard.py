"""Shared guard for broadcast-dimension collects.

Every broadcast spatial operator collects the DIMENSION side (polygons /
targets) to the driver to build its index. That is the correct pattern —
but passing a fact table by mistake must fail fast with a clear message,
not OOM the driver (VERDICT r1 plan audit)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# ~10M dimension rows x ~100B is a ~1GB driver build — past any sane
# broadcast side. Overridable for exotic drivers.
MAX_DIM_ROWS = int(os.environ.get("SPARK_GRAFT_MAX_DIM_ROWS", "10000000"))


# fast-path probe size: small enough that materializing PROBE_ROWS Row
# objects is harmless even under a 1g plain-session driver heap (~100k
# rows x ~100B), large enough that every sane dimension table fits and
# pays ONE Spark job instead of two (count probe + collect) — the probe
# job was a fixed ~0.2-0.4 s tax on every broadcast spatial operator
# call at bench scale (guide §1.2: remove unnecessary passes).
PROBE_ROWS = 100_000


def collect_dim_cols(df: DataFrame, cols: list[str], what: str) -> list:
    """collect_dim of ``df.select(*cols)`` as plain tuples — with a
    zero-job fast path when the builder attached the local rows it just
    materialized to CONSTRUCT the frame (``_graft_dim_rows``, e.g.
    datagen.stop_area_octagons): re-collecting a 25-row LocalRelation
    through a Spark job cost ~0.35 s of pure round-trip per operator
    call (round-6 measurement). Same data either way."""
    rows = getattr(df, "_graft_dim_rows", None)
    if rows is not None:
        idx = [df.columns.index(c) for c in cols]
        return [tuple(r[i] for i in idx) for r in rows]
    return [tuple(r) for r in collect_dim(df.select(*cols), what)]


def collect_dim(df: DataFrame, what: str) -> list:
    """collect() with a fail-fast cardinality guard. One LIMIT'd collect
    resolves the common case (dimension <= PROBE_ROWS) in a single job;
    only larger dimensions pay the count-probe-then-collect path, which
    checks the cap WITHOUT materializing 10M+1 Row objects on the
    driver — an oversized dimension must raise the clear error below,
    not OOM a 1g plain-session heap."""
    try:  # driver-held dimension (createDataFrame): the data already
        # lives in the plan, so the LIMIT probe only adds a job — plain
        # collect is the cheap local fast path and cannot OOM beyond
        # what the caller already materialized to BUILD the relation
        plan_cls = (
            df._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()
        )
    except Exception:
        plan_cls = None
    if plan_cls == "LocalRelation":
        rows = df.collect()
        if len(rows) > MAX_DIM_ROWS:
            raise ValueError(
                f"{what}: dimension side exceeds {MAX_DIM_ROWS} rows — "
                "this side is collected+broadcast; use the shuffle "
                "variant or raise SPARK_GRAFT_MAX_DIM_ROWS"
            )
        return rows
    rows = df.limit(PROBE_ROWS + 1).collect()
    if len(rows) <= PROBE_ROWS:
        return rows
    if df.limit(MAX_DIM_ROWS + 1).count() > MAX_DIM_ROWS:
        raise ValueError(
            f"{what}: dimension side exceeds {MAX_DIM_ROWS} rows — this "
            "side is collected+broadcast; use the shuffle variant "
            "(pip_join_shuffle) or raise SPARK_GRAFT_MAX_DIM_ROWS"
        )
    return df.collect()
