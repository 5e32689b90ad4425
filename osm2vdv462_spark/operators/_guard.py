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


def collect_dim(df: DataFrame, what: str) -> list:
    """collect() with a fail-fast cardinality guard: probes cardinality
    with a LIMIT'd count first (cheap, no driver materialization), and
    only collects once the cap check passes — an oversized dimension
    must raise the clear error below, not OOM the driver building 10M+1
    Row objects under a 1g plain-session heap."""
    if df.limit(MAX_DIM_ROWS + 1).count() > MAX_DIM_ROWS:
        raise ValueError(
            f"{what}: dimension side exceeds {MAX_DIM_ROWS} rows — this "
            "side is collected+broadcast; use the shuffle variant "
            "(pip_join_shuffle) or raise SPARK_GRAFT_MAX_DIM_ROWS"
        )
    return df.collect()
