"""Incremental materialized-view maintenance over the snapshot table.

The 100 TB dashboard problem: the tile-density rollup (res, cell,
n_images) over a 10^12-row image table must stay fresh as crawls append,
but a full recompute rescans the corpus. This module maintains the
rollup INCREMENTALLY from snaptable changelog reads:

    refresh cost = O(appended rows) + O(affected rollup keys)

Mechanics per refresh:
1. read the view's ``source_version`` watermark from its snapshot props;
2. ``read_table(source, since=watermark)`` — ONLY the appended files
   (pure manifest diff, zero IO for planning);
3. partial-agg the delta to (res, cell, delta_n);
4. merge with the current view values for exactly the affected keys and
   ``upsert_table`` them (equality-delete file + new rows, O(changed));
5. the same commit advances the watermark in props — refresh is
   ATOMIC-with-watermark, so a crashed refresh never double-counts and
   a replayed refresh is a no-op (watermark already current).

A ``replace``/``delete``/``upsert`` on the source breaks pure-append
changelog semantics; ``read_table(since=...)`` raises there and the
caller must full-recompute (``init_tile_view`` again) — surfaced, not
silently wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import snaptable as st


def _tile_counts(images: DataFrame, levels: tuple[int, ...]) -> DataFrame:
    from ..operators.jvm_pip import cell_expr

    stacked = images.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("res"),
                        cell_expr(F.col("lon"), F.col("lat"), r).alias("cell"),
                    )
                    for r in levels
                ]
            )
        ).alias("rc")
    )
    return (
        stacked.groupBy(F.col("rc.res").alias("res"), F.col("rc.cell").alias("cell"))
        .agg(F.count("*").alias("n_images"))
    )


def init_tile_view(
    spark: SparkSession,
    source_table: str,
    view_table: str,
    *,
    levels: tuple[int, ...] = (8, 10, 12),
) -> int:
    """Full (re)compute of the rollup at the source's current version;
    records the watermark + levels in the view's snapshot props."""
    src_v = st.current_version(source_table)
    counts = _tile_counts(st.read_table(spark, source_table), levels)
    return st.create_table(
        counts, view_table, cluster_by="cell", files_hint=4,
        props={"source_version": src_v, "levels": list(levels)},
    )


def refresh_tile_view(
    spark: SparkSession, source_table: str, view_table: str
) -> dict:
    """Advance the view to the source's current version incrementally.
    Returns {refreshed, from_version, to_version, keys_upserted}."""
    props = st.table_props(view_table)
    levels = tuple(props["levels"])
    last = int(props["source_version"])
    cur = st.current_version(source_table)
    if cur == last:
        return {"refreshed": False, "from_version": last,
                "to_version": cur, "keys_upserted": 0}
    delta_rows = st.read_table(spark, source_table, since=last)
    delta = _tile_counts(delta_rows, levels).withColumnRenamed(
        "n_images", "delta_n"
    )
    current = st.read_table(spark, view_table)
    merged = (
        delta.join(current, ["res", "cell"], "left")
        .select(
            "res",
            "cell",
            (F.coalesce(F.col("n_images"), F.lit(0)) + F.col("delta_n"))
            .alias("n_images"),
        )
    )
    # upsert only the affected keys; the watermark advances in the SAME
    # atomic commit, so replays are no-ops and crashes can't double-count
    n = merged.count()
    st.upsert_table(
        spark, merged, view_table, ["res", "cell"],
        props={"source_version": cur},
    )
    return {"refreshed": True, "from_version": last,
            "to_version": cur, "keys_upserted": n}
