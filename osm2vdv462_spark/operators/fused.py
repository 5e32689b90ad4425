"""Fused PIP + kNN assignment: one map pass over the point table.

At 10^12 rows the dominant cost is scanning + moving the point table;
running the polygon-membership join and the nearest-target join as two
jobs reads and ships every point twice. This operator broadcasts BOTH
small indexes (cell->polygon CSR, cell->target CSR) and resolves each
batch once: point -> (containing polygon id | null, nearest target id,
distance). Zero shuffle, one Arrow crossing.

This is the flagship plan shape for the BASELINE.json metric.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType

from ..geo import cells as _cells
from ..geo import kernel as _kernel
from .knn import TargetIndex, _resolve_batch_k1, build_target_index
from .spatial_join import PolyIndex, build_poly_index


def pip_knn_assign(
    points_df: DataFrame,
    polys_df: DataFrame,
    targets_df: DataFrame,
    *,
    point_keep: list[str],
    lon: str = "lon",
    lat: str = "lat",
    poly_id: str = "relation_id",
    poly_wkb: str = "geom",
    target_id: str = "quay_id",
    target_lon: str = "lon",
    target_lat: str = "lat",
    poly_res: int = 12,
    target_res: int = 8,
    max_rings: int = 3,
) -> DataFrame:
    """Left-join semantics on the polygon (NULL when the point is in no
    polygon), inner on the nearest target (always exists if targets
    nonempty). Output: point_keep..., <poly_id>, <target_id>, dist_m."""
    spark = points_df.sparkSession
    from ._guard import collect_dim_cols

    prows = collect_dim_cols(polys_df, [poly_id, poly_wkb], "polygons")
    pidx = build_poly_index(prows, poly_res)
    trows = collect_dim_cols(
        targets_df, [target_id, target_lon, target_lat], "targets"
    )
    tidx = build_target_index(trows, target_res)
    bc = spark.sparkContext.broadcast((pidx, tidx))

    in_schema = points_df.select(*point_keep, lon, lat).schema
    pid_field = polys_df.select(poly_id).schema[0]
    tid_field = targets_df.select(target_id).schema[0]
    out_schema = StructType(
        [f for f in in_schema if f.name in point_keep]
        + [
            StructField(poly_id, pid_field.dataType),
            StructField(target_id, tid_field.dataType),
            StructField("dist_m", DoubleType()),
        ]
    )
    keep = list(point_keep)

    def _run(batches):
        # Arrow-native (mapInArrow): no pandas materialization — input
        # columns come out zero-copy as numpy, output built directly as
        # a RecordBatch. ~2-3x less per-batch overhead than mapInPandas.
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_out = to_arrow_schema(out_schema)
        pidx_, tidx_ = bc.value
        pid_arr = np.asarray(pidx_.poly_ids)
        out_names = keep + [poly_id, target_id, "dist_m"]
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            cols = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}
            lons = cols[lon].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            lats = cols[lat].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            # --- PIP phase (grouped exact test per candidate polygon)
            pc = _cells.cell_of_points(lons, lats, pidx_.res)
            pt_ord, pl_ord = pidx_.lookup(pc)
            assign = np.full(n, -1, np.int64)
            if len(pt_ord):
                order = np.argsort(pl_ord, kind="stable")
                pt_ord, pl_ord = pt_ord[order], pl_ord[order]
                bounds = np.nonzero(np.diff(pl_ord))[0] + 1
                for seg_pts, seg_pl in zip(
                    np.split(pt_ord, bounds), np.split(pl_ord, bounds)
                ):
                    g = pidx_.geoms[seg_pl[0]]
                    ok = _kernel.points_in_polygon(lons[seg_pts], lats[seg_pts], g)
                    assign[seg_pts[ok]] = seg_pl[0]
            # --- kNN phase (k=1 fast path)
            q, t_ord, d, _rk = _resolve_batch_k1(tidx_, lons, lats, max_rings)
            a = assign[q]
            arrays = [cols[c].take(pa.array(q)) for c in keep]
            arrays.append(
                pa.array(
                    np.where(a >= 0, pid_arr[np.maximum(a, 0)], 0),
                    mask=(a < 0),
                )
            )
            arrays.append(pa.array(tidx_.ids[t_ord]))
            arrays.append(pa.array(d))
            arrays = [
                a.cast(arrow_out.field(i).type) if a.type != arrow_out.field(i).type else a
                for i, a in enumerate(arrays)
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_out)

    from .knn import _fan_out_small_scan

    sel = _fan_out_small_scan(points_df.select(*point_keep, lon, lat))
    return sel.mapInArrow(_run, out_schema)
