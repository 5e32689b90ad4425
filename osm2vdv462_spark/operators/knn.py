"""kNN join: cell ring-expansion candidate search + exact haversine top-k.

The north-star nearest-quay operator (BASELINE.json): generalizes the
reference's proximity matching (which delegates to a routing service,
/root/reference/pipeline/routing/ppr.py:307-327) into a pure geometric
nearest-neighbor join.

Physical plan (broadcast variant — the 100 TB path): the target set
(quays/stop positions; small dimension) is compiled into a sorted
cell -> target CSR index and broadcast; one ``mapInPandas`` pass over the
point table resolves each point's k nearest targets map-side with ZERO
shuffle:

    ring r = 0, 1, 2, ...: gather targets in the Chebyshev ring-r cells of
    the point's cell; a point is resolved once its k-th best distance
    <= r * (min cell dimension in meters at its latitude) — targets in any
    farther ring are provably farther. Unresolved points after
    ``max_rings`` fall back to exact brute force against the whole index
    (correct for arbitrarily isolated points).

Determinism: ties broken by (distance, target_id).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

from ..geo import cells as _cells
from ..geo import kernel as _kernel


@dataclass
class TargetIndex:
    res: int
    sorted_cells: np.ndarray
    offsets: np.ndarray
    tgt_idx: np.ndarray  # target ordinals per cell
    ids: np.ndarray  # user ids, aligned to ordinals
    lon: np.ndarray
    lat: np.ndarray


def build_target_index(rows: list[tuple], res: int) -> TargetIndex:
    """rows: [(target_id, lon, lat)] -> TargetIndex."""
    ids = np.asarray([r[0] for r in rows])
    lon = np.asarray([r[1] for r in rows], np.float64)
    lat = np.asarray([r[2] for r in rows], np.float64)
    cell = _cells.cell_of_points(lon, lat, res)
    order = np.argsort(cell, kind="stable")
    cell_sorted = cell[order]
    uniq, starts = np.unique(cell_sorted, return_index=True)
    offsets = np.concatenate([starts, [len(cell_sorted)]]).astype(np.int64)
    return TargetIndex(res, uniq, offsets, order.astype(np.int64), ids, lon, lat)


def _gather(index: TargetIndex, query_cells: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(query_ordinal, target_ordinal) for targets in the given cells."""
    pos = np.searchsorted(index.sorted_cells, query_cells)
    pos = np.clip(pos, 0, max(len(index.sorted_cells) - 1, 0))
    if len(index.sorted_cells) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    hit = index.sorted_cells[pos] == query_cells
    qs = np.nonzero(hit)[0]
    pos = pos[hit]
    counts = index.offsets[pos + 1] - index.offsets[pos]
    q_ord = np.repeat(qs, counts)
    if len(pos) == 0:
        return q_ord, np.empty(0, np.int64)
    starts = np.repeat(index.offsets[pos], counts)
    within = np.arange(len(starts)) - np.repeat(np.cumsum(counts) - counts, counts)
    return q_ord, index.tgt_idx[starts + within]


def _resolve_batch_k1(
    index: TargetIndex,
    lons: np.ndarray,
    lats: np.ndarray,
    max_rings: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Fast path for k=1: running (best_dist, best_target) per point via
    fmin-scatter — no candidate accumulation, no sorts. This is the hot
    kernel at 10^12 points; allocation discipline matters more than
    elegance here."""
    n = len(lons)
    pcell = _cells.cell_of_points(lons, lats, index.res)
    wmin = 0.98 * _cells.cell_width_m(index.res, lats)
    best_d = np.full(n, np.inf)
    best_t = np.full(n, -1, np.int64)
    # running winner id: the normative tie-break is (dist, target_id), and
    # it must hold ACROSS rings — a later ring's equal-distance candidate
    # may only win with a strictly smaller id
    id_max = np.iinfo(np.int64).max
    best_id = np.full(n, id_max)
    active = np.arange(n)
    for r in range(max_rings + 1):
        if len(active) == 0:
            break
        rep, ring_cells = _cells.neighbors_at_ring(pcell[active], r)
        q_loc, t_ord = _gather(index, ring_cells)
        if len(q_loc):
            q_ord = active[rep[q_loc]]
            d = _kernel.haversine_m(
                lons[q_ord], lats[q_ord], index.lon[t_ord], index.lat[t_ord]
            )
            # sort-free per-point minimum: scatter-min distances; points
            # whose best STRICTLY improved forfeit their old winner id,
            # then a second scatter-min picks the smallest id among ties
            pb = best_d[q_ord]
            np.minimum.at(best_d, q_ord, d)
            improved = best_d[q_ord] < pb
            best_id[q_ord[improved]] = id_max
            is_best = d == best_d[q_ord]
            qb, tb = q_ord[is_best], t_ord[is_best]
            ids_tb = index.ids[tb].astype(np.int64)
            np.minimum.at(best_id, qb, ids_tb)
            chosen = best_id[qb] == ids_tb
            best_t[qb[chosen]] = tb[chosen]
        resolved = best_d[active] <= r * wmin[active]
        active = active[~resolved]
    if len(active) and len(index.ids):
        # brute force for isolated points, chunked; same (dist, id) order
        ids_all = index.ids.astype(np.int64)
        CH = max(1, 4_000_000 // max(len(index.ids), 1))
        for s in range(0, len(active), CH):
            a = active[s : s + CH]
            d = _kernel.haversine_m(
                lons[a][:, None], lats[a][:, None],
                index.lon[None, :], index.lat[None, :],
            )
            dd = d.min(axis=1)
            tie = d == dd[:, None]
            j = np.argmin(np.where(tie, ids_all[None, :], id_max), axis=1)
            upd = (dd < best_d[a]) | (
                (dd == best_d[a]) & (ids_all[j] < best_id[a])
            )
            best_d[a[upd]] = dd[upd]
            best_t[a[upd]] = j[upd]
            best_id[a[upd]] = ids_all[j[upd]]
    got = best_t >= 0
    q = np.nonzero(got)[0]
    return q, best_t[q], best_d[q], np.ones(len(q), np.int64)


def _resolve_batch(
    index: TargetIndex,
    lons: np.ndarray,
    lats: np.ndarray,
    k: int,
    max_rings: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-batch kNN: returns (point_ordinal, target_ordinal, dist, rank)."""
    if k == 1 and np.issubdtype(np.asarray(index.ids).dtype, np.number):
        return _resolve_batch_k1(index, lons, lats, max_rings)
    n = len(lons)
    pcell = _cells.cell_of_points(lons, lats, index.res)
    # safe-radius unit per point; 0.98 guards the planar-degree -> geodesic
    # approximation so the bound always UNDER-estimates true separation
    wmin = 0.98 * _cells.cell_width_m(index.res, lats)

    cand_q: list[np.ndarray] = []
    cand_t: list[np.ndarray] = []
    cand_d: list[np.ndarray] = []
    active = np.arange(n)
    kth_best = np.full(n, np.inf)
    n_cand = np.zeros(n, np.int64)

    for r in range(max_rings + 1):
        if len(active) == 0:
            break
        rep, ring_cells = _cells.neighbors_at_ring(pcell[active], r)
        q_loc, t_ord = _gather(index, ring_cells)
        if len(q_loc):
            q_ord = active[rep[q_loc]]
            d = _kernel.haversine_m(
                lons[q_ord], lats[q_ord], index.lon[t_ord], index.lat[t_ord]
            )
            cand_q.append(q_ord)
            cand_t.append(t_ord)
            cand_d.append(d)
            np.add.at(n_cand, q_ord, 1)
        # recompute kth-best for active points that have >= k candidates
        if cand_q:
            aq = np.concatenate(cand_q)
            ad = np.concatenate(cand_d)
            have = active[n_cand[active] >= k]
            if len(have):
                sel = np.isin(aq, have)
                sq, sd = aq[sel], ad[sel]
                order = np.lexsort((sd, sq))
                sq, sd = sq[order], sd[order]
                grp_start = np.nonzero(np.r_[True, sq[1:] != sq[:-1]])[0]
                kth_pos = grp_start + (k - 1)
                valid = kth_pos < np.r_[grp_start[1:], len(sq)]
                kth_best[sq[grp_start[valid]]] = sd[kth_pos[valid]]
        safe = r * wmin
        resolved = (n_cand >= k) & (kth_best <= safe)
        active = np.nonzero(~resolved)[0] if r > 0 else active
        active = active[~resolved[active]]

    # brute-force fallback for still-active points (rare / isolated)
    if len(active) and len(index.ids):
        CH = 2_000_000 // max(len(active), 1) + 1
        for s in range(0, len(index.ids), max(CH, 1)):
            t_slice = np.arange(s, min(s + max(CH, 1), len(index.ids)))
            d = _kernel.haversine_m(
                lons[active][:, None],
                lats[active][:, None],
                index.lon[t_slice][None, :],
                index.lat[t_slice][None, :],
            )
            q_ord = np.repeat(active, len(t_slice))
            t_ord = np.tile(t_slice, len(active))
            cand_q.append(q_ord)
            cand_t.append(t_ord)
            cand_d.append(d.ravel())

    if not cand_q:
        e = np.empty(0, np.int64)
        return e, e, np.empty(0, np.float64), e
    aq = np.concatenate(cand_q)
    at = np.concatenate(cand_t)
    ad = np.concatenate(cand_d)
    # dedup (point, target) pairs kept once (fallback may duplicate ring hits)
    key = aq * np.int64(len(index.ids) + 1) + at
    _, first = np.unique(key, return_index=True)
    aq, at, ad = aq[first], at[first], ad[first]
    # top-k per point, ties by (dist, target_id)
    order = np.lexsort((index.ids[at], ad, aq))
    aq, at, ad = aq[order], at[order], ad[order]
    grp_start = np.r_[True, aq[1:] != aq[:-1]]
    rank = np.arange(len(aq)) - np.maximum.accumulate(
        np.where(grp_start, np.arange(len(aq)), -1)
    )
    keep = rank < k
    return aq[keep], at[keep], ad[keep], rank[keep] + 1


def dwithin_join_broadcast(
    points_df: DataFrame,
    targets_df: DataFrame,
    *,
    point_keep: list[str],
    lon: str = "lon",
    lat: str = "lat",
    target_id: str = "target_id",
    target_lon: str = "lon",
    target_lat: str = "lat",
    distance_m: float = 1000.0,
    res: int | None = None,
) -> DataFrame:
    """ST_DWithin join (north-star op): every (point, target) pair within
    ``distance_m`` meters. Map-side: broadcast cell index, fixed ring
    radius ceil(D / cell_min_width), exact haversine filter.

    Output: point_keep..., <target_id>, dist_m.
    """
    spark = points_df.sparkSession
    from ._guard import collect_dim_cols

    rows = collect_dim_cols(
        targets_df, [target_id, target_lon, target_lat], "targets"
    )
    if res is None:
        # cell ≥ D so ring radius stays ≤ 2 at any latitude we cover
        res = _cells.choose_resolution(distance_m)
    index = build_target_index(rows, res)
    bc = spark.sparkContext.broadcast(index)

    from pyspark.sql.types import StructField, StructType

    in_schema = points_df.select(*point_keep, lon, lat).schema
    tid_field = targets_df.select(target_id).schema[0]
    out_schema = StructType(
        [f for f in in_schema if f.name in point_keep]
        + [StructField(target_id, tid_field.dataType),
           StructField("dist_m", DoubleType())]
    )
    keep = list(point_keep)
    D = float(distance_m)

    def _dw(batches):
        idx: TargetIndex = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lons = pdf[lon].to_numpy(np.float64)
            lats = pdf[lat].to_numpy(np.float64)
            pcell = _cells.cell_of_points(lons, lats, idx.res)
            wmin = 0.98 * _cells.cell_width_m(idx.res, lats)
            max_r = int(np.ceil(D / max(float(wmin.min()), 1.0))) + 1
            qs, ts, ds = [], [], []
            for r in range(max_r + 1):
                rep, ring_cells = _cells.neighbors_at_ring(pcell, r)
                q_loc, t_ord = _gather(idx, ring_cells)
                if len(q_loc) == 0:
                    continue
                q_ord = rep[q_loc]
                d = _kernel.haversine_m(
                    lons[q_ord], lats[q_ord], idx.lon[t_ord], idx.lat[t_ord]
                )
                ok = d <= D
                qs.append(q_ord[ok])
                ts.append(t_ord[ok])
                ds.append(d[ok])
            if not qs:
                continue
            q = np.concatenate(qs)
            t = np.concatenate(ts)
            d = np.concatenate(ds)
            if len(q) == 0:
                continue
            out = pdf.iloc[q][keep].reset_index(drop=True)
            out[target_id] = idx.ids[t]
            out["dist_m"] = d
            yield out

    sel = _fan_out_small_scan(points_df.select(*point_keep, lon, lat))
    return sel.mapInPandas(_dw, out_schema)


def knn_join_broadcast(
    points_df: DataFrame,
    targets_df: DataFrame,
    *,
    point_keep: list[str],
    lon: str = "lon",
    lat: str = "lat",
    target_id: str = "target_id",
    target_lon: str = "lon",
    target_lat: str = "lat",
    k: int = 1,
    res: int | None = None,
    max_rings: int = 4,
) -> DataFrame:
    """For each point, its k nearest targets (haversine meters).

    Output: point_keep... , <target_id>, dist_m double, knn_rank int.
    Map-side only — no shuffle of the point table.
    """
    spark = points_df.sparkSession
    from ._guard import collect_dim_cols

    rows = collect_dim_cols(
        targets_df, [target_id, target_lon, target_lat], "targets"
    )
    if res is None:
        # density heuristic: ~>=2 targets expected per ring-1 disk
        import math

        n = max(len(rows), 1)
        # targets spread over their bbox; fall back to res 13
        lons = [r[1] for r in rows]
        lats = [r[2] for r in rows]
        if n > 4:
            span = max(max(lons) - min(lons), max(lats) - min(lats), 1e-9)
            per_cell_target = span / math.sqrt(n) * 2.0
            res = max(4, min(int(math.log2(180.0 / per_cell_target)), _cells.MAX_RES))
        else:
            res = 13
    index = build_target_index(rows, res)
    bc = spark.sparkContext.broadcast(index)

    in_schema = points_df.select(*point_keep, lon, lat).schema
    tid_field = targets_df.select(target_id).schema[0]
    out_schema = StructType(
        [f for f in in_schema if f.name in point_keep]
        + [
            StructField(target_id, tid_field.dataType),
            StructField("dist_m", DoubleType()),
            StructField("knn_rank", IntegerType()),
        ]
    )
    keep = list(point_keep)

    def _knn(batches):
        idx: TargetIndex = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lons = pdf[lon].to_numpy(np.float64)
            lats = pdf[lat].to_numpy(np.float64)
            q, t, d, rk = _resolve_batch(idx, lons, lats, k, max_rings)
            if len(q) == 0:
                continue
            out = pdf.iloc[q][keep].reset_index(drop=True)
            out[target_id] = idx.ids[t]
            out["dist_m"] = d
            out["knn_rank"] = rk.astype(np.int32)
            yield out

    sel = _fan_out_small_scan(points_df.select(*point_keep, lon, lat))
    return sel.mapInPandas(_knn, out_schema)


def _fan_out_small_scan(df: DataFrame) -> DataFrame:
    """The point side of the broadcast joins is map-side work over
    whatever partitioning the scan produced. At fleet scale the input is
    thousands of files and parallelism is free; a SMALL input (one
    parquet file under maxPartitionBytes — exactly the bench/driver
    shape) plans as ONE task and serializes the vectorized kernel on a
    single Python worker. Fan out only in that case — for a big input
    this is a no-op, so the operator never pays an extra full-table
    round-trip at 100 TB."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par * 2)
    return df
