"""Vision/segmentation queries (pyspark x image axis): distributed
connected-component labeling, binary morphology, Otsu auto-threshold
and an integer Hough line transform — the post-threshold segmentation
toolbox a raster/imagery corpus pipeline runs after decode.

All four are EXACT-INTEGER dataflows (labels, counts, quantized
criteria), so every output is hash-gated with no float discipline.
The binary rasters derive from md5 noise / the closed-form synth
pattern (no external data, per the brief); Otsu and Hough run through
the REAL decode path (functions/imagecodec.py) while their oracles
recompute from the pixel closed form — decode + operator cross-check
each other end-to-end, the same discipline as image_pixel_stats.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import deploy
from ..functions import imagecodec as ic
from ..pipeline import images as im
from . import register_extra

# ------------------------------------------------------------ CCL

_CCL_TW, _CCL_TH, _CCL_PX = 6, 6, 16  # 96x96 raster, 36 tiles
_CCL_W = _CCL_TW * _CCL_PX


def _noise_mask(tag: str, tx: int, ty: int, px: int, mod: int, lt: int) -> np.ndarray:
    """Per-tile binary mask from md5 site noise: pixel (gx, gy) is
    foreground iff int(md5('{tag}:gx:gy')[:4], 16) % mod < lt — the
    same closed form the DuckDB oracles evaluate."""
    m = np.zeros((px, px), np.uint8)
    for i in range(px):
        gy = ty * px + i
        for j in range(px):
            gx = tx * px + j
            h = hashlib.md5(f"{tag}:{gx}:{gy}".encode()).hexdigest()
            m[i, j] = 1 if int(h[:4], 16) % mod < lt else 0
    return m


def _tiles_df(spark: SparkSession, mask_fn) -> DataFrame:
    tiles = spark.range(_CCL_TW * _CCL_TH).select(
        (F.col("id") % _CCL_TW).cast("int").alias("tx"),
        (F.col("id") / _CCL_TW).cast("int").alias("ty"),
    )
    # one tile per task: the per-tile python synth/label is the work
    tiles = tiles.repartition(8)

    def _mk(batches):
        for pdf in batches:
            out = []
            for tx, ty in zip(pdf["tx"], pdf["ty"]):
                out.append(
                    (int(tx), int(ty), mask_fn(int(tx), int(ty)).tobytes())
                )
            yield pd.DataFrame(out, columns=["tx", "ty", "mask"])

    return tiles.mapInPandas(_mk, "tx int, ty int, mask binary")


@register_extra(
    "raster_cc_labels",
    f"""
    WITH RECURSIVE px AS (
      SELECT x.range AS gx, y.range AS gy,
             y.range * {_CCL_W} + x.range AS gid
      FROM range({_CCL_W}) x, range({_CCL_W}) y
      WHERE ('0x' || substr(md5('ccl:' || x.range || ':' || y.range),
                            1, 4))::INT % 10 < 3
    ),
    e AS (
      SELECT a.gid AS s, b.gid AS d
      FROM px a JOIN px b
        ON (b.gx = a.gx + 1 AND b.gy = a.gy)
        OR (b.gx = a.gx AND b.gy = a.gy + 1)
    ),
    sym AS (SELECT s, d FROM e UNION SELECT d, s FROM e),
    reach(a, b) AS (
      SELECT gid, gid FROM px
      UNION
      SELECT r.a, s.d FROM reach r JOIN sym s ON s.s = r.b
    ),
    lbl AS (SELECT a AS gid, min(b) AS component FROM reach GROUP BY a)
    SELECT l.component, count(*) AS n_px,
           min(p.gx) AS min_gx, min(p.gy) AS min_gy,
           max(p.gx) AS max_gx, max(p.gy) AS max_gy
    FROM lbl l JOIN px p USING (gid)
    GROUP BY 1 ORDER BY 1
    """,
)
def raster_cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (4-adjacency) of a 96x96 md5-noise binary
    raster, labeled with the min global pixel id + size + bbox per
    blob. Spark runs the two-level distributed CCL
    (operators/raster_label.py::cc_labels): tile-local vectorized
    labeling, then only boundary strips + per-root partials shuffle,
    and the tiny root graph merges through the generic iterative
    connected_components — O(perimeter) on the wire, never O(pixels).
    The oracle is the INDEPENDENT textbook formulation: a recursive
    min-reachability closure over the flat pixel adjacency graph (30%
    site density is far below the 4-adjacency percolation threshold,
    so blobs stay small and the closure stays tiny)."""
    from ..operators.raster_label import cc_labels

    tiles = _tiles_df(
        spark, lambda tx, ty: _noise_mask("ccl", tx, ty, _CCL_PX, 10, 3)
    )
    return cc_labels(tiles, px=_CCL_PX, tiles_w=_CCL_TW).orderBy("component")


# ------------------------------------------------------------ morphology


def _morph_mask(tx: int, ty: int, px: int) -> np.ndarray:
    """Diagonal stripes ((gx*7 + gy*11) % 256 < 140) with md5 pepper
    holes (5%) — gives erosion/opening real structure to work on."""
    i, j = np.mgrid[0:px, 0:px]
    gx = tx * px + j
    gy = ty * px + i
    base = ((gx * 7 + gy * 11) % 256 < 140).astype(np.uint8)
    noise = _noise_mask("mrph", tx, ty, px, 20, 1)
    return base & (1 - noise)


@register_extra(
    "morph_open_stats",
    f"""
    WITH px AS (
      SELECT x.range AS gx, y.range AS gy
      FROM range({_CCL_W}) x, range({_CCL_W}) y
      WHERE (x.range * 7 + y.range * 11) % 256 < 140
        AND ('0x' || substr(md5('mrph:' || x.range || ':' || y.range),
                            1, 4))::INT % 20 <> 0
    ),
    er AS (
      SELECT p.gx, p.gy
      FROM px p JOIN px n
        ON n.gx BETWEEN p.gx - 1 AND p.gx + 1
       AND n.gy BETWEEN p.gy - 1 AND p.gy + 1
      GROUP BY 1, 2 HAVING count(*) = 9
    ),
    op AS (
      SELECT DISTINCT p.gx, p.gy
      FROM px p JOIN er e
        ON e.gx BETWEEN p.gx - 1 AND p.gx + 1
       AND e.gy BETWEEN p.gy - 1 AND p.gy + 1
    ),
    fgc AS (SELECT gx // {_CCL_PX} AS tx, gy // {_CCL_PX} AS ty,
                   count(*) AS n_fg FROM px GROUP BY 1, 2),
    erc AS (SELECT gx // {_CCL_PX} AS tx, gy // {_CCL_PX} AS ty,
                   count(*) AS n FROM er GROUP BY 1, 2),
    opc AS (SELECT gx // {_CCL_PX} AS tx, gy // {_CCL_PX} AS ty,
                   count(*) AS n FROM op GROUP BY 1, 2)
    SELECT f.tx, f.ty, f.n_fg,
           COALESCE(e.n, 0) AS n_eroded, COALESCE(o.n, 0) AS n_opened
    FROM fgc f
    LEFT JOIN erc e ON e.tx = f.tx AND e.ty = f.ty
    LEFT JOIN opc o ON o.tx = f.tx AND o.ty = f.ty
    ORDER BY f.tx, f.ty
    """,
)
def morph_open_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 binary erosion + morphological opening over a tiled 96x96
    striped-with-pepper-noise mask, per-tile pixel counts. Spark runs
    the ONE-round halo exchange with 2-pixel strips
    (operators/raster_label.py::morph_open_counts — opening needs
    radius-2 support), all-vectorized 9-shift AND/OR planes; outside
    the raster is background, so absent neighbor tiles contribute
    zeros. The oracle recomputes erosion as a 3x3 self-join with
    HAVING count(*) = 9 and the opening as a dilation EXISTS join —
    nothing in common with the halo plan. Empty-everywhere tiles (none
    here: every tile intersects a stripe) would drop from both sides
    identically via the fgc anchor."""
    from ..operators.raster_label import morph_open_counts

    tiles = _tiles_df(
        spark, lambda tx, ty: _morph_mask(tx, ty, _CCL_PX)
    )
    out = morph_open_counts(tiles, px=_CCL_PX)
    return out.filter(F.col("n_fg") > 0).orderBy("tx", "ty")


# ------------------------------------------------------------ Otsu

_OTSU_EVERY = 50
_OTSU_SZ = 32


@register_extra(
    "otsu_threshold",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    px AS (
      SELECT e.event_id,
             ((x*7 + e.event_id*13) % 256)
           + ((y*11 + e.event_id*29) % 256)
           + (((x+y)*5 + e.event_id*53) % 256) AS t
      FROM e CROSS JOIN yx
    ),
    h AS (SELECT event_id, t, count(*) AS c FROM px GROUP BY 1, 2),
    tot AS (SELECT event_id, sum(c) AS n, sum(t * c) AS mt FROM h GROUP BY 1),
    grid AS (
      SELECT i.event_id, th.range AS thr,
             COALESCE(h.c, 0) AS c, COALESCE(h.t * h.c, 0) AS tc
      FROM (SELECT DISTINCT event_id FROM h) i
      CROSS JOIN range(765) th
      LEFT JOIN h ON h.event_id = i.event_id AND h.t = th.range
    ),
    cum AS (
      SELECT event_id, thr,
             sum(c) OVER cw AS w, sum(tc) OVER cw AS m
      FROM grid
      WINDOW cw AS (PARTITION BY event_id ORDER BY thr
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    crit AS (
      SELECT c.event_id, c.thr,
             CAST(((c.m * t.n - t.mt * c.w) * (c.m * t.n - t.mt * c.w))
               // (c.w * (t.n - c.w)) AS BIGINT) AS crit
      FROM cum c JOIN tot t USING (event_id)
      WHERE c.w > 0 AND c.w < t.n
    ),
    best AS (
      SELECT event_id, thr, crit,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY crit DESC, thr) AS rn
      FROM crit
    )
    SELECT 'img_' || lpad(CAST(b.event_id AS VARCHAR), 9, '0') AS image_id,
           CAST(b.thr AS INT) AS otsu_thr, b.crit,
           count(*) FILTER (WHERE p.t > b.thr) AS n_fg
    FROM best b JOIN px p USING (event_id)
    WHERE b.rn = 1
    GROUP BY 1, 2, 3
    ORDER BY image_id
    """,
)
def otsu_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Otsu auto-threshold per image through the REAL PNG decode path:
    maximize the between-class variance of the channel-sum gray value
    (0..765) as the EXACT integer quantized criterion
    crit = (M*N - MT*W)^2 // (W*(N-W)) — both engines compute the
    identical integer, so the argmax (tie -> lowest threshold) is
    hash-exact with no float rounding anywhere (|M*N - MT*W| <=
    765*1024^2 ~ 8.0e8, squared 6.5e17 < int64). Spark decodes and
    scans the 766-bin histogram vectorized per image; the oracle
    rebuilds cumulative moments with a window over the threshold grid
    from the pixel closed form."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _otsu(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2).ravel()
                hist = np.bincount(t, minlength=766)[:766]
                n = t.size
                mt = int(t.sum())
                w = np.cumsum(hist)[:765]
                m = np.cumsum(np.arange(766, dtype=np.int64) * hist)[:765]
                valid = (w > 0) & (w < n)
                num = m * n - mt * w
                den = np.maximum(w * (n - w), 1)
                crit = np.where(valid, (num * num) // den, -1)
                best = int(np.argmax(crit))  # first max = lowest thr
                out.append(
                    (
                        row.image_id,
                        best,
                        int(crit[best]),
                        int((t > best).sum()),
                    )
                )
            if out:
                yield pd.DataFrame(
                    out, columns=["image_id", "otsu_thr", "crit", "n_fg"]
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _otsu, "image_id string, otsu_thr int, crit long, n_fg long"
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ Hough

# scaled trig table for theta = k * 30 deg, k = 0..5: round(cos*256),
# round(sin*256) — shared literals, independently accumulated
_HOUGH_TAB = [
    (0, 256, 0),
    (1, 222, 128),
    (2, 128, 222),
    (3, 0, 256),
    (4, -128, 222),
    (5, -222, 128),
]
_HOUGH_T = 96  # foreground: gray sum < 96
_HOUGH_OFF = 16384  # shift rho nonnegative so // is floor everywhere
_HOUGH_Q = 512  # rho bucket width


@register_extra(
    "hough_top_line",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    fg AS (
      SELECT e.event_id, x, y
      FROM e CROSS JOIN yx
      WHERE ((x*7 + e.event_id*13) % 256)
          + ((y*11 + e.event_id*29) % 256)
          + (((x+y)*5 + e.event_id*53) % 256) < {_HOUGH_T}
    ),
    ang(k, c, s) AS (VALUES {", ".join(f"({k}, {c}, {s})" for k, c, s in _HOUGH_TAB)}),
    votes AS (
      SELECT event_id, k,
             (x * c + y * s + {_HOUGH_OFF}) // {_HOUGH_Q} AS rb,
             count(*) AS v
      FROM fg CROSS JOIN ang
      GROUP BY 1, 2, 3
    ),
    best AS (
      SELECT event_id, k, rb, v,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY v DESC, k, rb) AS rn
      FROM votes
    ),
    nf AS (SELECT event_id, count(*) AS n_fg FROM fg GROUP BY 1)
    SELECT 'img_' || lpad(CAST(b.event_id AS VARCHAR), 9, '0') AS image_id,
           CAST(b.k AS INT) AS best_k, CAST(b.rb AS INT) AS best_rb,
           b.v AS votes, nf.n_fg
    FROM best b JOIN nf USING (event_id)
    WHERE b.rn = 1
    ORDER BY image_id
    """,
)
def hough_top_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer Hough line transform through the decode path: dark
    pixels (gray sum < 96) vote in a 6-angle x 512-wide-rho-bucket
    accumulator using a shared scaled-integer trig table (rho =
    x*round(cos*256) + y*round(sin*256), shifted nonnegative so
    floor-division buckets agree across engines); the winning
    (angle, rho-bucket) per image — ties broken (votes DESC, k, rb) —
    is hash-gated. Spark accumulates per image vectorized in numpy
    (one bincount per angle batch); the oracle re-votes relationally
    with a VALUES trig table and a window argmax. Images with zero
    dark pixels drop from both sides identically."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)
    tab = np.array(_HOUGH_TAB, np.int64)

    def _hough(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2)
                ys, xs = np.nonzero(t < _HOUGH_T)
                if xs.size == 0:
                    continue
                # (k, n_fg) vote lattice, one vectorized pass
                rb = (
                    xs[None, :] * tab[:, 1:2] + ys[None, :] * tab[:, 2:3]
                    + _HOUGH_OFF
                ) // _HOUGH_Q
                keys = tab[:, 0:1] * 128 + rb  # rb < 128 by range
                counts = np.bincount(keys.ravel())
                v = int(counts.max())
                key = int(np.flatnonzero(counts == v)[0])  # min (k, rb)
                out.append(
                    (row.image_id, key // 128, key % 128, v, int(xs.size))
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["image_id", "best_k", "best_rb", "votes", "n_fg"],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _hough,
            "image_id string, best_k int, best_rb int, votes long, n_fg long",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ equalization


@register_extra(
    "hist_equalize_stats",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    px AS (
      SELECT e.event_id,
             ((x*7 + e.event_id*13) % 256)
           + ((y*11 + e.event_id*29) % 256)
           + (((x+y)*5 + e.event_id*53) % 256) AS t
      FROM e CROSS JOIN yx
    ),
    h AS (SELECT event_id, t, count(*) AS c FROM px GROUP BY 1, 2),
    cdf AS (
      SELECT event_id, t, c,
             sum(c) OVER (PARTITION BY event_id ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
      FROM h
    ),
    m AS (
      SELECT event_id, min(cum) AS cdfmin, sum(c) AS n,
             count(*) AS n_levels
      FROM cdf GROUP BY 1
    ),
    eq AS (
      SELECT d.event_id, d.c,
             ((d.cum - m.cdfmin) * 255) // (m.n - m.cdfmin) AS v
      FROM cdf d JOIN m USING (event_id)
    )
    SELECT 'img_' || lpad(CAST(q.event_id AS VARCHAR), 9, '0') AS image_id,
           CAST(sum(q.v * q.c) * 10000 // max(m.n) AS BIGINT) AS eq_mean_e4,
           CAST(min(q.v) AS INT) AS eq_min, CAST(max(q.v) AS INT) AS eq_max,
           CAST(max(m.n_levels) AS BIGINT) AS n_levels
    FROM eq q JOIN m ON m.event_id = q.event_id
    GROUP BY 1 ORDER BY 1
    """,
)
def hist_equalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram equalization through the decode path: the classic
    eq(t) = ((cdf(t) - cdf_min) * 255) // (n - cdf_min) remap of the
    channel-sum gray value, summarized per image as the equalized mean
    (e-4 fixed point, INTEGER floor division — no float rounding),
    equalized min/max (0 / 255 by construction, a built-in invariant
    check) and the distinct-gray-level count. Spark computes the remap
    per image from a vectorized bincount/cumsum; the oracle rebuilds
    the per-LEVEL weighted form with a window — per-pixel vs per-level
    derivations cross-check each other."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _eq(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2).ravel()
                hist = np.bincount(t, minlength=766)
                cdf = np.cumsum(hist)
                n = t.size
                nz = hist > 0
                cdfmin = int(cdf[nz][0])
                eqlvl = ((cdf - cdfmin) * 255) // (n - cdfmin)
                eqpx = eqlvl[t]
                out.append(
                    (
                        row.image_id,
                        int(eqpx.sum()) * 10000 // n,
                        int(eqpx.min()),
                        int(eqpx.max()),
                        int(nz.sum()),
                    )
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "image_id", "eq_mean_e4", "eq_min", "eq_max", "n_levels",
                    ],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _eq,
            "image_id string, eq_mean_e4 long, eq_min int, eq_max int,"
            " n_levels long",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ GLCM texture

_GLCM_Q = 96  # 766 gray levels -> 8 bins


@register_extra(
    "glcm_texture",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    px AS (
      SELECT e.event_id, x, y,
             (((x*7 + e.event_id*13) % 256)
            + ((y*11 + e.event_id*29) % 256)
            + (((x+y)*5 + e.event_id*53) % 256)) // {_GLCM_Q} AS q
      FROM e CROSS JOIN yx
    ),
    co AS (
      SELECT a.event_id, a.q AS qa, b.q AS qb, count(*) AS c
      FROM px a JOIN px b
        ON b.event_id = a.event_id AND b.y = a.y AND b.x = a.x + 1
      GROUP BY 1, 2, 3
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           CAST(sum((qa - qb) * (qa - qb) * c) AS BIGINT) AS contrast,
           CAST(sum(c * c) AS BIGINT) AS energy,
           CAST(sum(c * (1000000 // (1 + abs(qa - qb)))) AS BIGINT)
             AS homogeneity_e6,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM co GROUP BY 1 ORDER BY 1
    """,
)
def glcm_texture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLCM (gray-level co-occurrence matrix) texture features through
    the decode path — the classic Haralick trio over the (dx=1, dy=0)
    co-occurrence of 8-bin quantized gray: contrast
    (sum (i-j)^2 c_ij), energy (sum c_ij^2) and homogeneity in e-6
    fixed point (sum c_ij * (1e6 // (1+|i-j|)) — the per-cell weight
    is floor-quantized FIRST so both engines sum identical integers).
    Spark builds each image's 8x8 matrix with one shifted-array
    bincount; the oracle re-derives it with a relational self-join on
    (x+1, y). n_cells (nonzero GLCM cells) guards the matrix shape."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _glcm(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                q = px.sum(axis=2) // _GLCM_Q
                a = q[:, :-1].ravel()
                b = q[:, 1:].ravel()
                c = np.bincount(a * 8 + b, minlength=64)
                i, j = np.divmod(np.arange(64), 8)
                contrast = int(((i - j) ** 2 * c).sum())
                energy = int((c.astype(np.int64) ** 2).sum())
                hom = int((c * (1000000 // (1 + np.abs(i - j)))).sum())
                out.append(
                    (
                        row.image_id,
                        contrast,
                        energy,
                        hom,
                        int((c > 0).sum()),
                    )
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "image_id", "contrast", "energy",
                        "homogeneity_e6", "n_cells",
                    ],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _glcm,
            "image_id string, contrast long, energy long,"
            " homogeneity_e6 long, n_cells long",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ RLE runs

_RLE_T = 383  # fg: gray sum < median-ish -> long runs


@register_extra(
    "rle_row_runs",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    fg AS (
      SELECT e.event_id, x, y
      FROM e CROSS JOIN yx
      WHERE ((x*7 + e.event_id*13) % 256)
          + ((y*11 + e.event_id*29) % 256)
          + (((x+y)*5 + e.event_id*53) % 256) < {_RLE_T}
    ),
    isl AS (
      SELECT event_id, y,
             x - row_number() OVER (PARTITION BY event_id, y ORDER BY x)
               AS grp
      FROM fg
    ),
    runs AS (
      SELECT event_id, count(*) AS len
      FROM isl GROUP BY event_id, y, grp
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           count(*) AS n_runs, CAST(max(len) AS BIGINT) AS max_run,
           CAST(sum(len) AS BIGINT) AS n_fg
    FROM runs GROUP BY 1 ORDER BY 1
    """,
)
def rle_row_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding statistics of the thresholded image (gray
    sum < 383), per image: horizontal run count, longest run, and
    foreground total — the compressibility/structure probe an RLE or
    CCITT-style mask codec would see. Spark counts run STARTS with one
    vectorized padded-diff per image (a run starts where fg rises);
    the oracle derives the same runs with the classic gaps-and-islands
    x - row_number() grouping — bitmap-diff vs relational-islands
    cross-check. Images with zero foreground drop from both sides
    identically."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _rle(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                fg = px.sum(axis=2) < _RLE_T
                if not fg.any():
                    continue
                padded = np.zeros(
                    (fg.shape[0], fg.shape[1] + 1), dtype=np.int8
                )
                padded[:, 1:] = fg
                d = np.diff(padded, axis=1)
                starts = int((d == 1).sum())
                # run lengths: distance between rises and falls per row
                pad2 = np.zeros((fg.shape[0], fg.shape[1] + 2), np.int8)
                pad2[:, 1:-1] = fg
                dd = np.diff(pad2, axis=1)
                rs = np.nonzero(dd == 1)
                re_ = np.nonzero(dd == -1)
                lens = re_[1] - rs[1]
                out.append(
                    (
                        row.image_id,
                        starts,
                        int(lens.max()),
                        int(fg.sum()),
                    )
                )
            if out:
                yield pd.DataFrame(
                    out, columns=["image_id", "n_runs", "max_run", "n_fg"]
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _rle,
            "image_id string, n_runs long, max_run long, n_fg long",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ moments


@register_extra(
    "image_moments",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    px AS (
      SELECT e.event_id, x, y,
             ((x*7 + e.event_id*13) % 256)
           + ((y*11 + e.event_id*29) % 256)
           + (((x+y)*5 + e.event_id*53) % 256) AS t
      FROM e CROSS JOIN yx
    ),
    m AS (
      SELECT event_id,
             CAST(sum(t) AS BIGINT) AS m00,
             CAST(sum(x * t) AS BIGINT) AS m10,
             CAST(sum(y * t) AS BIGINT) AS m01,
             CAST(sum(x * x * t) AS BIGINT) AS m20,
             CAST(sum(x * y * t) AS BIGINT) AS m11,
             CAST(sum(y * y * t) AS BIGINT) AS m02
      FROM px GROUP BY 1
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           m00, m10, m01,
           m00 * m20 - m10 * m10 AS cmu20,
           m00 * m11 - m10 * m01 AS cmu11,
           m00 * m02 - m01 * m01 AS cmu02,
           CASE WHEN m00 * m20 - m10 * m10 > m00 * m02 - m01 * m01 THEN 1
                WHEN m00 * m20 - m10 * m10 < m00 * m02 - m01 * m01 THEN -1
                ELSE 0 END AS wide_cls,
           CASE WHEN m00 * m11 - m10 * m01 > 0 THEN 1
                WHEN m00 * m11 - m10 * m01 < 0 THEN -1
                ELSE 0 END AS diag_cls
    FROM m ORDER BY image_id
    """,
)
def image_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw + central image moments through the decode path — the
    classic intensity-shape descriptor (centroid numerators and the
    second-moment covariance that Hu invariants / orientation
    estimates build on). Central moments stay EXACT integers by
    scaling with m00 instead of dividing by it: m00*mu20 = m00*m20 -
    m10^2 (etc.), bounded ~6e14 < int64 at 32x32x765 — no rational
    centroid ever materializes (the kmeans common-denominator trick).
    wide_cls / diag_cls classify orientation from comparisons of the
    scaled covariance terms, so the classification is hash-exact too.
    One vectorized numpy pass per image; relational sum-of-products
    oracle."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _mom(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2)
                h, w = t.shape
                yv, xv = np.mgrid[0:h, 0:w]
                m00 = int(t.sum())
                m10 = int((xv * t).sum())
                m01 = int((yv * t).sum())
                m20 = int((xv * xv * t).sum())
                m11 = int((xv * yv * t).sum())
                m02 = int((yv * yv * t).sum())
                c20 = m00 * m20 - m10 * m10
                c11 = m00 * m11 - m10 * m01
                c02 = m00 * m02 - m01 * m01
                wide = 1 if c20 > c02 else (-1 if c20 < c02 else 0)
                diag = 1 if c11 > 0 else (-1 if c11 < 0 else 0)
                out.append(
                    (row.image_id, m00, m10, m01, c20, c11, c02, wide, diag)
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "image_id", "m00", "m10", "m01", "cmu20",
                        "cmu11", "cmu02", "wide_cls", "diag_cls",
                    ],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _mom,
            "image_id string, m00 long, m10 long, m01 long, cmu20 long,"
            " cmu11 long, cmu02 long, wide_cls int, diag_cls int",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ quadtree

_QT_TOL = 96


def _qt_oracle() -> str:
    levels = []
    for d in range(6):
        bs = 32 >> d
        levels.append(
            f"""
      SELECT event_id, {d} AS depth, x // {bs} AS bx, y // {bs} AS by,
             max(t) - min(t) <= {_QT_TOL} AS uni
      FROM px GROUP BY 1, 2, 3, 4"""
        )
    blocks = "\n      UNION ALL".join(levels)
    return f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    px AS (
      SELECT e.event_id, x, y,
             ((x*7 + e.event_id*13) % 256)
           + ((y*11 + e.event_id*29) % 256)
           + (((x+y)*5 + e.event_id*53) % 256) AS t
      FROM e CROSS JOIN yx
    ),
    blocks AS ({blocks}
    ),
    leaf AS (
      SELECT b.event_id, b.depth
      FROM blocks b
      LEFT JOIN blocks p
        ON p.event_id = b.event_id AND p.depth = b.depth - 1
       AND p.bx = b.bx // 2 AND p.by = b.by // 2
      WHERE b.uni AND (b.depth = 0 OR NOT p.uni)
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           CAST(depth AS INT) AS depth, count(*) AS n_leaves,
           CAST(count(*) * ({_OTSU_SZ} // (1 << depth))
                         * ({_OTSU_SZ} // (1 << depth)) AS BIGINT) AS px_covered
    FROM leaf GROUP BY event_id, depth ORDER BY 1, 2
    """


@register_extra("quadtree_leaf_stats", _qt_oracle())
def quadtree_leaf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadtree decomposition of each decoded image (split until the
    block's gray range <= 96, max depth 5): leaves per depth and the
    pixels they cover — the structure/compressibility probe behind
    quadtree image codecs and spatial index page splits. Uniformity is
    DOWNWARD MONOTONE (a sub-block's range never exceeds its parent's),
    so 'leaf iff uniform and parent not uniform' is exact without
    checking higher ancestors — both engines rely on the same
    invariant. Spark computes per-depth block ranges with six reshape
    max/min reductions per image (vectorized, map-side); the oracle
    rebuilds the block table with six GROUP BYs and a parent
    anti-uniformity join. All integers."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _qt(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2)
                uni = {}
                for d in range(6):
                    bs = _OTSU_SZ >> d
                    blk = t.reshape(2**d, bs, 2**d, bs)
                    uni[d] = (
                        blk.max(axis=(1, 3)) - blk.min(axis=(1, 3))
                    ) <= _QT_TOL
                cnt = {0: int(uni[0].sum())}
                for d in range(1, 6):
                    pnot = ~np.repeat(np.repeat(uni[d - 1], 2, 0), 2, 1)
                    cnt[d] = int((uni[d] & pnot).sum())
                for d, c in cnt.items():
                    if c:
                        bs = _OTSU_SZ >> d
                        out.append((row.image_id, d, c, c * bs * bs))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["image_id", "depth", "n_leaves", "px_covered"],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _qt,
            "image_id string, depth int, n_leaves long, px_covered long",
        )
        .orderBy("image_id", "depth")
    )


# ------------------------------------------------------------ Haar bands


def _haar_oracle() -> str:
    lvls, es, joins, cols = [], [], [], []
    for k in (1, 2, 3):
        bk, half = 1 << k, 1 << (k - 1)
        sy = f"(CASE WHEN y % {bk} < {half} THEN 1 ELSE -1 END)"
        sx = f"(CASE WHEN x % {bk} < {half} THEN 1 ELSE -1 END)"
        lvls.append(
            f"""
    lvl{k} AS (
      SELECT event_id, y // {bk} AS by, x // {bk} AS bx,
             CAST(sum(t * {sy}) AS BIGINT) AS lh,
             CAST(sum(t * {sx}) AS BIGINT) AS hl,
             CAST(sum(t * {sy} * {sx}) AS BIGINT) AS hh,
             CAST(sum(t) AS BIGINT) AS ll
      FROM px GROUP BY 1, 2, 3
    )"""
        )
        extra = ", CAST(sum(ll * ll) AS BIGINT) AS e_ll3" if k == 3 else ""
        es.append(
            f"""
    e{k} AS (
      SELECT event_id,
             CAST(sum(lh * lh) AS BIGINT) AS e_lh{k},
             CAST(sum(hl * hl) AS BIGINT) AS e_hl{k},
             CAST(sum(hh * hh) AS BIGINT) AS e_hh{k}{extra}
      FROM lvl{k} GROUP BY 1
    )"""
        )
        joins.append(f"e{k}")
        cols += [f"e_lh{k}", f"e_hl{k}", f"e_hh{k}"]
    return f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    px AS (
      SELECT e.event_id, x, y,
             ((x*7 + e.event_id*13) % 256)
           + ((y*11 + e.event_id*29) % 256)
           + (((x+y)*5 + e.event_id*53) % 256) AS t
      FROM e CROSS JOIN yx
    ),{",".join(lvls)},{",".join(es)}
    SELECT 'img_' || lpad(CAST(e1.event_id AS VARCHAR), 9, '0') AS image_id,
           {", ".join(cols)}, e_ll3
    FROM e1 JOIN e2 USING (event_id) JOIN e3 USING (event_id)
    ORDER BY image_id
    """


@register_extra("haar_energy_bands", _haar_oracle())
def haar_energy_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-level 2D Haar wavelet band energies per decoded image —
    the energy-compaction fingerprint wavelet codecs and texture
    classifiers use. UNNORMALIZED lifting keeps every coefficient an
    exact integer (the HITS/PageRank trick in the transform domain),
    so all ten band energies are hash-gated. The two engines derive
    the transform DIFFERENTLY: Spark runs the genuine recursive
    lifting (2x2 sum/difference pyramid, vectorized strided slices),
    while the oracle evaluates the CLOSED FORM — each level-k
    coefficient is a parity-sign-weighted block sum, no recursion —
    and the equality of the two constructions is itself part of what
    the hash verifies. Map-side only."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _haar(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                ll = px.sum(axis=2)
                rec = [row.image_id]
                for _ in (1, 2, 3):
                    a = ll[0::2, 0::2]
                    b = ll[0::2, 1::2]
                    c = ll[1::2, 0::2]
                    d = ll[1::2, 1::2]
                    lh = a + b - c - d
                    hl = a - b + c - d
                    hh = a - b - c + d
                    rec += [
                        int((lh * lh).sum()),
                        int((hl * hl).sum()),
                        int((hh * hh).sum()),
                    ]
                    ll = a + b + c + d
                rec.append(int((ll * ll).sum()))
                out.append(tuple(rec))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "image_id",
                        "e_lh1", "e_hl1", "e_hh1",
                        "e_lh2", "e_hl2", "e_hh2",
                        "e_lh3", "e_hl3", "e_hh3",
                        "e_ll3",
                    ],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _haar,
            "image_id string, e_lh1 long, e_hl1 long, e_hh1 long,"
            " e_lh2 long, e_hl2 long, e_hh2 long,"
            " e_lh3 long, e_hl3 long, e_hh3 long, e_ll3 long",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ marching squares

_MS_ISO = 128


@register_extra(
    "marching_squares_stats",
    f"""
    WITH q AS (
      SELECT x.range AS gx, y.range AS gy
      FROM range({_CCL_W - 1}) x, range({_CCL_W - 1}) y
    ),
    c AS (
      SELECT gx, gy,
             CAST((gx*7 + gy*11) % 256 >= {_MS_ISO} AS INT)
           + 2 * CAST(((gx+1)*7 + gy*11) % 256 >= {_MS_ISO} AS INT)
           + 4 * CAST((gx*7 + (gy+1)*11) % 256 >= {_MS_ISO} AS INT)
           + 8 * CAST(((gx+1)*7 + (gy+1)*11) % 256 >= {_MS_ISO} AS INT)
               AS cs
      FROM q
    )
    SELECT gx // {_CCL_PX} AS tx, gy // {_CCL_PX} AS ty,
           count(*) FILTER (WHERE cs NOT IN (0, 15)) AS n_active,
           CAST(count(*) FILTER (WHERE cs NOT IN (0, 15))
                + count(*) FILTER (WHERE cs IN (6, 9)) AS BIGINT)
             AS n_segments
    FROM c GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def marching_squares_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares isoline extraction statistics (iso = 128) over
    the tiled striped raster: active quads and emitted contour
    segments per tile — the contouring primitive behind elevation
    isolines and density-map vectorization. Quads are keyed by their
    top-left pixel, so the distributed form needs the right / bottom /
    diagonal neighbors' FIRST column / row / corner: the halo exchange
    ships exactly three thin messages per tile (~12% of the band, see
    operators/raster_label.py::marching_squares_counts) and quads
    whose far corners leave the raster are dropped identically in both
    engines. Saddle quads (opposite corners high, cases 6/9 in the
    TL=1 TR=2 BL=4 BR=8 numbering) emit two segments. The oracle
    recomputes every quad case from the pixel closed form on a flat
    95x95 grid."""
    from ..operators.raster_label import marching_squares_counts

    tiles = spark.range(_CCL_TW * _CCL_TH).select(
        (F.col("id") % _CCL_TW).cast("int").alias("tx"),
        F.expr(f"id div {_CCL_TW}").cast("int").alias("ty"),
    ).repartition(8)

    def _mk(batches):
        for pdf in batches:
            out = []
            for tx, ty in zip(pdf["tx"], pdf["ty"]):
                i, j = np.mgrid[0:_CCL_PX, 0:_CCL_PX]
                gx = int(tx) * _CCL_PX + j
                gy = int(ty) * _CCL_PX + i
                band = ((gx * 7 + gy * 11) % 256).astype(np.uint8)
                out.append((int(tx), int(ty), band.tobytes()))
            yield pd.DataFrame(out, columns=["tx", "ty", "band"])

    bands = tiles.mapInPandas(_mk, "tx int, ty int, band binary")
    out = marching_squares_counts(bands, px=_CCL_PX, iso=_MS_ISO)
    return out.filter(F.col("n_active") >= 0).orderBy("tx", "ty")


# ------------------------------------------------------------ median cut

_MC_ORACLE = f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    px AS (
      SELECT e.event_id, x, y,
             (x*7 + e.event_id*13) % 256 AS r,
             (y*11 + e.event_id*29) % 256 AS g,
             ((x+y)*5 + e.event_id*53) % 256 AS b
      FROM e CROSS JOIN yx
    ),
    rg1 AS (
      SELECT event_id, count(*) AS n,
             max(r)-min(r) AS rr, max(g)-min(g) AS rgg, max(b)-min(b) AS rb
      FROM px GROUP BY 1
    ),
    ch1 AS (
      SELECT event_id, n,
             CASE WHEN rr >= rgg AND rr >= rb THEN 1
                  WHEN rgg >= rb THEN 2 ELSE 3 END AS c
      FROM rg1
    ),
    v1 AS (
      SELECT p.event_id, p.x, p.y, p.r, p.g, p.b,
             CASE c.c WHEN 1 THEN p.r WHEN 2 THEN p.g ELSE p.b END AS v,
             c.n
      FROM px p JOIN ch1 c USING (event_id)
    ),
    m1 AS (
      SELECT event_id, v AS med FROM (
        SELECT event_id, v, n,
               row_number() OVER (PARTITION BY event_id ORDER BY v) AS rn
        FROM v1
      ) WHERE rn = (n + 1) // 2
    ),
    p1 AS (
      SELECT v1.event_id, x, y, r, g, b,
             CASE WHEN v1.v <= m1.med THEN 0 ELSE 1 END AS b1
      FROM v1 JOIN m1 USING (event_id)
    ),
    rg2 AS (
      SELECT event_id, b1, count(*) AS n,
             max(r)-min(r) AS rr, max(g)-min(g) AS rgg, max(b)-min(b) AS rb
      FROM p1 GROUP BY 1, 2
    ),
    ch2 AS (
      SELECT event_id, b1, n,
             CASE WHEN rr >= rgg AND rr >= rb THEN 1
                  WHEN rgg >= rb THEN 2 ELSE 3 END AS c
      FROM rg2
    ),
    v2 AS (
      SELECT p.event_id, p.b1, p.r, p.g, p.b,
             CASE c.c WHEN 1 THEN p.r WHEN 2 THEN p.g ELSE p.b END AS v,
             c.n
      FROM p1 p JOIN ch2 c ON c.event_id = p.event_id AND c.b1 = p.b1
    ),
    m2 AS (
      SELECT event_id, b1, v AS med FROM (
        SELECT event_id, b1, v, n,
               row_number() OVER (PARTITION BY event_id, b1
                                  ORDER BY v) AS rn
        FROM v2
      ) WHERE rn = (n + 1) // 2
    ),
    p2 AS (
      SELECT v2.event_id,
             v2.b1 * 2 + CASE WHEN v2.v <= m2.med THEN 0 ELSE 1 END AS bucket,
             r, g, b
      FROM v2 JOIN m2 ON m2.event_id = v2.event_id AND m2.b1 = v2.b1
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           CAST(bucket AS INT) AS bucket, count(*) AS n_px,
           CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b
    FROM p2 GROUP BY 1, 2 ORDER BY 1, 2
    """


@register_extra("median_cut_palette", _MC_ORACLE)
def median_cut_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-cut color quantization (2 levels -> 4 palette buckets)
    through the real decode path — the classic GIF/PNG8 palette
    builder: recursively split the pixel set on the widest channel at
    its lower median. Every decision is pinned (channel ties r > g >
    b; split at value <= lower-median, so duplicate values never
    straddle buckets), and outputs are per-bucket counts + channel
    SUMS (exact integers; the palette color is sum/count, left
    unreduced per the no-rational discipline). Spark does the
    recursion per image in numpy; the oracle replays both split
    levels relationally with per-image rank windows — a completely
    different construction of the same tree."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _mc(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                chans = [px[:, :, k].ravel() for k in range(3)]

                def split(mask):
                    rng = [
                        int(c[mask].max() - c[mask].min()) for c in chans
                    ]
                    ci = int(np.argmax(rng))
                    v = chans[ci][mask]
                    med = int(np.sort(v)[(v.size + 1) // 2 - 1])
                    s0 = mask.copy()
                    s0[mask] = v <= med
                    s1 = mask.copy()
                    s1[mask] = v > med
                    return s0, s1

                full = np.ones_like(chans[0], bool)
                h0, h1 = split(full)
                for bi, half in ((0, h0), (1, h1)):
                    if not half.any():
                        continue
                    s0, s1 = split(half)
                    for bj, sub in ((0, s0), (1, s1)):
                        if not sub.any():
                            continue
                        out.append(
                            (
                                row.image_id,
                                bi * 2 + bj,
                                int(sub.sum()),
                                int(chans[0][sub].sum()),
                                int(chans[1][sub].sum()),
                                int(chans[2][sub].sum()),
                            )
                        )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "image_id", "bucket", "n_px",
                        "sum_r", "sum_g", "sum_b",
                    ],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _mc,
            "image_id string, bucket int, n_px long,"
            " sum_r long, sum_g long, sum_b long",
        )
        .orderBy("image_id", "bucket")
    )


# ------------------------------------------------------------ HOG octants


@register_extra(
    "hog_octant_hist",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range(1, {_OTSU_SZ - 1}) y, range(1, {_OTSU_SZ - 1}) x),
    t AS (
      SELECT e.event_id, x, y,
             (((x+1)*7 + e.event_id*13) % 256)
           + ((y*11 + e.event_id*29) % 256)
           + (((x+1+y)*5 + e.event_id*53) % 256)
           - (((x-1)*7 + e.event_id*13) % 256)
           - ((y*11 + e.event_id*29) % 256)
           - (((x-1+y)*5 + e.event_id*53) % 256) AS gx,
             ((x*7 + e.event_id*13) % 256)
           + (((y+1)*11 + e.event_id*29) % 256)
           + (((x+y+1)*5 + e.event_id*53) % 256)
           - ((x*7 + e.event_id*13) % 256)
           - (((y-1)*11 + e.event_id*29) % 256)
           - (((x+y-1)*5 + e.event_id*53) % 256) AS gy
      FROM e CROSS JOIN yx
    ),
    o AS (
      SELECT event_id, gx, gy,
             CASE WHEN gx = 0 AND gy = 0 THEN 8 ELSE
               (CASE WHEN gy < 0 THEN 4 ELSE 0 END)
             + (CASE WHEN (CASE WHEN gy < 0 THEN -gx ELSE gx END) <= 0
                     THEN 2 ELSE 0 END)
             + (CASE WHEN
                  (CASE WHEN (CASE WHEN gy < 0 THEN -gx ELSE gx END) <= 0
                        THEN -(CASE WHEN gy < 0 THEN -gx ELSE gx END)
                        ELSE (CASE WHEN gy < 0 THEN -gy ELSE gy END) END)
                  >
                  (CASE WHEN (CASE WHEN gy < 0 THEN -gx ELSE gx END) <= 0
                        THEN (CASE WHEN gy < 0 THEN -gy ELSE gy END)
                        ELSE (CASE WHEN gy < 0 THEN -gx ELSE gx END) END)
                THEN 1 ELSE 0 END)
             END AS oct
      FROM t
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           {", ".join(f"count(*) FILTER (WHERE oct = {k}) AS o{k}" for k in range(8))},
           count(*) FILTER (WHERE oct = 8) AS n_zero,
           CAST(sum(abs(gx) + abs(gy)) AS BIGINT) AS l1_energy
    FROM o GROUP BY 1 ORDER BY 1
    """,
)
def hog_octant_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient-orientation histogram (the HOG/edge-direction feature)
    made EXACT-INTEGER: central-difference gradients of the gray sum
    over interior pixels, classified into 8 orientation octants with
    the rotation trick — negate into the upper half (+4), rotate into
    the right quadrant (+2), compare |components| for the final bit
    (+1) — pure comparisons, no atan2, boundary ties pinned (verified
    against atan2 sectors off the 45-degree boundaries). Per image:
    the 8 octant counts, zero-gradient count and L1 gradient energy.
    Spark computes gradients vectorized per decoded image; the oracle
    expands the same differences from the pixel closed form and
    replays the nested-CASE rotation."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _hog(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2)
                gx = t[1:-1, 2:] - t[1:-1, :-2]
                gy = t[2:, 1:-1] - t[:-2, 1:-1]
                gx, gy = gx.ravel(), gy.ravel()
                zero = (gx == 0) & (gy == 0)
                o4 = np.where(gy < 0, 4, 0)
                g1x = np.where(gy < 0, -gx, gx)
                g1y = np.where(gy < 0, -gy, gy)
                o2 = np.where(g1x <= 0, 2, 0)
                g2x = np.where(g1x <= 0, g1y, g1x)
                g2y = np.where(g1x <= 0, -g1x, g1y)
                oc = np.where(zero, 8, o4 + o2 + (g2y > g2x))
                hist = np.bincount(oc, minlength=9)
                out.append(
                    (row.image_id, *[int(hist[k]) for k in range(9)],
                     int((np.abs(gx) + np.abs(gy)).sum()))
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["image_id"] + [f"o{k}" for k in range(8)]
                    + ["n_zero", "l1_energy"],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _hog,
            "image_id string, "
            + ", ".join(f"o{k} long" for k in range(8))
            + ", n_zero long, l1_energy long",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ Bayer dither

_BAYER = [
    [0, 8, 2, 10],
    [12, 4, 14, 6],
    [3, 11, 1, 9],
    [15, 7, 13, 5],
]


@register_extra(
    "bayer_dither_stats",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    bay(my, mx, m) AS (VALUES {", ".join(
        f"({i}, {j}, {v})" for i, row in enumerate(_BAYER)
        for j, v in enumerate(row))}),
    px AS (
      SELECT e.event_id, x, y,
             CASE WHEN 32 * (((x*7 + e.event_id*13) % 256)
                           + ((y*11 + e.event_id*29) % 256)
                           + (((x+y)*5 + e.event_id*53) % 256))
                       >= (2 * bay.m + 1) * 766
                  THEN 1 ELSE 0 END AS onb
      FROM e CROSS JOIN yx
      JOIN bay ON bay.my = y % 4 AND bay.mx = x % 4
    ),
    tr AS (
      SELECT event_id, y, x, onb,
             lag(onb) OVER (PARTITION BY event_id, y ORDER BY x) AS prev
      FROM px
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           CAST(sum(onb) AS BIGINT) AS n_on,
           count(*) FILTER (WHERE prev IS NOT NULL AND onb <> prev)
             AS row_transitions
    FROM tr GROUP BY 1 ORDER BY 1
    """,
)
def bayer_dither_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered (Bayer 4x4) dithering through the decode path — the
    deterministic halftoning used by 1-bit displays and print
    pipelines (error-diffusion dithers are sequential; the ordered
    matrix is the data-parallel one). A pixel turns on iff
    32*gray >= (2*M[y%4][x%4] + 1) * 766 — exact integer threshold,
    shared matrix literals. Per image: on-pixel count and horizontal
    on/off transitions (the pattern-frequency proxy print QA uses).
    Spark dithers vectorized per image via a tiled matrix compare;
    the oracle joins a 16-row VALUES matrix and counts transitions
    with a per-row lag window."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)
    bay = np.array(_BAYER, np.int64)

    def _dither(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2)
                h, w = t.shape
                m = np.tile(bay, (h // 4, w // 4))
                on = (32 * t >= (2 * m + 1) * 766).astype(np.int8)
                trans = int((np.diff(on, axis=1) != 0).sum())
                out.append((row.image_id, int(on.sum()), trans))
            if out:
                yield pd.DataFrame(
                    out, columns=["image_id", "n_on", "row_transitions"]
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _dither,
            "image_id string, n_on long, row_transitions long",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ gray world


@register_extra(
    "gray_world_gains",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    px AS (
      SELECT e.event_id,
             (x*7 + e.event_id*13) % 256 AS r,
             (y*11 + e.event_id*29) % 256 AS g,
             ((x+y)*5 + e.event_id*53) % 256 AS b
      FROM e CROSS JOIN yx
    ),
    s AS (
      SELECT event_id, CAST(sum(r) AS BIGINT) AS sr,
             CAST(sum(g) AS BIGINT) AS sg, CAST(sum(b) AS BIGINT) AS sb
      FROM px GROUP BY 1
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           CAST((sr + sg + sb) * 1000000 // (3 * sr) AS BIGINT)
             AS gain_r_e6,
           CAST((sr + sg + sb) * 1000000 // (3 * sg) AS BIGINT)
             AS gain_g_e6,
           CAST((sr + sg + sb) * 1000000 // (3 * sb) AS BIGINT)
             AS gain_b_e6,
           CASE WHEN sr >= sg AND sr >= sb THEN 'r'
                WHEN sg >= sb THEN 'g' ELSE 'b' END AS dominant
    FROM s ORDER BY image_id
    """,
)
def gray_world_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gray-world white-balance gains through the decode path — the
    auto-white-balance estimate every camera pipeline computes: per
    channel, gain = mean_gray / mean_channel, here as the EXACT e-6
    floor-quantized integer (sr+sg+sb)*1e6 // (3*s_ch) (channel sums
    are never zero on this corpus; a production guard would clamp).
    The dominant-cast class (ties r > g > b) gives a hash-exact
    categorical output too. Pure map-side: one sum-triple per image."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _gw(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                sr = int(px[:, :, 0].sum())
                sg = int(px[:, :, 1].sum())
                sb = int(px[:, :, 2].sum())
                t = sr + sg + sb
                dom = (
                    "r"
                    if sr >= sg and sr >= sb
                    else ("g" if sg >= sb else "b")
                )
                out.append(
                    (
                        row.image_id,
                        t * 1000000 // (3 * sr),
                        t * 1000000 // (3 * sg),
                        t * 1000000 // (3 * sb),
                        dom,
                    )
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "image_id", "gain_r_e6", "gain_g_e6",
                        "gain_b_e6", "dominant",
                    ],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _gw,
            "image_id string, gain_r_e6 long, gain_g_e6 long,"
            " gain_b_e6 long, dominant string",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ BTC blocks


@register_extra(
    "btc_block_stats",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    px AS (
      SELECT e.event_id, x, y, x // 4 AS bx, y // 4 AS by,
             ((x*7 + e.event_id*13) % 256)
           + ((y*11 + e.event_id*29) % 256)
           + (((x+y)*5 + e.event_id*53) % 256) AS t
      FROM e CROSS JOIN yx
    ),
    bs AS (
      SELECT event_id, bx, by, CAST(sum(t) AS BIGINT) AS blocksum
      FROM px GROUP BY 1, 2, 3
    ),
    blk AS (
      SELECT p.event_id, p.bx, p.by, b.blocksum,
             CAST(count(*) FILTER (WHERE 16 * p.t >= b.blocksum)
                  AS BIGINT) AS nh,
             CAST(sum(p.t) FILTER (WHERE 16 * p.t >= b.blocksum)
                  AS BIGINT) AS sum_hi
      FROM px p JOIN bs b
        ON b.event_id = p.event_id AND b.bx = p.bx AND b.by = p.by
      GROUP BY 1, 2, 3, 4
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           count(*) FILTER (WHERE nh = 16) AS n_flat,
           CAST(sum(nh) AS BIGINT) AS sum_nh,
           CAST(sum(16 * sum_hi - nh * blocksum) AS BIGINT)
             AS spread_num
    FROM blk GROUP BY 1 ORDER BY 1
    """,
)
def btc_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block truncation coding (BTC) statistics per decoded image —
    the classic 4x4-block 1-bit compression: a pixel codes high iff
    16*t >= blocksum (i.e. >= the block mean, EXACTLY, no division),
    flat blocks are those where every pixel ties the mean (all-equal
    blocks), and spread_num = sum over blocks of 16*sum_hi -
    nh*blocksum — 16 x the total high-side deviation mass, the
    integer form of BTC's reconstruction contrast. Completes the
    compression-structure probe set (RLE runs, quadtree, Haar energy,
    LZ matches, dither transitions). Spark: one reshape pass per
    image; oracle: block sums joined back to pixels."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _btc(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2)
                n = t.shape[0] // 4
                blk = t.reshape(n, 4, n, 4)
                bsum = blk.sum(axis=(1, 3))
                hi = 16 * blk >= bsum[:, None, :, None]
                nh = hi.sum(axis=(1, 3))
                sum_hi = (blk * hi).sum(axis=(1, 3))
                spread = (16 * sum_hi - nh * bsum).sum()
                out.append(
                    (
                        row.image_id,
                        int((nh == 16).sum()),
                        int(nh.sum()),
                        int(spread),
                    )
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["image_id", "n_flat", "sum_nh", "spread_num"],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _btc,
            "image_id string, n_flat long, sum_nh long, spread_num long",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ edge NMS

_NMS_T = 100000  # keep strong edges: gx^2 + gy^2 > T


@register_extra(
    "edge_nms_thinning",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range(1, {_OTSU_SZ - 1}) y, range(1, {_OTSU_SZ - 1}) x),
    g AS (
      SELECT e.event_id, x, y,
             (((x+1)*7 + e.event_id*13) % 256)
           + ((y*11 + e.event_id*29) % 256)
           + (((x+1+y)*5 + e.event_id*53) % 256)
           - (((x-1)*7 + e.event_id*13) % 256)
           - ((y*11 + e.event_id*29) % 256)
           - (((x-1+y)*5 + e.event_id*53) % 256) AS gx,
             ((x*7 + e.event_id*13) % 256)
           + (((y+1)*11 + e.event_id*29) % 256)
           + (((x+y+1)*5 + e.event_id*53) % 256)
           - ((x*7 + e.event_id*13) % 256)
           - (((y-1)*11 + e.event_id*29) % 256)
           - (((x+y-1)*5 + e.event_id*53) % 256) AS gy
      FROM e CROSS JOIN yx
    ),
    m AS (
      SELECT event_id, x, y, gx*gx + gy*gy AS m2,
             abs(gx) >= abs(gy) AS horiz
      FROM g
    ),
    keep AS (
      SELECT p.event_id, p.x, p.y
      FROM m p
      LEFT JOIN m a ON a.event_id = p.event_id
        AND ((p.horiz AND a.y = p.y AND a.x = p.x - 1)
          OR (NOT p.horiz AND a.x = p.x AND a.y = p.y - 1))
      LEFT JOIN m b ON b.event_id = p.event_id
        AND ((p.horiz AND b.y = p.y AND b.x = p.x + 1)
          OR (NOT p.horiz AND b.x = p.x AND b.y = p.y + 1))
      WHERE p.m2 > {_NMS_T}
        AND p.m2 > COALESCE(a.m2, -1) AND p.m2 > COALESCE(b.m2, -1)
    )
    SELECT 'img_' || lpad(CAST(m.event_id AS VARCHAR), 9, '0') AS image_id,
           count(*) FILTER (WHERE m.m2 > {_NMS_T}) AS n_strong,
           CAST((SELECT count(*) FROM keep k
                 WHERE k.event_id = m.event_id) AS BIGINT) AS n_after_nms
    FROM m GROUP BY m.event_id ORDER BY image_id
    """,
)
def edge_nms_thinning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient-aligned non-maximum suppression (the Canny thinning
    stage) in exact integers: strong edge pixels (gx^2 + gy^2 >
    100000) survive only if STRICTLY larger than both neighbors along
    the dominant gradient axis (|gx| >= |gy| -> horizontal, ties
    suppress — deterministic; missing neighbors at the interior
    boundary compare against -1, i.e. never suppress). Per image:
    strong-edge count before and after thinning — the edge-density
    pair a sharpness/quality curator uses. Spark: vectorized shifted
    compares per image; oracle: neighbor LEFT JOINs over the gradient
    closed form — join-based vs shift-based derivations."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _nms(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2)
                gx = t[1:-1, 2:] - t[1:-1, :-2]
                gy = t[2:, 1:-1] - t[:-2, 1:-1]
                m2 = gx * gx + gy * gy
                horiz = np.abs(gx) >= np.abs(gy)
                pad = np.full(
                    (m2.shape[0] + 2, m2.shape[1] + 2), -1, np.int64
                )
                pad[1:-1, 1:-1] = m2
                left = pad[1:-1, :-2]
                right = pad[1:-1, 2:]
                up = pad[:-2, 1:-1]
                down = pad[2:, 1:-1]
                na = np.where(horiz, left, up)
                nb = np.where(horiz, right, down)
                strong = m2 > _NMS_T
                keep = strong & (m2 > na) & (m2 > nb)
                out.append(
                    (row.image_id, int(strong.sum()), int(keep.sum()))
                )
            if out:
                yield pd.DataFrame(
                    out, columns=["image_id", "n_strong", "n_after_nms"]
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _nms,
            "image_id string, n_strong long, n_after_nms long",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ LBP

# 8-neighborhood in fixed bit order (E, SE, S, SW, W, NW, N, NE) —
# the oracle's VALUES table lists the same (dx, dy, bit) triples.
_LBP_OFF = [
    (1, 0, 1), (1, 1, 2), (0, 1, 4), (-1, 1, 8),
    (-1, 0, 16), (-1, -1, 32), (0, -1, 64), (1, -1, 128),
]
# circular bit-transition count per 8-bit code: popcount(c XOR rol(c,1))
_LBP_TRANS = np.array(
    [bin((c ^ ((c << 1 | c >> 7) & 255)) & 255).count("1") for c in range(256)],
    dtype=np.int64,
)


@register_extra(
    "lbp_texture_stats",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    px AS (
      SELECT e.event_id, x, y,
             ((x*7 + e.event_id*13) % 256)
           + ((y*11 + e.event_id*29) % 256)
           + (((x+y)*5 + e.event_id*53) % 256) AS t
      FROM e CROSS JOIN yx
    ),
    off(dx, dy, bit) AS (VALUES
      (1,0,1),(1,1,2),(0,1,4),(-1,1,8),
      (-1,0,16),(-1,-1,32),(0,-1,64),(1,-1,128)),
    code AS (
      SELECT c.event_id, c.x, c.y,
             CAST(sum(CASE WHEN n.t >= c.t THEN o.bit ELSE 0 END) AS BIGINT)
               AS code
      FROM px c
      CROSS JOIN off o
      JOIN px n ON n.event_id = c.event_id
               AND n.x = c.x + o.dx AND n.y = c.y + o.dy
      WHERE c.x BETWEEN 1 AND {_OTSU_SZ - 2}
        AND c.y BETWEEN 1 AND {_OTSU_SZ - 2}
      GROUP BY 1, 2, 3
    ),
    tr AS (
      SELECT event_id, code,
               abs((code // 1) % 2 - (code // 2) % 2)
             + abs((code // 2) % 2 - (code // 4) % 2)
             + abs((code // 4) % 2 - (code // 8) % 2)
             + abs((code // 8) % 2 - (code // 16) % 2)
             + abs((code // 16) % 2 - (code // 32) % 2)
             + abs((code // 32) % 2 - (code // 64) % 2)
             + abs((code // 64) % 2 - (code // 128) % 2)
             + abs((code // 128) % 2 - (code // 1) % 2) AS transitions
      FROM code
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           count(*) FILTER (WHERE transitions <= 2) AS n_uniform,
           CAST(count(DISTINCT code) AS BIGINT) AS n_codes,
           CAST(sum(code) AS BIGINT) AS code_sum
    FROM tr GROUP BY 1 ORDER BY image_id
    """,
)
def lbp_texture_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Binary Pattern texture descriptor per image through the
    REAL decode path: each interior pixel gets the 8-bit code whose
    bit i is set iff neighbor i's channel-sum gray >= center (fixed
    E,SE,..,NE bit order). Reports the classic texture summary —
    uniform-pattern count (<= 2 circular bit transitions, the
    Ojala-style uniform set that covers ~90% of natural texture),
    distinct-code count, and the exact integer code sum. Spark:
    vectorized shifted compares + a 256-entry transition LUT; oracle:
    an (dx,dy,bit) VALUES-table join with the transition count spelled
    out as the 8-term circular |bit_i - bit_{i+1}| sum — LUT-free
    independent derivation, everything exact integers."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _lbp(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2)
                h, w = t.shape
                c = t[1:-1, 1:-1]
                code = np.zeros_like(c)
                for dx, dy, bit in _LBP_OFF:
                    n = t[1 + dy : h - 1 + dy, 1 + dx : w - 1 + dx]
                    code += bit * (n >= c)
                tr = _LBP_TRANS[code]
                out.append(
                    (
                        row.image_id,
                        int((tr <= 2).sum()),
                        int(np.unique(code).size),
                        int(code.sum()),
                    )
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["image_id", "n_uniform", "n_codes", "code_sum"],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _lbp,
            "image_id string, n_uniform long, n_codes long, code_sum long",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ Harris


@register_extra(
    "harris_corner_stats",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    px AS (
      SELECT e.event_id, x, y,
             ((x*7 + e.event_id*13) % 256)
           + ((y*11 + e.event_id*29) % 256)
           + (((x+y)*5 + e.event_id*53) % 256) AS t
      FROM e CROSS JOIN yx
    ),
    g AS (
      SELECT c.event_id, c.x, c.y, ee.t - ww.t AS gx, ss.t - nn.t AS gy
      FROM px c
      JOIN px ee ON ee.event_id = c.event_id AND ee.x = c.x + 1 AND ee.y = c.y
      JOIN px ww ON ww.event_id = c.event_id AND ww.x = c.x - 1 AND ww.y = c.y
      JOIN px ss ON ss.event_id = c.event_id AND ss.x = c.x AND ss.y = c.y + 1
      JOIN px nn ON nn.event_id = c.event_id AND nn.x = c.x AND nn.y = c.y - 1
      WHERE c.x BETWEEN 1 AND {_OTSU_SZ - 2}
        AND c.y BETWEEN 1 AND {_OTSU_SZ - 2}
    ),
    w3 AS (
      SELECT c.event_id, c.x, c.y,
             sum(n.gx * n.gx) AS sxx, sum(n.gy * n.gy) AS syy,
             sum(n.gx * n.gy) AS sxy
      FROM g c JOIN g n ON n.event_id = c.event_id
        AND n.x BETWEEN c.x - 1 AND c.x + 1
        AND n.y BETWEEN c.y - 1 AND c.y + 1
      WHERE c.x BETWEEN 2 AND {_OTSU_SZ - 3}
        AND c.y BETWEEN 2 AND {_OTSU_SZ - 3}
      GROUP BY 1, 2, 3
    ),
    r AS (
      SELECT event_id,
             20*(sxx*syy - sxy*sxy) - (sxx+syy)*(sxx+syy) AS r
      FROM w3
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           count(*) FILTER (WHERE r > 0) AS n_corner,
           CAST(max(r) AS BIGINT) AS max_r,
           CAST(sum(r) AS BIGINT) AS sum_r
    FROM r GROUP BY 1 ORDER BY image_id
    """,
)
def harris_corner_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harris corner response in exact integers: central-difference
    gradients of channel-sum gray, structure tensor summed over a 3x3
    box window, response R = 20*(Sxx*Syy - Sxy^2) - (Sxx+Syy)^2 (the
    classic k = 0.05 scaled to integers by 20). Per image: count of
    corner-like pixels (R > 0), max response, exact sum. Bounds:
    |grad| <= 765 so Sxx <= 9*765^2 ~ 5.3e6, |R| <= 5.6e14 and the
    784-pixel sum <= 4.4e17 — int64-safe. Spark: 9-slice vectorized
    box sums after decode; oracle: 4-way neighbor join for gradients
    then a BETWEEN self-join window sum — convolution-free independent
    derivation."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _harris(batches):
        def box3(a):
            return (
                a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:]
                + a[1:-1, :-2] + a[1:-1, 1:-1] + a[1:-1, 2:]
                + a[2:, :-2] + a[2:, 1:-1] + a[2:, 2:]
            )

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2)
                gx = t[1:-1, 2:] - t[1:-1, :-2]
                gy = t[2:, 1:-1] - t[:-2, 1:-1]
                sxx, syy, sxy = box3(gx * gx), box3(gy * gy), box3(gx * gy)
                r = 20 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
                out.append(
                    (
                        row.image_id,
                        int((r > 0).sum()),
                        int(r.max()),
                        int(r.sum()),
                    )
                )
            if out:
                yield pd.DataFrame(
                    out, columns=["image_id", "n_corner", "max_r", "sum_r"]
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _harris,
            "image_id string, n_corner long, max_r long, sum_r long",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ seam DP

_SEAM_N = _OTSU_SZ - 2  # 30x30 interior energy grid


def _seam_oracle() -> str:
    """Unrolled 30-level DP: level i takes the windowed 3-neighbor min
    of level i-1 (lag/lead over x per image) + the row-i energy."""
    big = 1 << 60
    lvl = []
    for i in range(1, _SEAM_N):
        lvl.append(f"""
    c{i} AS (
      SELECT en.event_id, en.x, en.e + m.mn AS cost
      FROM en JOIN (
        SELECT event_id, x,
               least(coalesce(lag(cost) OVER w, {big}), cost,
                     coalesce(lead(cost) OVER w, {big})) AS mn
        FROM c{i - 1}
        WINDOW w AS (PARTITION BY event_id ORDER BY x)
      ) m ON m.event_id = en.event_id AND m.x = en.x
      WHERE en.r = {i}
    )""")
    return f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range({_OTSU_SZ}) y, range({_OTSU_SZ}) x),
    px AS (
      SELECT e.event_id, x, y,
             ((x*7 + e.event_id*13) % 256)
           + ((y*11 + e.event_id*29) % 256)
           + (((x+y)*5 + e.event_id*53) % 256) AS t
      FROM e CROSS JOIN yx
    ),
    en AS (
      SELECT c.event_id, c.x - 1 AS x, c.y - 1 AS r,
             abs(ee.t - ww.t) + abs(ss.t - nn.t) AS e
      FROM px c
      JOIN px ee ON ee.event_id = c.event_id AND ee.x = c.x + 1 AND ee.y = c.y
      JOIN px ww ON ww.event_id = c.event_id AND ww.x = c.x - 1 AND ww.y = c.y
      JOIN px ss ON ss.event_id = c.event_id AND ss.x = c.x AND ss.y = c.y + 1
      JOIN px nn ON nn.event_id = c.event_id AND nn.x = c.x AND nn.y = c.y - 1
      WHERE c.x BETWEEN 1 AND {_OTSU_SZ - 2}
        AND c.y BETWEEN 1 AND {_OTSU_SZ - 2}
    ),
    c0 AS (SELECT event_id, x, CAST(e AS BIGINT) AS cost FROM en WHERE r = 0),
    {",".join(lvl)}
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           min(cost) AS seam_cost,
           CAST(min(CASE WHEN cost = mc THEN x END) AS INT) AS seam_end_x
    FROM (
      SELECT event_id, x, cost,
             min(cost) OVER (PARTITION BY event_id) AS mc
      FROM c{_SEAM_N - 1}
    )
    GROUP BY event_id ORDER BY image_id
    """


@register_extra("min_energy_seam", _seam_oracle())
def min_energy_seam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seam carving's DP core (Avidan-Shamir): per image, the minimum
    cumulative-energy vertical 8-connected seam through the 30x30
    interior energy map e = |gx| + |gy| (central differences of
    channel-sum gray) — cost(r,x) = e(r,x) + min of the 3 upper
    neighbors. Reports the optimal seam cost and its bottom-row column
    (tie -> smallest x). Exact integers; Spark runs the vectorized
    row-sweep DP per image inside the decode pass (the per-row
    3-neighbor min is two shifted np.minimum calls), the oracle unrolls
    all 30 DP levels as window-min CTEs — recursion-free independent
    derivation of the same Bellman sweep."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _seam(batches):
        big = 1 << 60
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2)
                gx = t[1:-1, 2:] - t[1:-1, :-2]
                gy = t[2:, 1:-1] - t[:-2, 1:-1]
                e = np.abs(gx) + np.abs(gy)
                cost = e[0].copy()
                for r in range(1, e.shape[0]):
                    left = np.concatenate(([big], cost[:-1]))
                    right = np.concatenate((cost[1:], [big]))
                    cost = e[r] + np.minimum(np.minimum(left, cost), right)
                best = int(cost.min())
                out.append((row.image_id, best, int(np.argmin(cost))))
            if out:
                yield pd.DataFrame(
                    out, columns=["image_id", "seam_cost", "seam_end_x"]
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _seam,
            "image_id string, seam_cost long, seam_end_x int",
        )
        .orderBy("image_id")
    )


# ----------------------------------------------------- block motion

_BM_LO, _BM_HI = 8, 23  # 16x16 central patch
_BM_R = 2  # shift radius


@register_extra(
    "block_motion_search",
    f"""
    WITH e AS (SELECT event_id FROM events WHERE event_id % {_OTSU_EVERY} = 0),
    pairs AS (
      SELECT a.event_id AS ida, b.event_id AS idb
      FROM e a JOIN e b ON b.event_id = a.event_id + {_OTSU_EVERY}
    ),
    sh AS (SELECT dx.range - {_BM_R} AS dx, dy.range - {_BM_R} AS dy
           FROM range({2 * _BM_R + 1}) dx, range({2 * _BM_R + 1}) dy),
    patch AS (SELECT y.range AS y, x.range AS x
              FROM range({_BM_LO}, {_BM_HI + 1}) y,
                   range({_BM_LO}, {_BM_HI + 1}) x),
    sad AS (
      SELECT p.ida, s.dx, s.dy,
             CAST(sum(abs(
               (((g.x*7 + p.ida*13) % 256)
              + ((g.y*11 + p.ida*29) % 256)
              + (((g.x+g.y)*5 + p.ida*53) % 256))
             - ((((g.x+s.dx)*7 + p.idb*13) % 256)
              + (((g.y+s.dy)*11 + p.idb*29) % 256)
              + (((g.x+s.dx+g.y+s.dy)*5 + p.idb*53) % 256))
             )) AS BIGINT) AS sad
      FROM pairs p CROSS JOIN sh s CROSS JOIN patch g
      GROUP BY 1, 2, 3
    ),
    best AS (
      SELECT ida, dx, dy, sad,
             row_number() OVER (PARTITION BY ida
                                ORDER BY sad, dy, dx) AS rn
      FROM sad
    )
    SELECT 'img_' || lpad(CAST(ida AS VARCHAR), 9, '0') AS image_id,
           CAST(dx AS INT) AS dx, CAST(dy AS INT) AS dy, sad AS sad_min
    FROM best WHERE rn = 1 ORDER BY image_id
    """,
)
def block_motion_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block motion estimation (the MPEG/H.26x motion-search kernel):
    for each consecutive kept-image pair, exhaustively search integer
    shifts (dx, dy) in [-2, 2]^2 for the one minimizing the sum of
    absolute differences of channel-sum gray over the central 16x16
    patch (tie -> smallest dy then dx). Exact integers. Spark decodes
    both frames of each pair once (self-join on event id + stride) and
    evaluates all 25 shifts vectorized; the oracle expands the full
    (pair x shift x pixel) grid from the two pixel closed forms —
    decode-free independent derivation. Scale shape: the pair join is
    an equi-join on id+stride (co-partitioned), and per-pair work is
    constant (25 SADs), so the plan is one shuffle regardless of
    corpus size."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)
    withid = imgs.select(
        F.expr("cast(substring(image_id, 5) as long)").alias("eid"),
        "image_id",
        "bytes",
        "fmt",
    )
    a = withid.select(
        F.col("eid"), "image_id",
        F.col("bytes").alias("ba"), F.col("fmt").alias("fa"),
    )
    b = withid.select(
        (F.col("eid") - _OTSU_EVERY).alias("eid"),
        F.col("bytes").alias("bb"), F.col("fmt").alias("fb"),
    )
    pairs = a.join(b, "eid")

    def _bm(batches):
        lo, hi, r = _BM_LO, _BM_HI, _BM_R
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                ta = (
                    ic.decode_image(bytes(row.ba), row.fa)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                tb = (
                    ic.decode_image(bytes(row.bb), row.fb)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                pa = ta[lo : hi + 1, lo : hi + 1]
                best = None
                for dy in range(-r, r + 1):
                    for dx in range(-r, r + 1):
                        pb = tb[lo + dy : hi + 1 + dy, lo + dx : hi + 1 + dx]
                        sad = int(np.abs(pa - pb).sum())
                        key = (sad, dy, dx)
                        if best is None or key < best:
                            best = key
                out.append((row.image_id, best[2], best[1], best[0]))
            if out:
                yield pd.DataFrame(
                    out, columns=["image_id", "dx", "dy", "sad_min"]
                )

    return (
        pairs.select("image_id", "ba", "fa", "bb", "fb")
        .mapInPandas(
            _bm, "image_id string, dx int, dy int, sad_min long"
        )
        .orderBy("image_id")
    )


# --------------------------------------------------- Euler number

_EU_RASTERS = [("eu2", 64, 10, 2), ("eu3", 64, 10, 3)]


def _euler_oracle() -> str:
    """Components-minus-holes derivation: fg 4-adjacency min-label
    closure for C; bg 8-adjacency border flood, then a closure over the
    unreached (hole) pixels for H. Independent of the quad-count
    theorem the Spark side uses."""
    parts = []
    for tag, n, mod, lt in _EU_RASTERS:
        parts.append(f"""
    SELECT '{tag}' AS raster, n_fg, euler FROM (
      WITH RECURSIVE px AS (
        SELECT x.range AS gx, y.range AS gy,
               y.range * {n} + x.range AS gid
        FROM range({n}) x, range({n}) y
        WHERE ('0x' || substr(md5('{tag}:' || x.range || ':' || y.range),
                              1, 4))::INT % {mod} < {lt}
      ),
      e AS (
        SELECT a.gid AS s, b.gid AS d
        FROM px a JOIN px b
          ON (b.gx = a.gx + 1 AND b.gy = a.gy)
          OR (b.gx = a.gx AND b.gy = a.gy + 1)
      ),
      sym AS (SELECT s, d FROM e UNION SELECT d, s FROM e),
      reach(a, b) AS (
        SELECT gid, gid FROM px
        UNION
        SELECT r.a, s.d FROM reach r JOIN sym s ON s.s = r.b
      ),
      comp AS (SELECT count(DISTINCT mn) AS c FROM (
        SELECT a, min(b) AS mn FROM reach GROUP BY a)),
      bg AS (
        SELECT x.range AS gx, y.range AS gy,
               y.range * {n} + x.range AS gid
        FROM range({n}) x, range({n}) y
        WHERE NOT (('0x' || substr(md5('{tag}:' || x.range || ':'
                                       || y.range), 1, 4))::INT
                   % {mod} < {lt})
      ),
      be AS (
        SELECT a.gid AS s, b.gid AS d
        FROM bg a JOIN bg b
          ON abs(b.gx - a.gx) <= 1 AND abs(b.gy - a.gy) <= 1
         AND b.gid <> a.gid
      ),
      flood(gid) AS (
        SELECT gid FROM bg
        WHERE gx = 0 OR gy = 0 OR gx = {n - 1} OR gy = {n - 1}
        UNION
        SELECT be.d FROM flood f JOIN be ON be.s = f.gid
      ),
      hole_px AS (
        SELECT gid, gx, gy FROM bg
        WHERE gid NOT IN (SELECT gid FROM flood)
      ),
      he AS (
        SELECT a.gid AS s, b.gid AS d
        FROM hole_px a JOIN hole_px b
          ON abs(b.gx - a.gx) <= 1 AND abs(b.gy - a.gy) <= 1
         AND b.gid <> a.gid
      ),
      hreach(a, b) AS (
        SELECT gid, gid FROM hole_px
        UNION
        SELECT r.a, s.d FROM hreach r JOIN he s ON s.s = r.b
      ),
      holes AS (SELECT count(DISTINCT mn) AS h FROM (
        SELECT a, min(b) AS mn FROM hreach GROUP BY a)),
      nfg AS (SELECT count(*) AS n_fg FROM px)
      SELECT CAST(nfg.n_fg AS BIGINT) AS n_fg,
             CAST(comp.c - holes.h AS BIGINT) AS euler
      FROM nfg, comp, holes
    )""")
    return " UNION ALL ".join(parts) + " ORDER BY raster"


@register_extra("euler_number_rasters", _euler_oracle())
def euler_number_rasters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euler number (components minus holes) of md5-noise binary
    rasters, computed two fundamentally different ways: Spark uses
    GRAY'S QUAD-COUNT THEOREM — for 4-connected foreground,
    E = (Q1 - Q3 + 2*Qd)/4 over all 2x2 windows of the zero-padded
    raster (Q1/Q3 = windows with one/three fg pixels, Qd = diagonal
    pairs) — a PURELY LOCAL one-pass count with partial-aggregable
    sums, i.e. the topology statistic that needs NO connectivity
    analysis at 100 TB raster scale (validated against flood-fill
    ground truth in this session); the oracle counts fg 4-adjacent
    components and subtracts bg-8-adjacent components not reachable
    from the border (holes), the textbook topological definition.
    The engines agreeing IS the theorem."""
    specs = spark.createDataFrame(
        [(t, n, m, lt) for t, n, m, lt in _EU_RASTERS],
        "tag string, n int, mod int, lt int",
    ).repartition(2)

    def _euler(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                m = np.zeros((row.n, row.n), np.int64)
                for y in range(row.n):
                    for x in range(row.n):
                        hh = hashlib.md5(
                            f"{row.tag}:{x}:{y}".encode()
                        ).hexdigest()
                        m[y, x] = 1 if int(hh[:4], 16) % row.mod < row.lt else 0
                p = np.zeros((row.n + 2, row.n + 2), np.int64)
                p[1:-1, 1:-1] = m
                a, b = p[:-1, :-1], p[:-1, 1:]
                c, d = p[1:, :-1], p[1:, 1:]
                s = a + b + c + d
                q1 = int((s == 1).sum())
                q3 = int((s == 3).sum())
                qd = int(((s == 2) & (a == d) & (a != b)).sum())
                out.append((row.tag, int(m.sum()), (q1 - q3 + 2 * qd) // 4))
            if out:
                yield pd.DataFrame(out, columns=["raster", "n_fg", "euler"])

    return (
        specs.mapInPandas(_euler, "raster string, n_fg long, euler long")
        .orderBy("raster")
    )


# --------------------------------------------- distance transform

_DT_TAG, _DT_N, _DT_MOD, _DT_LT = "eu3", 64, 10, 3


@register_extra(
    "distance_transform_hist",
    f"""
    WITH px AS (
      SELECT x.range AS gx, y.range AS gy,
             (('0x' || substr(md5('{_DT_TAG}:' || x.range || ':'
                                  || y.range), 1, 4))::INT
              % {_DT_MOD} < {_DT_LT}) AS fg
      FROM range({_DT_N}) x, range({_DT_N}) y
    ),
    f AS (SELECT gx, gy FROM px WHERE fg),
    d AS (
      SELECT p.gx, p.gy,
             CASE WHEN p.fg THEN 0
                  ELSE (SELECT min(abs(f.gx - p.gx) + abs(f.gy - p.gy))
                        FROM f) END AS dist
      FROM px p
    )
    SELECT CAST(dist AS INT) AS dist, count(*) AS n_pixels
    FROM d GROUP BY 1 ORDER BY dist
    """,
)
def distance_transform_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 (city-block) distance transform of a binary raster — the
    morphology/watershed primitive: every pixel's distance to the
    nearest foreground site, reported as the distance histogram. Spark
    runs the classic TWO-PASS chamfer sweep (forward raster scan
    propagating min(left, up)+1, backward scan propagating
    min(right, down)+1 — linear in pixels, the only shape that
    scales); the oracle brute-forces min over all foreground sites per
    pixel — O(n^2) but unimpeachable. Exact integers; the sweeps
    being equal to the true metric is the chamfer correctness
    theorem for L1."""
    specs = spark.createDataFrame(
        [(_DT_TAG, _DT_N, _DT_MOD, _DT_LT)],
        "tag string, n int, mod int, lt int",
    )

    def _dt(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                m = np.zeros((row.n, row.n), np.int64)
                for y in range(row.n):
                    for x in range(row.n):
                        hh = hashlib.md5(
                            f"{row.tag}:{x}:{y}".encode()
                        ).hexdigest()
                        m[y, x] = 1 if int(hh[:4], 16) % row.mod < row.lt else 0
                big = 1 << 30
                d = np.where(m == 1, 0, big)
                for y in range(row.n):  # forward sweep
                    for x in range(row.n):
                        if x > 0:
                            d[y, x] = min(d[y, x], d[y, x - 1] + 1)
                        if y > 0:
                            d[y, x] = min(d[y, x], d[y - 1, x] + 1)
                for y in range(row.n - 1, -1, -1):  # backward sweep
                    for x in range(row.n - 1, -1, -1):
                        if x < row.n - 1:
                            d[y, x] = min(d[y, x], d[y, x + 1] + 1)
                        if y < row.n - 1:
                            d[y, x] = min(d[y, x], d[y + 1, x] + 1)
                vals, cnts = np.unique(d, return_counts=True)
                yield pd.DataFrame(
                    {"dist": vals.astype("int32"), "n": cnts.astype("int64")}
                )

    return (
        specs.mapInPandas(_dt, "dist int, n long")
        .groupBy("dist")
        .agg(F.sum("n").alias("n_pixels"))
        .orderBy("dist")
    )


# ------------------------------------------------------------ FAST-9

_FAST_T = 60
_FAST_OFF = [
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2),
    (-1, -3),
]


def _gray_expr(ex: str, ey: str) -> str:
    """Channel-sum gray of the synthetic pattern at (ex, ey) — the same
    closed form images.py::synth_pixels encodes and the other vision
    oracles re-derive."""
    return (
        f"((({ex})*7 + event_id*13) % 256)"
        f" + ((({ey})*11 + event_id*29) % 256)"
        f" + (((({ex})+({ey}))*5 + event_id*53) % 256)"
    )


def _fast_oracle() -> str:
    sz, t = _OTSU_SZ, _FAST_T
    sb = " || ".join(
        f"CASE WHEN {_gray_expr(f'x+{dx}', f'y+{dy}')} > p + {t}"
        " THEN '1' ELSE '0' END"
        for dx, dy in _FAST_OFF
    )
    sd = " || ".join(
        f"CASE WHEN {_gray_expr(f'x+{dx}', f'y+{dy}')} < p - {t}"
        " THEN '1' ELSE '0' END"
        for dx, dy in _FAST_OFF
    )
    run = (
        "least(coalesce(list_max(list_transform("
        "regexp_extract_all({s} || {s}, '1+'), z -> length(z))), 0), 16)"
    )
    return f"""
    WITH e AS (SELECT event_id FROM events
               WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range(3, {sz - 3}) y, range(3, {sz - 3}) x),
    px AS (
      SELECT e.event_id, x, y, {_gray_expr('x', 'y')} AS p
      FROM e CROSS JOIN yx
    ),
    fl AS (
      SELECT event_id, x, y, {sb} AS sb, {sd} AS sd FROM px
    ),
    runs AS (
      SELECT event_id,
             {run.format(s='sb')} AS rb,
             {run.format(s='sd')} AS rd
      FROM fl
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           CAST(count(*) FILTER (rb >= 9 OR rd >= 9) AS BIGINT)
             AS n_corners,
           CAST(count(*) FILTER (rb >= 9) AS BIGINT) AS n_bright,
           CAST(count(*) FILTER (rd >= 9) AS BIGINT) AS n_dark
    FROM runs GROUP BY 1 ORDER BY image_id
    """


@register_extra("fast_corner_counts", _fast_oracle())
def fast_corner_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAST-9 corner detection (Rosten-Drummond segment test — the
    detector ORB/SLAM pipelines run where Harris is too slow): a pixel
    is a corner iff >= 9 CONTIGUOUS pixels of its 16-point Bresenham
    circle are all brighter than p+T or all darker than p-T (T=60 on
    the 0..765 channel-sum scale). Exact integers; the circular-run
    test is the interesting part — Spark computes it vectorized over a
    (16, H, W) flag stack with the doubled-array running-product trick,
    the oracle builds the doubled 32-char flag string and takes the
    longest '1'-run via regexp — two genuinely independent phrasings
    of 'arc of >= 9'. Decode path is real (PNG via
    functions/imagecodec.py); per-image numpy inside mapInPandas is
    the sanctioned per-blob pattern, one Arrow crossing per batch."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)
    off = list(_FAST_OFF)
    thr = _FAST_T

    def _fast(batches):
        def maxrun(flags):
            f2 = np.concatenate([flags, flags], axis=0)
            run = np.zeros(f2.shape[1:], np.int64)
            best = np.zeros_like(run)
            for i in range(32):
                run = (run + 1) * f2[i]
                best = np.maximum(best, run)
            return np.minimum(best, 16)

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                t = (
                    ic.decode_image(bytes(row.bytes), row.fmt)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                sz = t.shape[0]
                core = t[3 : sz - 3, 3 : sz - 3]
                bright = np.zeros((16,) + core.shape, bool)
                dark = np.zeros_like(bright)
                for k, (dx, dy) in enumerate(off):
                    nb = t[3 + dy : sz - 3 + dy, 3 + dx : sz - 3 + dx]
                    bright[k] = nb > core + thr
                    dark[k] = nb < core - thr
                rb, rd = maxrun(bright), maxrun(dark)
                out.append(
                    (
                        row.image_id,
                        int(((rb >= 9) | (rd >= 9)).sum()),
                        int((rb >= 9).sum()),
                        int((rd >= 9).sum()),
                    )
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["image_id", "n_corners", "n_bright", "n_dark"],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _fast,
            "image_id string, n_corners long, n_bright long, n_dark long",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------------------ median 3x3


def _median_oracle() -> str:
    sz = _OTSU_SZ
    nine = ", ".join(
        _gray_expr(f"x+{dx}", f"y+{dy}")
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    )
    return f"""
    WITH e AS (SELECT event_id FROM events
               WHERE event_id % {_OTSU_EVERY} = 0),
    yx AS (SELECT y.range AS y, x.range AS x
           FROM range(1, {sz - 1}) y, range(1, {sz - 1}) x),
    m AS (
      SELECT e.event_id,
             list_sort([{nine}])[5] AS med,
             {_gray_expr('x', 'y')} AS c
      FROM e CROSS JOIN yx
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           CAST(count(*) FILTER (med <> c) AS BIGINT) AS n_changed,
           CAST(sum(abs(med - c)) AS BIGINT) AS sum_abs_change,
           CAST(max(abs(med - c)) AS BIGINT) AS max_change
    FROM m GROUP BY 1 ORDER BY image_id
    """


@register_extra("median_filter_stats", _median_oracle())
def median_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 grayscale median filter (the rank-order denoiser — the
    nonlinear cousin of the gated focal box means, and what a corpus
    pipeline runs against salt-and-pepper damage before feature
    extraction): per image, how many interior pixels the filter moves,
    the exact total and max absolute change. Exact integers; median of
    9 = element 5 of the sorted 9-neighborhood in both engines
    (numpy partial-sort vs list_sort[5]). Real decode path; per-image
    numpy is the sanctioned per-blob pattern."""
    imgs = im.images_df(spark, sf_dir, size=_OTSU_SZ, every=_OTSU_EVERY)

    def _med(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                t = (
                    ic.decode_image(bytes(row.bytes), row.fmt)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                sz = t.shape[0]
                stack = np.stack(
                    [
                        t[1 + dy : sz - 1 + dy, 1 + dx : sz - 1 + dx]
                        for dy in (-1, 0, 1)
                        for dx in (-1, 0, 1)
                    ]
                )
                med = np.sort(stack, axis=0)[4]
                d = np.abs(med - t[1 : sz - 1, 1 : sz - 1])
                out.append(
                    (
                        row.image_id,
                        int((d > 0).sum()),
                        int(d.sum()),
                        int(d.max()),
                    )
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "image_id", "n_changed", "sum_abs_change",
                        "max_change",
                    ],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _med,
            "image_id string, n_changed long, sum_abs_change long,"
            " max_change long",
        )
        .orderBy("image_id")
    )


# ----------------------------------------------------- template match

_TM_K, _TM_CX = 6, 13  # template size, source corner in the seed image


def _tm_gray(ex: str, ey: str, eid: str) -> str:
    """Channel-sum gray at (ex, ey) of the synthetic pattern for an
    arbitrary event-id expression (the _gray_expr form generalized so
    the TEMPLATE can come from a different seed than the image)."""
    return (
        f"((({ex})*7 + ({eid})*13) % 256)"
        f" + ((({ey})*11 + ({eid})*29) % 256)"
        f" + (((({ex})+({ey}))*5 + ({eid})*53) % 256)"
    )


def _tm_oracle() -> str:
    sz, k, c = _OTSU_SZ, _TM_K, _TM_CX
    noff = sz - k + 1
    img = _tm_gray("dx + j", "dy + i", "event_id")
    tpl = _tm_gray(f"{c} + j", f"{c} + i", "event_id + 7777")
    return f"""
    WITH e AS (SELECT event_id FROM events
               WHERE event_id % {_OTSU_EVERY} = 0),
    off AS (SELECT dy.range AS dy, dx.range AS dx
            FROM range({noff}) dy, range({noff}) dx),
    ij AS (SELECT i.range AS i, j.range AS j
           FROM range({k}) i, range({k}) j),
    terms AS (
      SELECT event_id, dy, dx, ({img}) - ({tpl}) AS d
      FROM e CROSS JOIN off CROSS JOIN ij
    ),
    ssd AS (
      SELECT event_id, dy, dx, CAST(sum(d*d) AS BIGINT) AS ssd
      FROM terms GROUP BY 1, 2, 3
    ),
    best AS (
      SELECT event_id, min(ssd*1000000 + dy*1000 + dx) AS enc
      FROM ssd GROUP BY 1
    )
    SELECT 'img_' || lpad(CAST(event_id AS VARCHAR), 9, '0') AS image_id,
           CAST(enc // 1000000 AS BIGINT) AS min_ssd,
           CAST((enc % 1000000) // 1000 AS BIGINT) AS best_dy,
           CAST(enc % 1000 AS BIGINT) AS best_dx
    FROM best ORDER BY image_id
    """


@register_extra("template_match_ssd", _tm_oracle())
def template_match_ssd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive SSD template matching — register a 6x6 grayscale
    template against every valid offset of each image and report the
    global-minimum offset (the block-registration primitive behind
    stereo disparity, fiducial detection, and classical tracking; the
    gated block-motion query searches a LOCAL window around a prior,
    this one proves the global argmin). The template comes from a
    DIFFERENT pattern seed (event_id + 7777) so the minimum is a
    nontrivial random-field optimum rather than a trivially-zero
    self-match. Exact integers end-to-end: SSD <= 36*765^2 so the
    (ssd, dy, dx) argmin packs into one BIGINT and the lexicographic
    tie-break is the same min() in both engines. Spark decodes the
    real PNG bytes and computes all 729 offsets per image in ONE numpy
    pass (sliding_window_view -> broadcast subtract -> einsum-free
    square-sum), the sanctioned per-blob pattern; the oracle recomputes
    every offset relationally from the pixel closed form."""
    sz, tk, c = _OTSU_SZ, _TM_K, _TM_CX
    imgs = im.images_df(spark, sf_dir, size=sz, every=_OTSU_EVERY)

    def _match(batches):
        jj, ii = np.meshgrid(np.arange(tk), np.arange(tk))
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                eid = int(row.image_id[4:])
                t = (
                    ic.decode_image(bytes(row.bytes), row.fmt)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                es = eid + 7777
                tpl = (
                    ((c + jj) * 7 + es * 13) % 256
                    + ((c + ii) * 11 + es * 29) % 256
                    + (((c + jj) + (c + ii)) * 5 + es * 53) % 256
                )
                win = np.lib.stride_tricks.sliding_window_view(t, (tk, tk))
                d = win - tpl
                ssd = (d * d).sum(axis=(2, 3))
                noff = ssd.shape[0]
                dyg, dxg = np.divmod(np.arange(noff * noff), noff)
                enc = ssd.ravel() * 1000000 + dyg * 1000 + dxg
                b = int(enc.min())
                out.append(
                    (
                        row.image_id,
                        b // 1000000,
                        (b % 1000000) // 1000,
                        b % 1000,
                    )
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["image_id", "min_ssd", "best_dy", "best_dx"],
                )

    return (
        imgs.select("image_id", "bytes", "fmt")
        .mapInPandas(
            _match,
            "image_id string, min_ssd long, best_dy long, best_dx long",
        )
        .orderBy("image_id")
    )


# ------------------------------------------------- summed-area table

_SAT_SZ = 96


def _sat_v(x: str, y: str, t: str = "t") -> str:
    """Closed-form integer cell value both engines share."""
    return (
        f"((({x})*13 + ({y})*7 + ({t})*11) % 31)"
        f" * ((({x}) + ({y})*3 + ({t})) % 17)"
    )


@register_extra(
    "summed_area_probes",
    f"""
    WITH probes AS (
      SELECT event_id AS pid, event_id % 6 AS t,
             ('0x' || substr(md5('sax0:' || CAST(event_id AS VARCHAR)),
                             1, 4))::BIGINT % 80 AS x0,
             ('0x' || substr(md5('say0:' || CAST(event_id AS VARCHAR)),
                             1, 4))::BIGINT % 80 AS y0,
             1 + ('0x' || substr(md5('saw:' || CAST(event_id AS VARCHAR)),
                                 1, 4))::BIGINT % 16 AS w,
             1 + ('0x' || substr(md5('sah:' || CAST(event_id AS VARCHAR)),
                                 1, 4))::BIGINT % 16 AS h
      FROM events WHERE event_id % 53 = 0
    ),
    rect AS (
      SELECT pid, t, x0, y0, least(x0 + w - 1, {_SAT_SZ - 1}) AS x1,
             least(y0 + h - 1, {_SAT_SZ - 1}) AS y1
      FROM probes
    )
    SELECT pid,
           CAST(sum({_sat_v('x.range', 'y.range')}) AS BIGINT) AS rect_sum,
           CAST(count(*) AS BIGINT) AS area
    FROM rect, range({_SAT_SZ}) x, range({_SAT_SZ}) y
    WHERE x.range BETWEEN x0 AND x1 AND y.range BETWEEN y0 AND y1
    GROUP BY pid ORDER BY pid
    """,
)
def summed_area_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summed-area table (integral image) as distributed dataflow —
    the O(1)-per-rectangle box-sum structure behind Haar features,
    box-filter pyramids and raster zonal rollups. Spark builds the SAT
    with TWO ordered window cumsums (rows along each tile row, then
    columns along each tile column — the separable 2D prefix sum; at
    scale each window partitions on (tile, line), so the shuffle keys
    are raster lines, never cells-at-large) and answers every probe
    rectangle with the 4-corner inclusion-exclusion lookup, a single
    broadcast join of signed corners. The oracle never builds a SAT:
    it sums the closed-form cells DIRECTLY over each rectangle — so
    the prefix-sum identity itself is what the gate checks. Exact
    integers; clipped rectangles keep area as the count of covered
    cells on both sides."""
    sz = _SAT_SZ
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")

    def _h(prefix: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), eid).cast("binary")), 1, 4
            ),
            16,
            10,
        ).cast("long")

    from pyspark.sql import Window

    grid = (
        spark.range(6)
        .select(F.col("id").alias("t"))
        .select(
            "t", F.explode(F.sequence(F.lit(0), F.lit(sz - 1))).alias("y")
        )
        .select(
            "t", "y",
            F.explode(F.sequence(F.lit(0), F.lit(sz - 1))).alias("x"),
        )
        .withColumn("v", F.expr(_sat_v("x", "y")))
    )
    wx = Window.partitionBy("t", "y").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wy = Window.partitionBy("t", "x").orderBy("y").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sat = grid.withColumn("sx", F.sum("v").over(wx)).withColumn(
        "s", F.sum("sx").over(wy)
    )
    rect = ev.filter(F.col("event_id") % 53 == 0).select(
        F.col("event_id").alias("pid"),
        (F.col("event_id") % 6).alias("t"),
        (_h("sax0:") % 80).alias("x0"),
        (_h("say0:") % 80).alias("y0"),
        (1 + _h("saw:") % 16).alias("w"),
        (1 + _h("sah:") % 16).alias("h"),
    ).select(
        "pid", "t", "x0", "y0",
        F.least(F.col("x0") + F.col("w") - 1, F.lit(sz - 1)).alias("x1"),
        F.least(F.col("y0") + F.col("h") - 1, F.lit(sz - 1)).alias("y1"),
    )
    corners = rect.select(
        "pid",
        "t",
        ((F.col("x1") - F.col("x0") + 1) * (F.col("y1") - F.col("y0") + 1))
        .cast("long")
        .alias("area"),
        F.explode(
            F.array(
                F.struct(
                    F.col("x1").alias("cx"), F.col("y1").alias("cy"),
                    F.lit(1).alias("sign"),
                ),
                F.struct(
                    (F.col("x0") - 1).alias("cx"), F.col("y1").alias("cy"),
                    F.lit(-1).alias("sign"),
                ),
                F.struct(
                    F.col("x1").alias("cx"), (F.col("y0") - 1).alias("cy"),
                    F.lit(-1).alias("sign"),
                ),
                F.struct(
                    (F.col("x0") - 1).alias("cx"),
                    (F.col("y0") - 1).alias("cy"),
                    F.lit(1).alias("sign"),
                ),
            )
        ).alias("c"),
    ).select("pid", "t", "area", "c.cx", "c.cy", "c.sign")
    joined = corners.join(
        sat.select("t", F.col("x").alias("cx"), F.col("y").alias("cy"), "s"),
        ["t", "cx", "cy"],
        "left",
    )
    return (
        joined.groupBy("pid")
        .agg(
            F.sum(F.col("sign") * F.coalesce(F.col("s"), F.lit(0)))
            .cast("long")
            .alias("rect_sum"),
            F.max("area").alias("area"),
        )
        .orderBy("pid")
    )


# ------------------------------------------- Floyd-Steinberg dithering


@register_extra(
    "floyd_steinberg_dither",
    """
    WITH RECURSIVE imgs AS (SELECT DISTINCT user_id % 24 AS img
                            FROM events),
    px AS (
      SELECT img, i AS p,
             ('0x' || substr(md5('fs:' || CAST(img AS VARCHAR) || ':'
                || CAST(i AS VARCHAR)), 1, 4))::BIGINT % 256 AS v
      FROM imgs, generate_series(0, 143) t(i)
    ),
    pl AS (
      SELECT img, list(v ORDER BY p) AS img0 FROM px GROUP BY img
    ),
    st(img, p, acc, white, chk) AS (
      SELECT img, CAST(-1 AS BIGINT), img0,
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM pl
      UNION ALL
      SELECT s1.img, s1.p + 1,
             list_transform(s1.acc, (x, i) -> x
               + CASE WHEN i = s1.p + 3 AND (s1.p + 1) % 12 <> 11
                      THEN (7 * s1.err) // 16 ELSE 0 END
               + CASE WHEN i = s1.p + 13 AND (s1.p + 1) // 12 <> 11
                           AND (s1.p + 1) % 12 <> 0
                      THEN (3 * s1.err) // 16 ELSE 0 END
               + CASE WHEN i = s1.p + 14 AND (s1.p + 1) // 12 <> 11
                      THEN (5 * s1.err) // 16 ELSE 0 END
               + CASE WHEN i = s1.p + 15 AND (s1.p + 1) // 12 <> 11
                           AND (s1.p + 1) % 12 <> 11
                      THEN s1.err // 16 ELSE 0 END),
             s1.white + s1.out // 255,
             s1.chk + (s1.out // 255) * (s1.p + 2)
      FROM (
        SELECT st.img, st.p, st.acc, st.white, st.chk,
               CASE WHEN st.acc[CAST(st.p + 2 AS INT)] >= 128
                    THEN 255 ELSE 0 END AS out,
               st.acc[CAST(st.p + 2 AS INT)]
                 - CASE WHEN st.acc[CAST(st.p + 2 AS INT)] >= 128
                        THEN 255 ELSE 0 END AS err
        FROM st WHERE st.p < 143
      ) s1
    )
    SELECT img, white AS n_white, chk
    FROM st WHERE p = 143 ORDER BY img
    """,
)
def floyd_steinberg_dither(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floyd-Steinberg error-diffusion dithering — THE halftoning
    algorithm (printers, GIF quantizers, e-ink): threshold each pixel
    in raster order and push the quantization error onto the 4 unvisited
    neighbors with 7/16, 3/16, 5/16, 1/16 weights. Inherently
    SEQUENTIAL per image (each decision feeds the next), so this is the
    per-key fold pattern: Spark runs one applyInPandas per image
    (images fan out across executors — at corpus scale the parallelism
    is the image count, which is the right axis), the oracle replays
    the identical scan as a recursive list machine. Division is pinned
    C-style TRUNCATING (DuckDB's native `//`; the Python fold
    implements trunc explicitly) because the error is signed — floor
    vs trunc diverges on negative errors. 24 md5-derived 12x12
    grayscale tiles; outputs the white-pixel count and an exact
    position checksum per image."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    imgs = ev.select(
        F.pmod(F.col("user_id"), F.lit(24)).alias("img")
    ).distinct()
    px = imgs.select(
        "img", F.explode(F.sequence(F.lit(0), F.lit(143))).alias("p")
    ).select(
        "img",
        "p",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("fs:"),
                            F.col("img").cast("string"),
                            F.lit(":"),
                            F.col("p").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 256
        ).alias("v"),
    )

    def _dither(key, pdf):
        pdf = pdf.sort_values("p")
        acc = pdf["v"].to_numpy(np.int64).copy()

        def tdiv16(x: int) -> int:
            return x // 16 if x >= 0 else -((-x) // 16)

        white = chk = 0
        for p in range(144):
            v = int(acc[p])
            out = 255 if v >= 128 else 0
            err = v - out
            row, col = p // 12, p % 12
            if col != 11:
                acc[p + 1] += tdiv16(7 * err)
            if row != 11:
                if col != 0:
                    acc[p + 11] += tdiv16(3 * err)
                acc[p + 12] += tdiv16(5 * err)
                if col != 11:
                    acc[p + 13] += tdiv16(err)
            if out == 255:
                white += 1
                chk += p + 1
        return pd.DataFrame(
            [(int(key[0]), white, chk)],
            columns=["img", "n_white", "chk"],
        )

    return (
        px.groupBy("img")
        .applyInPandas(_dither, "img long, n_white long, chk long")
        .orderBy("img")
    )


# ------------------------------------------------ Zhang-Suen thinning


@register_extra(
    "zhang_suen_thinning",
    """
    WITH RECURSIVE imgs AS (SELECT DISTINCT user_id % 16 AS img
                            FROM events),
    px AS (
      SELECT img, i AS p,
             CASE WHEN ('0x' || substr(md5('zs:' || CAST(img AS VARCHAR)
                || ':' || CAST(i AS VARCHAR)), 1, 4))::BIGINT % 5 < 3
             THEN 1 ELSE 0 END AS v
      FROM imgs, generate_series(0, 143) t(i)
    ),
    pl AS (SELECT img, list(v ORDER BY p) AS g0 FROM px GROUP BY img),
    st(img, it, g) AS (
      SELECT img, CAST(0 AS BIGINT), g0 FROM pl
      UNION ALL
      SELECT s1.img, s1.it + 1,
             list_transform(s1.nb, (n, i) ->
               CASE WHEN s1.g[i] = 1
                     AND n.p2 + n.p3 + n.p4 + n.p5 + n.p6 + n.p7
                         + n.p8 + n.p9 BETWEEN 2 AND 6
                     AND (CASE WHEN n.p2 = 0 AND n.p3 = 1 THEN 1 ELSE 0 END
                        + CASE WHEN n.p3 = 0 AND n.p4 = 1 THEN 1 ELSE 0 END
                        + CASE WHEN n.p4 = 0 AND n.p5 = 1 THEN 1 ELSE 0 END
                        + CASE WHEN n.p5 = 0 AND n.p6 = 1 THEN 1 ELSE 0 END
                        + CASE WHEN n.p6 = 0 AND n.p7 = 1 THEN 1 ELSE 0 END
                        + CASE WHEN n.p7 = 0 AND n.p8 = 1 THEN 1 ELSE 0 END
                        + CASE WHEN n.p8 = 0 AND n.p9 = 1 THEN 1 ELSE 0 END
                        + CASE WHEN n.p9 = 0 AND n.p2 = 1 THEN 1 ELSE 0 END)
                         = 1
                     AND CASE WHEN s1.it % 2 = 0
                              THEN n.p2 * n.p4 * n.p6 = 0
                                   AND n.p4 * n.p6 * n.p8 = 0
                              ELSE n.p2 * n.p4 * n.p8 = 0
                                   AND n.p2 * n.p6 * n.p8 = 0
                         END
               THEN 0 ELSE s1.g[i] END)
      FROM (
        SELECT st.img, st.it, st.g,
               list_transform(st.g, (x, i) -> {
                 'p2': CASE WHEN (i - 1) // 12 > 0
                            THEN st.g[i - 12] ELSE 0 END,
                 'p3': CASE WHEN (i - 1) // 12 > 0 AND (i - 1) % 12 < 11
                            THEN st.g[i - 11] ELSE 0 END,
                 'p4': CASE WHEN (i - 1) % 12 < 11
                            THEN st.g[i + 1] ELSE 0 END,
                 'p5': CASE WHEN (i - 1) // 12 < 11 AND (i - 1) % 12 < 11
                            THEN st.g[i + 13] ELSE 0 END,
                 'p6': CASE WHEN (i - 1) // 12 < 11
                            THEN st.g[i + 12] ELSE 0 END,
                 'p7': CASE WHEN (i - 1) // 12 < 11 AND (i - 1) % 12 > 0
                            THEN st.g[i + 11] ELSE 0 END,
                 'p8': CASE WHEN (i - 1) % 12 > 0
                            THEN st.g[i - 1] ELSE 0 END,
                 'p9': CASE WHEN (i - 1) // 12 > 0 AND (i - 1) % 12 > 0
                            THEN st.g[i - 13] ELSE 0 END}) AS nb
        FROM st WHERE st.it < 8
      ) s1
    )
    SELECT f.img,
           CAST(b.n0 AS BIGINT) AS n_fg_before,
           CAST(list_sum(f.g) AS BIGINT) AS n_fg_after,
           CAST(list_sum(list_transform(f.g, (x, i) -> x * i))
                AS BIGINT) AS chk
    FROM (SELECT img, g FROM st WHERE it = 8) f
    JOIN (SELECT img, list_sum(g0) AS n0 FROM pl) b
      USING (img)
    ORDER BY f.img
    """,
)
def zhang_suen_thinning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zhang-Suen skeletonization (1984) — THE classical binary-image
    thinning: two alternating subiterations delete border pixels that
    are simple (2<=B<=6 neighbors, exactly one 0->1 transition around
    the 8-ring, and the direction gates p2p4p6/p4p6p8 resp.
    p2p4p8/p2p6p8), SYNCHRONOUSLY — all deletions in a pass read the
    same snapshot, which is exactly why it distributes: each pass is a
    pure stencil. Fixed 8 subiterations (4 full passes — bounded-pass
    semantics so both engines iterate identically regardless of
    convergence). Spark runs the stencil vectorized in numpy per image
    (applyInPandas; images are the parallel axis, passes touch each
    tile once — the distributed-raster shape shared with
    raster_focal_stats); the oracle replays the same passes as a list
    machine whose neighbor fetches are boundary-guarded indexed
    lambdas. 16 md5-derived 12x12 binary tiles; reports fg counts
    before/after and an exact position checksum."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    imgs = ev.select(
        F.pmod(F.col("user_id"), F.lit(16)).alias("img")
    ).distinct()
    px = imgs.select(
        "img", F.explode(F.sequence(F.lit(0), F.lit(143))).alias("p")
    ).select(
        "img",
        "p",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("zs:"),
                            F.col("img").cast("string"),
                            F.lit(":"),
                            F.col("p").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % 5
            < 3,
            1,
        )
        .otherwise(0)
        .alias("v"),
    )

    def _thin(key, pdf):
        pdf = pdf.sort_values("p")
        g = pdf["v"].to_numpy(np.int64).reshape(12, 12)
        n0 = int(g.sum())

        def shift(a, dr, dc):
            out = np.zeros_like(a)
            rs = slice(max(dr, 0), 12 + min(dr, 0))
            cs = slice(max(dc, 0), 12 + min(dc, 0))
            rs2 = slice(max(-dr, 0), 12 + min(-dr, 0))
            cs2 = slice(max(-dc, 0), 12 + min(-dc, 0))
            out[rs, cs] = a[rs2, cs2]
            return out

        for it in range(8):
            p2 = shift(g, 1, 0)   # value of the NORTH neighbor at p
            p3 = shift(g, 1, -1)
            p4 = shift(g, 0, -1)
            p5 = shift(g, -1, -1)
            p6 = shift(g, -1, 0)
            p7 = shift(g, -1, 1)
            p8 = shift(g, 0, 1)
            p9 = shift(g, 1, 1)
            ring = [p2, p3, p4, p5, p6, p7, p8, p9, p2]
            b = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9
            a = sum(
                ((ring[k] == 0) & (ring[k + 1] == 1)).astype(np.int64)
                for k in range(8)
            )
            if it % 2 == 0:
                gate = (p2 * p4 * p6 == 0) & (p4 * p6 * p8 == 0)
            else:
                gate = (p2 * p4 * p8 == 0) & (p2 * p6 * p8 == 0)
            kill = (g == 1) & (b >= 2) & (b <= 6) & (a == 1) & gate
            g = np.where(kill, 0, g)
        flat = g.reshape(-1)
        chk = int((flat * np.arange(1, 145)).sum())
        return pd.DataFrame(
            [(int(key[0]), n0, int(flat.sum()), chk)],
            columns=["img", "n_fg_before", "n_fg_after", "chk"],
        )

    return (
        px.groupBy("img")
        .applyInPandas(
            _thin, "img long, n_fg_before long, n_fg_after long, chk long"
        )
        .orderBy("img")
    )


# ------------------------------------------------- EAN-13 barcode decode

# A real optical decode through the REAL PNG path: each event renders
# its 12-digit payload as a standards-compliant EAN-13 scanline
# (95 modules: guards + 6 L/G-parity left digits + 6 R right digits,
# first digit carried IMPLICITLY in the left-half parity pattern —
# the format's famous trick), and a second Arrow pass decodes it back
# from pixels: threshold, module resample, guard check, per-digit
# pattern match, parity-table lookup, checksum verify. The oracle
# never sees a pixel — it recomputes payload + check digit purely
# arithmetically, so render, PNG codec, and decoder must all agree
# for the hash to land.
_EAN13_ORACLE = """
WITH e AS (
  SELECT event_id,
         lpad(CAST(event_id % 1000000000000 AS VARCHAR), 12, '0') AS n12
  FROM events WHERE event_id % 11 = 0
),
s AS (
  SELECT event_id, n12,
         SUM(CAST(substr(n12, CAST(i + 1 AS INT), 1) AS INT)
             * CASE WHEN i % 2 = 0 THEN 1 ELSE 3 END) AS t
  FROM e CROSS JOIN (SELECT range AS i FROM range(12)) g
  GROUP BY event_id, n12
)
SELECT event_id,
       n12 || CAST((10 - t % 10) % 10 AS VARCHAR) AS ean13,
       true AS decode_ok
FROM s
"""

_EAN_L = [
    "0001101", "0011001", "0010011", "0111101", "0100011",
    "0110001", "0101111", "0111011", "0110111", "0001011",
]
_EAN_R = ["".join("1" if c == "0" else "0" for c in p) for p in _EAN_L]
_EAN_G = [p[::-1] for p in _EAN_R]
_EAN_PARITY = [
    "LLLLLL", "LLGLGG", "LLGGLG", "LLGGGL", "LGLLGG",
    "LGGLLG", "LGGGLL", "LGLGLG", "LGLGGL", "LGGLGL",
]


def _ean13_modules(n12: str) -> tuple[str, str]:
    """12-digit payload -> (full 13-digit code, 95-char module string)."""
    t = sum(int(d) * (1 if i % 2 == 0 else 3) for i, d in enumerate(n12))
    full = n12 + str((10 - t % 10) % 10)
    pat = _EAN_PARITY[int(full[0])]
    bits = "101"
    for i, d in enumerate(full[1:7]):
        bits += (_EAN_L if pat[i] == "L" else _EAN_G)[int(d)]
    bits += "01010"
    for d in full[7:13]:
        bits += _EAN_R[int(d)]
    bits += "101"
    return full, bits


@register_extra("barcode_ean13_decode", _EAN13_ORACLE)
def barcode_ean13_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scanline barcode decoding over an image corpus — the classic
    warehouse/retail CV op, run the distributed way: render pass and
    decode pass are separate Arrow-batched stages with images as the
    parallel axis (at corpus scale the decode pass is a pure map over
    stored blobs; no shuffle exists in the plan).

    The decoder is honest signal processing, not a lookup of the
    render: locate the left guard from dark pixels, infer module
    width from the 95-module span, resample module centers,
    verify all three guard groups, pattern-match each 7-module digit
    against the L/G/R tables, recover the INVISIBLE first digit from
    the left-half parity signature, and re-verify the mod-10
    checksum. Any disagreement anywhere (render tables, PNG round
    trip, threshold, parity logic, checksum) flips decode_ok or the
    string and hash-fails against the purely arithmetic oracle."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id")
        .filter(F.col("event_id") % 11 == 0)
        .repartition(deploy.binary_stage_parallelism(spark))
    )

    def _render(batches):
        for pdf in batches:
            rows = []
            for eid in pdf["event_id"]:
                eid = int(eid)
                n12 = f"{eid % 10**12:012d}"
                _, bits = _ean13_modules(n12)
                mods = np.frombuffer(bits.encode(), np.uint8) - ord("0")
                row = np.where(np.repeat(mods, 2) == 1, 0, 255).astype(
                    np.uint8
                )
                row = np.pad(row, (8, 8), constant_values=255)
                px = np.repeat(row[None, :, None], 3, axis=2)
                px = np.repeat(px, 8, axis=0)  # 8 rows tall
                rows.append((eid, ic.encode_png(px)))
            yield pd.DataFrame(rows, columns=["event_id", "bytes"])

    imgs = ev.mapInPandas(_render, "event_id long, bytes binary")

    def _decode_one(data: bytes) -> tuple[str, bool]:
        px = ic.decode_png(bytes(data))
        line = px[px.shape[0] // 2, :, 1].astype(np.int64)
        dark = np.flatnonzero(line < 128)
        if len(dark) == 0:
            return "", False
        lo, hi = int(dark[0]), int(dark[-1])
        span = hi - lo + 1
        if span % 95 != 0:
            return "", False
        mw = span // 95
        centers = lo + mw * np.arange(95) + mw // 2
        bits = "".join("1" if line[c] < 128 else "0" for c in centers)
        if (
            bits[0:3] != "101"
            or bits[45:50] != "01010"
            or bits[92:95] != "101"
        ):
            return "", False
        parity = ""
        digits = []
        for i in range(6):
            pat = bits[3 + 7 * i : 10 + 7 * i]
            if pat in _EAN_L:
                parity += "L"
                digits.append(_EAN_L.index(pat))
            elif pat in _EAN_G:
                parity += "G"
                digits.append(_EAN_G.index(pat))
            else:
                return "", False
        if parity not in _EAN_PARITY:
            return "", False
        d1 = _EAN_PARITY.index(parity)
        for i in range(6):
            pat = bits[50 + 7 * i : 57 + 7 * i]
            if pat not in _EAN_R:
                return "", False
            digits.append(_EAN_R.index(pat))
        full = str(d1) + "".join(str(d) for d in digits)
        t = sum(
            int(d) * (1 if i % 2 == 0 else 3) for i, d in enumerate(full[:12])
        )
        ok = (10 - t % 10) % 10 == int(full[12])
        return full, ok

    def _decode(batches):
        for pdf in batches:
            out = []
            for eid, blob in zip(pdf["event_id"], pdf["bytes"]):
                code, ok = _decode_one(blob)
                out.append((int(eid), code, ok))
            yield pd.DataFrame(
                out, columns=["event_id", "ean13", "decode_ok"]
            )

    return imgs.mapInPandas(
        _decode, "event_id long, ean13 string, decode_ok boolean"
    )


# ------------------------------------------- census stereo disparity

# Census-transform stereo matching (Zabih & Woodfill 1994) — the
# binocular-depth primitive behind classic real-time stereo pipelines:
# per-pixel 8-bit neighbor>center signatures, per-disparity total
# Hamming cost, winner-take-all argmin. The right view is the left
# gray plane cyclically shifted by ground truth d* = id % 6 (torus
# neighborhoods keep every pixel defined), so cost(d*) == 0 exactly
# and the recovered disparity is verifiable truth, not a heuristic.
_CENSUS_ORACLE = """
WITH ids AS (SELECT event_id AS id FROM events WHERE event_id % 50 = 0),
ax AS (SELECT unnest(generate_series(0, 31)) AS i),
offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
                        (1,-1),(1,0),(1,1)),
ds AS (SELECT unnest(generate_series(0, 7)) AS d),
g AS (
  SELECT id, x.i AS x, y.i AS y,
         (x.i * 7 + id * 13) % 256 + (y.i * 11 + id * 29) % 256
         + ((x.i + y.i) * 5 + id * 53) % 256 AS v
  FROM ids CROSS JOIN ax x CROSS JOIN ax y
),
cl AS (
  SELECT g.id, g.x, g.y,
         sum(CASE WHEN n.v > g.v
             THEN 1 << CAST((o.dy + 1) * 3 + o.dx + 1 AS INT)
             ELSE 0 END) AS sig
  FROM g CROSS JOIN offs o
  JOIN g n ON n.id = g.id AND n.x = (g.x + o.dx + 32) % 32
          AND n.y = (g.y + o.dy + 32) % 32
  GROUP BY g.id, g.x, g.y
),
-- right view: R(x, y) = L((x - d*) % 32, y); its census signature at
-- (x, y) equals the left signature at ((x - d*) % 32, y)
cr AS (
  SELECT cl.id, (cl.x + ids.id % 6) % 32 AS x, cl.y, cl.sig
  FROM cl JOIN ids ON ids.id = cl.id
),
cost AS (
  SELECT cr.id, ds.d,
         sum(bit_count(xor(cr.sig, l2.sig))) AS cost
  FROM cr CROSS JOIN ds
  JOIN cl l2 ON l2.id = cr.id AND l2.y = cr.y
            AND l2.x = (cr.x - ds.d + 32) % 32
  GROUP BY cr.id, ds.d
),
best AS (
  SELECT id, d AS est_disp, cost AS cost_est FROM (
    SELECT id, d, cost,
           row_number() OVER (PARTITION BY id ORDER BY cost, d) AS rn
    FROM cost
  ) WHERE rn = 1
)
SELECT 'img_' || lpad(CAST(best.id AS VARCHAR), 9, '0') AS image_id,
       CAST(best.id % 6 AS INT) AS true_disp,
       CAST(best.est_disp AS INT) AS est_disp,
       CAST(best.cost_est AS BIGINT) AS cost_est,
       CAST(z.cost AS BIGINT) AS cost_at_zero
FROM best JOIN cost z ON z.id = best.id AND z.d = 0
ORDER BY image_id
"""


@register_extra("census_stereo_disparity", _CENSUS_ORACLE)
def census_stereo_disparity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census stereo over the decoded 1/50 PNG subset (see oracle
    comment): Spark decodes the left view and runs the whole
    census/Hamming/argmin tensor pass vectorized per Arrow batch
    (pipeline/images.py::with_census_stereo); the oracle rebuilds both
    views' census bits relationally from the pixel closed form via
    modular-index self-joins. Map-side only — disparity search is
    per-image local work, the plan shape that lets a 10^12-frame
    stereo corpus scale linearly in executors."""
    imgs = im.images_df(spark, sf_dir, every=50)
    return im.with_census_stereo(imgs).orderBy("image_id")
