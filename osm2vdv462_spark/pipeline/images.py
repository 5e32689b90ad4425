"""The images table (BASELINE.json input_hint) + image operators.

Schema: (image_id string, bytes binary, w int, h int, fmt string,
caption string, phash bigint, lon double, lat double) — synthesized
deterministically from the driver's `events` rows (geotags via the same
LCG as datagen.geo_points, pixels via functions.imagecodec.synth_pixels)
so every stage is reproducible with no external data.

Operators (all Arrow-batched, fmt-agnostic plumbing):
* ``with_decode_verify``: decode -> PSNR vs the deterministic reference
  pixels + caption equality + phash recompute (the input_hint per-row
  invariant);
* ``with_resized_phash``: box-resize (real numpy) -> phash of thumbnail.

Video frame sampling lives in pipeline/video.py since r4 (the round-2/3
``frame_sample_stub`` is superseded by the real RIFF/AVI decode path —
functions/videocodec.py + video.sample_frames).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import imagecodec as ic
from .. import deploy
from . import datagen


JPEG_QUALITY = 92  # worst synth-smooth PSNR 43+ dB — clears the 40 dB bar


def _synth_row(eid: int, size: int, mixed_formats):
    """One deterministic image row. With ``mixed_formats`` truthy, odd
    event ids emit real JPEG (smooth sinusoid pattern — see
    imagecodec.synth_pixels_smooth) and even ids lossless PNG; pass
    ``mixed_formats="prog"`` to make the JPEG rows PROGRESSIVE (SOF2,
    9-scan spectral + successive script) instead of baseline. The
    stored phash is always the hash of the STORED image content (for
    JPEG: pixels after a decode round-trip), so phash recompute from
    bytes is exact for every format."""
    if mixed_formats and eid % 2 == 1:
        from ..functions import jpegcodec

        px = ic.synth_pixels_smooth(eid, size, size)
        if mixed_formats == "prog":
            data = jpegcodec.encode_jpeg_progressive(px, quality=JPEG_QUALITY)
            fmt = "jpeg_prog"
        else:
            data = jpegcodec.encode_jpeg(px, quality=JPEG_QUALITY)
            fmt = "jpeg"
        stored_px = jpegcodec.decode_jpeg(data)
        return data, fmt, ic.phash64(stored_px)
    px = ic.synth_pixels(eid, size, size)
    return ic.encode_png(px), "png", ic.phash64(px)


def images_df(
    spark: SparkSession,
    sf_dir: str,
    size: int = 32,
    every: int = 1,
    mixed_formats: bool = False,
) -> DataFrame:
    """One image per `events` row, geotagged by the oracle LCG.
    ``every`` keeps a deterministic 1/every subset (event_id % every == 0),
    filtered BEFORE the encode UDF so the skipped rows cost nothing.
    ``mixed_formats`` makes odd event ids real baseline JPEG (the
    corpus-realistic shape); default stays all-PNG because the
    pixel-exact oracles (thumb phash, pixel stats, phash near-dup)
    re-derive values closed-form from the lossless pattern."""
    pts = datagen.geo_points(spark, sf_dir)
    if every > 1:
        pts = pts.filter(F.col("event_id") % every == 0)
    # the source parquet is one split at small SF — repartition so the
    # per-image python work (encode/decode/phash ~1ms each) parallelizes
    pts = pts.repartition(deploy.binary_stage_parallelism(spark))

    batchable = size % 8 == 0 and mixed_formats != "prog"
    # input rows are ~24 B, so Arrow's record cap (65536) governs batch
    # size — unchunked, the batched encoder's (B x blocks x 64) int64 /
    # float64 temporaries would reach GBs per worker at sf1+. 2048 rows
    # keeps peak ~150 MB while the vectorization is long saturated.
    CHUNK = 2048

    def _chunk_rows(pdf):
        from ..functions import jpegcodec

        n = len(pdf)
        if not batchable:  # odd sizes / progressive: per-row path
            out = []
            for eid, lon, lat in zip(
                pdf["event_id"], pdf["lon"], pdf["lat"]
            ):
                eid = int(eid)
                data, fmt, ph = _synth_row(eid, size, mixed_formats)
                out.append(
                    (
                        f"img_{eid:09d}", data, size, size, fmt,
                        f"caption for image {eid}", ph,
                        float(lon), float(lat),
                    )
                )
            return pd.DataFrame(
                out,
                columns=[
                    "image_id", "bytes", "w", "h", "fmt", "caption",
                    "phash", "lon", "lat",
                ],
            )
        # batched synth (guide §4.2): one vectorized pass per format
        # class instead of per-image codec calls; outputs are
        # bit-identical to _synth_row (tests/test_batch_codec.py)
        eids = pdf["event_id"].to_numpy(np.int64)
        datas: list = [None] * n
        fmts: list = [None] * n
        phs = np.empty(n, np.int64)
        jsel = (
            np.nonzero(eids % 2 == 1)[0]
            if mixed_formats
            else np.empty(0, np.int64)
        )
        psel = (
            np.nonzero(eids % 2 == 0)[0] if mixed_formats else np.arange(n)
        )
        if len(jsel):
            px = ic.synth_pixels_smooth_batch(eids[jsel], size, size)
            blobs, coeffs = jpegcodec.encode_jpeg_batch(
                px, quality=JPEG_QUALITY
            )
            stored = jpegcodec.decoded_pixels_from_coeffs(
                coeffs, JPEG_QUALITY, size, size
            )
            phs[jsel] = ic.phash64_batch(stored)
            for k, i in enumerate(jsel):
                datas[i] = blobs[k]
                fmts[i] = "jpeg"
        if len(psel):
            px = ic.synth_pixels_batch(eids[psel], size, size)
            phs[psel] = ic.phash64_batch(px)
            for k, i in enumerate(psel):
                datas[i] = ic.encode_png(px[k])
                fmts[i] = "png"
        return pd.DataFrame(
            {
                "image_id": [f"img_{e:09d}" for e in eids],
                "bytes": datas,
                "w": np.full(n, size, np.int32),
                "h": np.full(n, size, np.int32),
                "fmt": fmts,
                "caption": [f"caption for image {e}" for e in eids],
                "phash": phs,
                "lon": pdf["lon"].to_numpy(np.float64),
                "lat": pdf["lat"].to_numpy(np.float64),
            }
        )

    def _gen(batches):
        for pdf0 in batches:
            for s0 in range(0, len(pdf0), CHUNK):
                pdf = pdf0.iloc[s0 : s0 + CHUNK]
                if len(pdf):
                    yield _chunk_rows(pdf)

    df = pts.mapInPandas(
        _gen,
        "image_id string, bytes binary, w int, h int, fmt string,"
        " caption string, phash long, lon double, lat double",
    )
    # operator-fusion marker (guide §4.1: fewer JVM<->Python crossings):
    # with_decode_verify composes its kernel with _gen in ONE mapInPandas
    # when fed this frame directly, skipping a full Arrow round trip of
    # the blob corpus. Inert everywhere else; dropped by any transform.
    df._graft_gen = (pts, _gen)
    return df


def with_decode_verify(images: DataFrame) -> DataFrame:
    """Per-row invariant (input_hint): decoded-pixel PSNR >= 40 dB vs the
    reference pixels (lossless PNG -> expect inf), caption equality,
    phash recompute equality. Adds pixel_ok / caption_ok / phash_ok /
    psnr columns."""

    def _verify(batches):
        from ..functions import jpegcodec

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            eids = np.array(
                [int(s.split("_")[1]) for s in pdf["image_id"]], np.int64
            )
            fmts = pdf["fmt"].tolist()
            ws = pdf["w"].to_numpy(np.int64)
            hs = pdf["h"].to_numpy(np.int64)
            blobs = pdf["bytes"].tolist()
            phashes = pdf["phash"].to_numpy(np.int64)
            jpegish = np.array(
                [f in ("jpeg", "jpg", "jpeg_prog") for f in fmts], bool
            )
            got: list = [None] * n
            # decode: JPEGs batched (shared IDCT stacks), rest per image
            jidx = np.nonzero(jpegish)[0]
            if len(jidx):
                dec = jpegcodec.decode_jpeg_many(
                    [bytes(blobs[i]) for i in jidx], skip_errors=True
                )
                for k, i in enumerate(jidx):
                    got[i] = dec[k]
            for i in np.nonzero(~jpegish)[0]:
                try:
                    got[i] = ic.decode_image(bytes(blobs[i]), fmts[i])
                except NotImplementedError:
                    got[i] = None
            # reference synth + PSNR + phash recompute, vectorized per
            # (pattern, w, h) group — bit-identical to the per-image
            # functions (batched twins pinned in tests)
            psnr = np.full(n, np.nan)
            hok = np.zeros(n, bool)
            groups: dict = {}
            for i in range(n):
                groups.setdefault(
                    (bool(jpegish[i]), int(ws[i]), int(hs[i])), []
                ).append(i)
            for (smooth, w_, h_), idxs in groups.items():
                gen_b = (
                    ic.synth_pixels_smooth_batch
                    if smooth
                    else ic.synth_pixels_batch
                )
                ref = gen_b(eids[idxs], w_, h_)
                ok = [
                    k
                    for k, i in enumerate(idxs)
                    if got[i] is not None and got[i].shape == (h_, w_, 3)
                ]
                if not ok:
                    continue
                gstack = np.stack([got[idxs[k]] for k in ok])
                pv = ic.psnr_db_batch(ref[ok], gstack)
                if h_ % 8 == 0 and w_ % 8 == 0:
                    hv = ic.phash64_batch(gstack)
                else:
                    hv = np.array(
                        [ic.phash64(g) for g in gstack], np.int64
                    )
                for j, k in enumerate(ok):
                    i = idxs[k]
                    psnr[i] = pv[j]
                    hok[i] = int(hv[j]) == int(phashes[i])
            out = pdf.copy()
            out["psnr"] = psnr
            out["pixel_ok"] = [
                bool(p >= 40.0) if p == p else False for p in psnr
            ]
            out["caption_ok"] = [
                c == f"caption for image {e}"
                for c, e in zip(pdf["caption"], eids)
            ]
            out["phash_ok"] = hok.tolist()
            yield out

    schema = (
        "image_id string, bytes binary, w int, h int, fmt string,"
        " caption string, phash long, lon double, lat double,"
        " psnr double, pixel_ok boolean, caption_ok boolean,"
        " phash_ok boolean"
    )
    fused = getattr(images, "_graft_gen", None)
    if fused is not None:
        # synth + verify in ONE Python task: the per-chunk pandas frames
        # _gen yields stream straight into _verify — identical rows, one
        # MapInPandas node instead of two (no Arrow round trip of the
        # blob corpus between them)
        pts, gen_fn = fused

        def _fused(batches):
            yield from _verify(gen_fn(batches))

        return pts.mapInPandas(_fused, schema)
    return images.mapInPandas(_verify, schema)


def box_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Simple box (area-average) resize, pure numpy."""
    h, w, c = px.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, c), np.uint8)
    f = px.astype(np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = f[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean(axis=(0, 1))
    return out


def with_resized_phash(images: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Thumbnail + thumbnail-phash: (image_id, thumb binary, thumb_phash)."""

    def _resize(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    px = ic.decode_image(bytes(row.bytes), row.fmt)
                except NotImplementedError:
                    out.append((row.image_id, None, None))
                    continue
                th = box_resize(px, out_w, out_h)
                out.append((row.image_id, ic.encode_png(th), ic.phash64(th)))
            yield pd.DataFrame(out, columns=["image_id", "thumb", "thumb_phash"])

    return images.mapInPandas(
        _resize, "image_id string, thumb binary, thumb_phash long"
    )


def with_pixel_stats(images: DataFrame) -> DataFrame:
    """Decode -> per-image brightness/contrast stats: mean gray in e-4
    fixed point (floor(total*10000 / (3*w*h)) — INTEGER arithmetic, not
    rounded floats: Python banker's vs SQL half-away rounding diverge at
    exact half boundaries) and the min/max per-pixel channel sum. The
    DuckDB oracle (image_pixel_stats) reproduces every value exactly."""

    def _stats(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2)
                total = int(t.sum())
                mean_gray_e4 = (total * 10000) // (3 * row.w * row.h)
                out.append(
                    (row.image_id, mean_gray_e4, int(t.max()), int(t.min()))
                )
            yield pd.DataFrame(
                out, columns=["image_id", "mean_gray_e4", "t_max", "t_min"]
            )

    return images.mapInPandas(
        _stats,
        "image_id string, mean_gray_e4 bigint, t_max int, t_min int",
    )


def with_sharpness(images: DataFrame) -> DataFrame:
    """Decode -> blur/sharpness metric: variance of the 4-neighbor
    Laplacian of the channel-sum image over interior pixels, in e-4
    fixed point — the standard variance-of-Laplacian blur detector used
    to drop out-of-focus images from training corpora. INTEGER
    arithmetic end-to-end: var_e4 = (n*suml2 - suml^2)*10000 // n^2
    (|L| <= 3060 so the worst product ~7.6e16 fits int64), so the
    DuckDB closed-form oracle (image_sharpness) reproduces every value
    exactly. Blurrier pixels => strictly lower score (pytest property)."""

    def _sharp(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2)
                lap = (
                    4 * t[1:-1, 1:-1]
                    - t[:-2, 1:-1]
                    - t[2:, 1:-1]
                    - t[1:-1, :-2]
                    - t[1:-1, 2:]
                )
                n = lap.size
                s1 = int(lap.sum())
                s2 = int((lap * lap).sum())
                out.append((row.image_id, s1, s2, (n * s2 - s1 * s1) * 10000 // (n * n)))
            yield pd.DataFrame(
                out, columns=["image_id", "lap_sum", "lap_sum2", "lap_var_e4"]
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        _sharp,
        "image_id string, lap_sum bigint, lap_sum2 bigint, lap_var_e4 bigint",
    )


def with_color_hist(images: DataFrame) -> DataFrame:
    """Decode -> 64-bin quantized color histogram summary: each pixel
    maps to a 2-bit-per-channel bin (r>>6)*16 + (g>>6)*4 + (b>>6); per
    image we keep the dominant bin (ties -> lowest bin id, np.argmax's
    first-max), its pixel count, and how many of the 64 bins are
    occupied — the palette-complexity signal corpus curation uses to
    drop flat/monochrome images before training. Pure integer counts,
    so the DuckDB closed-form oracle reproduces every value exactly."""

    def _hist(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                bins = (
                    (px[:, :, 0] >> 6) * 16
                    + (px[:, :, 1] >> 6) * 4
                    + (px[:, :, 2] >> 6)
                )
                counts = np.bincount(bins.ravel(), minlength=64)
                dom = int(np.argmax(counts))
                out.append(
                    (
                        row.image_id,
                        dom,
                        int(counts[dom]),
                        int(np.count_nonzero(counts)),
                    )
                )
            yield pd.DataFrame(
                out, columns=["image_id", "dom_bin", "dom_count", "n_bins"]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        _hist, "image_id string, dom_bin int, dom_count int, n_bins int"
    )


EDGE_T = 1000  # Sobel L1 magnitude threshold (|gx|+|gy| <= ~6120)


def with_edge_stats(images: DataFrame, threshold: int = EDGE_T) -> DataFrame:
    """Decode -> Sobel edge statistics: L1 gradient magnitude
    (|gx| + |gy|, 3x3 Sobel kernels on the channel-sum image) over
    interior pixels — the edge-density signal corpus curation uses
    next to variance-of-Laplacian (with_sharpness): high density =
    text/diagram screenshots, near-zero = flat/synthetic fills.
    INTEGER arithmetic end-to-end (|t| <= 765 so |gx| <= 3060), so the
    DuckDB closed-form oracle (image_edge_stats) reproduces every
    magnitude exactly. Map-side mapInPandas pass, no shuffle."""

    def _edges(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(np.int64)
                t = px.sum(axis=2)
                gx = (t[:-2, 2:] + 2 * t[1:-1, 2:] + t[2:, 2:]) - (
                    t[:-2, :-2] + 2 * t[1:-1, :-2] + t[2:, :-2]
                )
                gy = (t[2:, :-2] + 2 * t[2:, 1:-1] + t[2:, 2:]) - (
                    t[:-2, :-2] + 2 * t[:-2, 1:-1] + t[:-2, 2:]
                )
                mag = np.abs(gx) + np.abs(gy)
                n = mag.size
                ec = int((mag >= threshold).sum())
                out.append(
                    (row.image_id, ec, int(mag.sum()), ec * 10000 // n)
                )
            yield pd.DataFrame(
                out,
                columns=["image_id", "edge_count", "mag_sum", "edge_density_e4"],
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        _edges,
        "image_id string, edge_count int, mag_sum bigint,"
        " edge_density_e4 bigint",
    )




# ------------------------------------------------------- GIF corpus (r4)

# 64-entry closed-form palette: channel c of entry i is (i * k_c) % 256
# with k = (11, 29, 47) — chosen coprime to 256 so entries are distinct
# and the DuckDB oracle can restate every decoded pixel in one modular
# expression.
_GIF_KS = (11, 29, 47)


def gif_palette() -> np.ndarray:
    i = np.arange(64, dtype=np.int64)
    return np.stack([(i * k) % 256 for k in _GIF_KS], axis=1).astype(
        np.uint8
    )


def synth_gif_indices(image_id: int, w: int = 32, h: int = 32) -> np.ndarray:
    """Deterministic palette indices: (x*3 + y*5 + id*7) % 64."""
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 3 + y * 5 + image_id * 7) % 64).astype(np.uint8)


def gif_images_df(
    spark: SparkSession, sf_dir: str, size: int = 32, every: int = 50
) -> DataFrame:
    """GIF corpus (third container format after PNG/JPEG): one
    palette-indexed GIF per kept `events` row, encoded through the real
    from-scratch LZW writer (functions/gifcodec.py). Same shape
    discipline as images_df: the 1/every subset filter runs BEFORE the
    encode UDF, and the per-image python work is repartitioned across
    the executors."""
    from ..functions import gifcodec

    pts = datagen.geo_points(spark, sf_dir)
    if every > 1:
        pts = pts.filter(F.col("event_id") % every == 0)
    pts = pts.repartition(deploy.binary_stage_parallelism(spark))
    pal = gif_palette()

    def _gen(batches):
        for pdf in batches:
            out = []
            for eid in pdf["event_id"]:
                eid = int(eid)
                idx = synth_gif_indices(eid, size, size)
                out.append(
                    (
                        f"img_{eid:09d}",
                        gifcodec.encode_gif(idx, pal),
                        size,
                        size,
                        "gif",
                    )
                )
            yield pd.DataFrame(
                out, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return pts.mapInPandas(
        _gen, "image_id string, bytes binary, w int, h int, fmt string"
    )


# ---------------------------------------------------------- EXIF geotags


def exif_images_df(
    spark: SparkSession, sf_dir: str, size: int = 16, every: int = 5
) -> DataFrame:
    """Images whose geotag lives WHERE CRAWLED IMAGES CARRY IT — in the
    EXIF APP1 GPS IFD — not in a ready-made lon/lat column. Each kept
    event row becomes a real baseline JPEG (functions/jpegcodec.py)
    with a spliced GPS APP1 (functions/exif.py): DMS rationals
    (0 deg, |m-1000|*60/4000 min, 0 sec) built from the SAME LCG the
    oracle reconstructs closed-form, ref S/W for negative coordinates;
    odd event ids write big-endian ('MM') TIFF bodies so both byte
    orders flow through the corpus. Returns (event_id, data)."""
    from ..functions import exif, jpegcodec

    pts = datagen.geo_points(spark, sf_dir)
    if every > 1:
        pts = pts.filter(F.col("event_id") % every == 0)
    # mult=1: the batched 16x16 encode leaves ~0.25 ms/row of Python —
    # at that grain one task per core beats 2x (interleaved A/B, round 6:
    # 1.7-2.0 s vs 2.5-2.6 s for the full exif query at 32 cores)
    pts = pts.repartition(deploy.binary_stage_parallelism(spark, mult=1))

    def _gen(batches):
        for pdf0 in batches:
            # sub-chunk: input rows are 8 B, so Arrow batches reach the
            # 65536-record cap and the batch encoder's temporaries
            # would grow to hundreds of MB per worker at sf1+
            for s0 in range(0, len(pdf0), 4096):
                pdf = pdf0.iloc[s0 : s0 + 4096]
                if len(pdf) == 0:
                    continue
                yield _chunk(pdf)

    def _chunk(pdf):
        eids = pdf["event_id"].to_numpy(np.int64)
        # batched synth + JPEG encode (byte-identical to the per-image
        # encoder — tests/test_jpeg.py); the APP1 splice stays per
        # image (tiny byte surgery)
        px = ic.synth_pixels_smooth_batch(eids, size, size)
        blobs, _ = jpegcodec.encode_jpeg_batch(px, quality=JPEG_QUALITY)
        out = []
        for eid, blob in zip(eids, blobs):
            eid = int(eid)
            m_lon = (eid * 37 + 11) % 2000
            m_lat = (eid * 73 + 29) % 2000
            lat_dms = [(0, 1), (abs(m_lat - 1000) * 60, 4000), (0, 1)]
            lon_dms = [(0, 1), (abs(m_lon - 1000) * 60, 4000), (0, 1)]
            app1 = exif.build_gps_app1(
                "S" if m_lat < 1000 else "N",
                lat_dms,
                "W" if m_lon < 1000 else "E",
                lon_dms,
                byte_order="MM" if eid % 2 else "II",
            )
            out.append((eid, bytearray(exif.insert_app1(blob, app1))))
        return pd.DataFrame(out, columns=["event_id", "data"])

    df = pts.select("event_id").mapInPandas(
        _gen, "event_id bigint, data binary"
    )
    # fusion marker: with_exif_gps composes with _gen in one crossing
    # (same pattern as images_df / with_decode_verify)
    df._graft_gen = (pts.select("event_id"), _gen)
    return df


def with_exif_gps(images: DataFrame, bytes_col: str = "data") -> DataFrame:
    """Distributed EXIF GPS extraction: one Arrow-batched pass over the
    bytes column -> refs + minute rationals (exact integers; doubles
    are derived downstream only where a kernel needs them). Rows
    without EXIF GPS keep NULL fields."""
    from ..functions import exif

    keep = [c for c in images.columns if c != bytes_col]
    extra = [
        "lat_ref",
        "lat_min_num",
        "lat_min_den",
        "lon_ref",
        "lon_min_num",
        "lon_min_den",
        "lat_deg",
        "lon_deg",
    ]
    schema = (
        ", ".join(f"{c} {t}" for c, t in images.select(*keep).dtypes)
        + ", lat_ref string, lat_min_num bigint, lat_min_den bigint"
        + ", lon_ref string, lon_min_num bigint, lon_min_den bigint"
        + ", lat_deg double, lon_deg double"
    )

    def _parse(batches):
        for pdf in batches:
            rows = []
            for vals in zip(*(pdf[c] for c in keep), pdf[bytes_col]):
                *head, blob = vals
                gps = exif.parse_gps(bytes(blob)) if blob is not None else None
                if gps is None:
                    rows.append((*head,) + (None,) * 8)
                    continue
                lat_ref, lat_dms, lon_ref, lon_dms = gps
                rows.append(
                    (
                        *head,
                        lat_ref,
                        int(lat_dms[1][0]),
                        int(lat_dms[1][1]),
                        lon_ref,
                        int(lon_dms[1][0]),
                        int(lon_dms[1][1]),
                        exif.dms_to_deg(lat_ref, lat_dms),
                        exif.dms_to_deg(lon_ref, lon_dms),
                    )
                )
            yield pd.DataFrame(rows, columns=keep + extra)

    fused = getattr(images, "_graft_gen", None)
    if fused is not None and bytes_col == "data":
        pts, gen_fn = fused

        def _fused(batches):
            yield from _parse(gen_fn(batches))

        return pts.mapInPandas(_fused, schema)
    return images.mapInPandas(_parse, schema)


def with_patch_stats(images: DataFrame, patch: int = 8) -> DataFrame:
    """Decode -> ViT-style patch decomposition: the image splits into a
    (h/patch) x (w/patch) grid and each patch reports integer stats of
    the per-pixel channel sum (e-4 fixed-point mean via floor division
    — the pixel_stats discipline, so the oracle reproduces every value
    exactly). This is the preprocessing shape of every
    patch-embedding vision pipeline (ViT/CLIP): one decode, then
    per-patch reductions, emitted as (image, patch_row, patch_col)
    rows ready for a downstream embedding stage."""

    def _stats(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt).astype(
                    np.int64
                )
                t = px.sum(axis=2)
                h, w = t.shape
                for pr in range(h // patch):
                    for pc in range(w // patch):
                        blk = t[
                            pr * patch : (pr + 1) * patch,
                            pc * patch : (pc + 1) * patch,
                        ]
                        out.append(
                            (
                                row.image_id,
                                pr,
                                pc,
                                (int(blk.sum()) * 10000)
                                // (3 * patch * patch),
                                int(blk.min()),
                                int(blk.max()),
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "image_id",
                    "patch_row",
                    "patch_col",
                    "mean_gray_e4",
                    "t_min",
                    "t_max",
                ],
            )

    return images.mapInPandas(
        _stats,
        "image_id string, patch_row int, patch_col int,"
        " mean_gray_e4 bigint, t_min int, t_max int",
    )


def with_dct_phash(images: DataFrame) -> DataFrame:
    """Decode -> true DCT pHash (functions/imagecodec.dct_phash64) per
    image: (image_id, dct_phash, n_above). The whole batch's DCT runs
    as ONE int64 einsum over the stacked gray planes (Arrow batch in,
    vectorized numpy, no per-pixel Python) — the per-image cost is two
    8x32 matmuls, decode-dominated like every image op here."""
    table = ic.dct_cos_q14(32, 8)

    def _dct(batches):
        c = np.asarray(table, dtype=np.int64)
        for pdf in batches:
            ids, grays = [], []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt)
                ids.append(row.image_id)
                grays.append(px.astype(np.int64).sum(axis=2))
            if not ids:
                continue
            g = np.stack(grays)  # (B, 32, 32) [y][x]
            f = np.einsum("kx,byx,ly->bkl", c, g, c)  # (B, 8, 8)
            vals = f.reshape(len(ids), 64)[:, 1:]  # drop DC
            med = np.sort(vals, axis=1)[:, 31]
            bits = vals > med[:, None]
            weights = np.left_shift(
                np.int64(1), 63 - (np.arange(64, dtype=np.int64)[1:])
            )
            hashes = (bits * weights).sum(axis=1)
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "dct_phash": hashes,
                    "n_above": bits.sum(axis=1).astype(np.int32),
                }
            )

    return images.mapInPandas(
        _dct, "image_id string, dct_phash long, n_above int"
    )


def with_census_stereo(images: DataFrame, max_d: int = 8) -> DataFrame:
    """Census-transform stereo matching (the classic binocular-depth
    primitive; Zabih & Woodfill 1994): per image, the RIGHT view is the
    decoded LEFT gray plane cyclically shifted by a ground-truth
    disparity d* = event_id % 6 (hermetic pair synthesis — wraparound
    keeps every pixel defined so the oracle replays it closed-form).
    Census = 8-bit neighbor>center signature on the 3x3 torus
    neighborhood; cost(d) = total Hamming distance between the right
    census and the left census shifted by d; est_disp = argmin (ties ->
    smallest d, pinned). All integer; fully vectorized: np.roll for
    shifts, boolean XOR + sum for Hamming, one (B, 9, 32, 32) tensor
    pass per Arrow batch."""
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]

    def _census(g: np.ndarray) -> np.ndarray:
        # g: (B, 32, 32) -> bool bits (B, 8, 32, 32); torus neighbors
        return np.stack(
            [np.roll(np.roll(g, -dy, axis=1), -dx, axis=2) > g for dy, dx in offs],
            axis=1,
        )

    def _stereo(batches):
        for pdf in batches:
            ids, eids, grays = [], [], []
            for row in pdf.itertuples(index=False):
                px = ic.decode_image(bytes(row.bytes), row.fmt)
                ids.append(row.image_id)
                eids.append(int(row.image_id.split("_")[1]))
                grays.append(px.astype(np.int64).sum(axis=2))
            if not ids:
                continue
            left = np.stack(grays)
            true_d = np.asarray(eids) % 6
            right = np.stack(
                [np.roll(l, int(d), axis=1) for l, d in zip(left, true_d)]
            )
            cl, cr = _census(left), _census(right)
            costs = np.stack(
                [
                    (np.roll(cl, d, axis=3) ^ cr).sum(axis=(1, 2, 3))
                    for d in range(max_d)
                ],
                axis=1,
            )  # (B, max_d)
            est = costs.argmin(axis=1)  # first minimum = smallest d
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "true_disp": true_d.astype(np.int32),
                    "est_disp": est.astype(np.int32),
                    "cost_est": costs[np.arange(len(ids)), est],
                    "cost_at_zero": costs[:, 0],
                }
            )

    return images.mapInPandas(
        _stereo,
        "image_id string, true_disp int, est_disp int,"
        " cost_est bigint, cost_at_zero bigint",
    )
