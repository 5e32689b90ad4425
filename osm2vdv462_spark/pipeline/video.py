"""The videos table + video operators (multimodal axis, video modality).

Same contract as pipeline/images.py / pipeline/audio.py: media ride as
opaque ``binary`` columns with typed metadata, per-clip compute is
Arrow-batched ``mapInPandas``, and the synthesis is deterministic
closed-form arithmetic so a DuckDB oracle can recompute frame features
bit-exactly.

Schema: (video_id string, bytes binary  complete .avi file, w int,
h int, fps int, n_frames int, codec string).

Clip synthesis: one AVI per sampled `events` row; frame ``k`` of event
``e`` renders ``imagecodec.synth_pixels(e * n_frames + k)`` (rawdib,
lossless — oracle-exact) or ``synth_pixels_smooth`` (mjpeg rows in
``mixed_codecs`` mode — lossy, PSNR-gated in pytest). The container is
the from-scratch RIFF/AVI codec in functions/videocodec.py.

Scale design — the whole point of the module: ``parse_avi`` reads only
chunk headers, so sampling k of n frames decodes exactly k payloads.
``with_frame_stats``/``sample_frames`` are single map-side passes (no
shuffle, no collect); output rows = clips x sampled frames. At 100 TB
of video the selective decode is the difference between touching 25%
and 100% of every blob. The reference has no video surface (it is a
geodata exporter — see SURVEY.md §2 note on the LLM-pipeline mandate);
this is the video analog of pipeline/images.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import imagecodec as ic
from ..functions import videocodec as vc
from .. import deploy
from . import datagen

N_FRAMES = 8
SIZE = 32
FPS = 10
MJPEG_QUALITY = 92  # matches images.JPEG_QUALITY: smooth synth > 40 dB


CUT_SEED_JUMP = 1_000_003  # decorrelates the sawtooth phases across a cut


def synth_frame(
    event_id: int,
    k: int,
    size: int = SIZE,
    smooth: bool = False,
    cut_at: int | None = None,
):
    """Deterministic RGB pixels for frame ``k`` of clip ``event_id``.
    Seed ``event_id * N_FRAMES + k`` keeps the closed form one integer
    expression the DuckDB oracle reproduces verbatim. With ``cut_at``,
    frames >= cut_at jump the seed by CUT_SEED_JUMP — a synthetic shot
    boundary (adjacent-seed frames drift smoothly in the modular
    sawtooth; the jump decorrelates them like a real cut)."""
    seed = event_id * N_FRAMES + k
    if cut_at is not None and k >= cut_at:
        seed += CUT_SEED_JUMP
    fn = ic.synth_pixels_smooth if smooth else ic.synth_pixels
    return fn(seed, size, size)


def _synth_clip(
    eid: int,
    n_frames: int,
    size: int,
    mixed: bool,
    cut_at: int | None,
    jitter_last: bool = False,
):
    if mixed and eid % 2 == 1:
        frames = [
            synth_frame(eid, k, size, smooth=True, cut_at=cut_at)
            for k in range(n_frames)
        ]
        return vc.encode_avi(frames, fps=FPS, codec="mjpeg", quality=MJPEG_QUALITY), "mjpeg"
    frames = [synth_frame(eid, k, size, cut_at=cut_at) for k in range(n_frames)]
    if jitter_last:
        # the clip trimmed one frame later: last frame is the NEXT frame
        # of the underlying sequence (seed n_frames, not n_frames-1) —
        # the classic near-duplicate shape of a re-cut/re-encoded clip
        frames[-1] = synth_frame(eid, n_frames, size, cut_at=cut_at)
    return vc.encode_avi(frames, fps=FPS, codec="rawdib"), "rawdib"


def videos_df(
    spark: SparkSession,
    sf_dir: str,
    n_frames: int = N_FRAMES,
    size: int = SIZE,
    every: int = 100,
    mixed_codecs: bool = False,
    cut_at: int | None = None,
    jitter_period: int | None = None,
) -> DataFrame:
    """One AVI clip per ``events`` row with event_id % every == 0,
    filtered BEFORE the encode UDF. ``mixed_codecs`` makes odd event
    ids Motion-JPEG (the corpus-realistic lossy shape); default stays
    all-rawdib because the frame-stat oracle needs lossless pixels.
    ``cut_at`` injects a synthetic shot boundary (see synth_frame).
    ``jitter_period`` makes clips with event_id % period >= period//2
    trailing-frame-jittered (see _synth_clip) so the corpus contains
    genuine near-duplicates, not just mod-256 exact ones."""
    pts = datagen.geo_points(spark, sf_dir).select("event_id")
    if every > 1:
        pts = pts.filter(F.col("event_id") % every == 0)
    pts = pts.repartition(deploy.binary_stage_parallelism(spark, mult=1))

    def _gen(batches):
        for pdf in batches:
            out = []
            for eid in pdf["event_id"]:
                eid = int(eid)
                jit = (
                    jitter_period is not None
                    and eid % jitter_period >= jitter_period // 2
                )
                data, codec = _synth_clip(
                    eid, n_frames, size, mixed_codecs, cut_at, jit
                )
                out.append(
                    (f"vid_{eid:09d}", data, size, size, FPS, n_frames, codec)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "video_id", "bytes", "w", "h", "fps", "n_frames", "codec",
                ],
            )

    return pts.mapInPandas(
        _gen,
        "video_id string, bytes binary, w int, h int, fps int,"
        " n_frames int, codec string",
    )


def with_header_scan(videos: DataFrame) -> DataFrame:
    """Container metadata via the header/chunk-index scan ONLY — frame
    payloads are never touched (the 100 TB 'stat the corpus' query).
    Cross-checks the header frame count against the movi scan (parse_avi
    raises on mismatch, surfacing truncated blobs as task errors rather
    than silent undercounts)."""

    def _scan(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                m = vc.parse_avi(bytes(row.bytes))
                out.append(
                    (row.video_id, m["codec"], m["w"], m["h"], m["fps"],
                     m["n_frames"], len(bytes(row.bytes)))
                )
            yield pd.DataFrame(
                out,
                columns=["video_id", "codec", "w", "h", "fps", "n_frames",
                         "total_bytes"],
            )

    return videos.mapInPandas(
        _scan,
        "video_id string, codec string, w int, h int, fps int,"
        " n_frames int, total_bytes bigint",
    )


def with_frame_stats(videos: DataFrame, stride: int = 2) -> DataFrame:
    """Per-sampled-frame brightness/contrast stats, frames 0, stride,
    2*stride, ...: header scan -> decode ONLY the sampled frames ->
    integer stats (same fixed-point arithmetic as images.with_pixel_stats
    so the oracle has no float rounding-mode traps)."""

    def _stats(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                blob = bytes(row.bytes)
                meta = vc.parse_avi(blob)
                npx = 3 * meta["w"] * meta["h"]
                for k in range(0, meta["n_frames"], stride):
                    px = vc.decode_frame(blob, meta, k).astype(np.int64)
                    t = px.sum(axis=2)
                    total = int(t.sum())
                    out.append(
                        (row.video_id, k, (total * 10000) // npx,
                         int(t.max()), int(t.min()))
                    )
            yield pd.DataFrame(
                out,
                columns=["video_id", "frame_no", "mean_gray_e4", "t_max",
                         "t_min"],
            )

    return videos.mapInPandas(
        _stats,
        "video_id string, frame_no int, mean_gray_e4 bigint, t_max int,"
        " t_min int",
    )


def sample_frames(videos: DataFrame, stride: int = 2) -> DataFrame:
    """Materialize sampled frames as PNG rows (the dataset shape a
    multimodal training pipeline feeds downstream): header scan ->
    decode only frames 0, stride, 2*stride, ... -> lossless re-encode.
    Replaces the round-2/3 ``images.frame_sample_stub`` with the real
    decode path."""

    def _sample(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                blob = bytes(row.bytes)
                meta = vc.parse_avi(blob)
                for k in range(0, meta["n_frames"], stride):
                    px = vc.decode_frame(blob, meta, k)
                    out.append((row.video_id, k, ic.encode_png(px)))
            yield pd.DataFrame(
                out, columns=["video_id", "frame_no", "frame_png"]
            )

    return videos.mapInPandas(
        _sample, "video_id string, frame_no int, frame_png binary"
    )


SCENE_CUT_SAD = 230_000  # 32x32x3 frames: adjacent-seed SAD <= ~198k,
#                          cross-cut SAD >= ~264k (measured over the seed
#                          space) — threshold sits in the dead band.
#                          Per-pixel-channel mean ~75: rescale for other
#                          resolutions as 75 * 3 * w * h.


def with_scene_cuts(videos: DataFrame, threshold: int = SCENE_CUT_SAD) -> DataFrame:
    """Shot-boundary detection: per consecutive frame pair, the sum of
    absolute per-channel differences (SAD — the classic cut metric) and
    an is_cut flag. One sequential decode pass per clip (each frame
    decoded once, rolling previous), map-side only. At 100 TB this is
    the curation pass that segments clips into shots before sampling;
    integer arithmetic throughout so the DuckDB oracle is exact."""

    def _cuts(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                blob = bytes(row.bytes)
                meta = vc.parse_avi(blob)
                prev = vc.decode_frame(blob, meta, 0).astype(np.int64)
                for k in range(1, meta["n_frames"]):
                    cur = vc.decode_frame(blob, meta, k).astype(np.int64)
                    sad = int(np.abs(cur - prev).sum())
                    out.append((row.video_id, k, sad, sad > threshold))
                    prev = cur
            yield pd.DataFrame(
                out, columns=["video_id", "frame_no", "sad_total", "is_cut"]
            )

    return videos.mapInPandas(
        _cuts,
        "video_id string, frame_no int, sad_total bigint, is_cut boolean",
    )


def with_frame_hashes(videos: DataFrame) -> DataFrame:
    """Per-frame perceptual hash: (video_id, frame_no, fhash int64).
    The sequence of frame aHashes IS the clip signature — fixed-width
    (8 bytes/frame), so every downstream join/shuffle carries hashes,
    never pixel payloads. One map-side decode pass per clip."""

    def _h(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                blob = bytes(row.bytes)
                meta = vc.parse_avi(blob)
                for k in range(meta["n_frames"]):
                    px = vc.decode_frame(blob, meta, k)
                    out.append((row.video_id, k, ic.phash64(px)))
            yield pd.DataFrame(out, columns=["video_id", "frame_no", "fhash"])

    return videos.mapInPandas(
        _h, "video_id string, frame_no int, fhash long"
    )


VIDEO_NEARDUP_HAM = 48  # <= 0.75 of one frame-hash width: admits clips
#                         differing by about one drifted/re-cut frame
#                         (measured trailing-frame jitter: 10-37 bits)


def clip_neardup(videos: DataFrame, max_ham: int = VIDEO_NEARDUP_HAM) -> DataFrame:
    """Clip-level near-duplicate pairs — the video analog of
    image_phash_neardup (the curation pass that collapses re-encoded /
    re-cut copies in a 100 TB video corpus).

    Candidate generation: exact equality on (frame_no, fhash) — a pair
    is a candidate iff >= 1 aligned frame hashes identically (any
    re-cut copy shares most frames verbatim at hash level). That is a
    shuffle on 12-byte keys, never pixels; like every banded dedup here
    it is quadratic only inside identical-hash buckets (inherent to
    dup-heavy corpora — same caveat as MinHash bands).
    Verify: total Hamming distance over aligned frame hashes <= max_ham,
    all-integer (xor + bit_count, JVM-side), so the DuckDB oracle
    replays every value from the pixel closed form."""
    fh = with_frame_hashes(videos)
    a, b = fh.alias("a"), fh.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.frame_no") == F.col("b.frame_no"))
            & (F.col("a.fhash") == F.col("b.fhash"))
            & (F.col("a.video_id") < F.col("b.video_id")),
        )
        .select(
            F.col("a.video_id").alias("va"), F.col("b.video_id").alias("vb")
        )
        .distinct()
    )
    ham = (
        cand.join(fh.alias("p"), F.col("va") == F.col("p.video_id"))
        .join(
            fh.alias("q"),
            (F.col("vb") == F.col("q.video_id"))
            & (F.col("p.frame_no") == F.col("q.frame_no")),
        )
        .groupBy("va", "vb")
        .agg(
            F.sum(F.expr("bit_count(p.fhash ^ q.fhash)"))
            .cast("int")
            .alias("hamming")
        )
    )
    return ham.filter(F.col("hamming") <= max_ham).select(
        F.col("va").alias("video_id_a"),
        F.col("vb").alias("video_id_b"),
        "hamming",
    )
