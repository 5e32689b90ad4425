"""Capture .explain('formatted') for the headline + document queries
into plans/r06/<query>_{before,after}.txt.

Usage:
    python tools/capture_plans_r06.py after             # current tree
    python tools/capture_plans_r06.py before <srcdir>   # round-start
        checkout (e.g. a git worktree of the baseline commit)

Run serialized with nothing else on the box (explain is driver-only and
cheap, but it spins a JVM)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

QUERIES = [
    "pip_assign",
    "pip_density",
    "pip_assign_shuffle",
    "knn_nearest_quay",
    "knn_top3",
    "dwithin_pairs",
    "membership_join",
    "pricing_summary",
    "top1_per_group",
    "dedup_exact",
    "minhash_dup_pairs",
    "embedding_top1",
    "image_integrity",
    "fused_assign_codegen",
    "audio_adpcm_features",
    "video_frame_stats",
    "image_exif_geotags",
]


def main() -> None:
    tag = sys.argv[1]
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
    sys.path.insert(0, src)
    out_dir = "/root/repo/plans/r06"
    os.makedirs(out_dir, exist_ok=True)
    from osm2vdv462_spark.session import get_spark

    spark = get_spark(f"plans-{tag}", cores=8)
    from osm2vdv462_spark import queries as q

    qs = {**q.queries(), **q.extra_queries()}
    sf = "/root/testdata/sf0.01"
    for name in QUERIES:
        try:
            df = qs[name](spark, sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            print("ok", name)
        except Exception as e:  # noqa: BLE001 — record, keep going
            print("FAIL", name, repr(e))
    spark.stop()


if __name__ == "__main__":
    main()
