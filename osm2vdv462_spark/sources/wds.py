"""WebDataset-style tar-shard source/sink for the image+caption table.

At 10^12 images, image+caption corpora are not stored as one parquet
table of blobs but as pools of TAR SHARDS (the public WebDataset
convention: members ``<key>.<ext>`` grouped by key — ``0001.png`` +
``0001.txt`` + ``0001.json``), because sequential tar reads are the only
layout that feeds GPUs at wire speed from object storage. This module
speaks that format from scratch on the stdlib ``tarfile`` wire level:

* ``write_shards``: one tar per Spark partition, written EXECUTOR-side
  (only tiny manifest rows reach the driver), deterministic member
  order + zeroed mtimes so a rewrite is byte-stable;
* ``read_shards``: shard list -> one task per shard (the format's
  natural split unit, exactly how a 1000-executor cluster drains a
  100k-shard pool), each task streaming members sequentially and
  regrouping them into input_hint rows.

The sibling snaptable format (snaptable.py) is the analytics-side
storage; tar shards are the training-loader-side interchange. Round
trips between the two are exact (tests/test_wds.py), and the geo join
over a shard-read table hash-matches the same DuckDB oracle as the
parquet path (queries/geo_queries.py::wds_geo_assign).
"""

from __future__ import annotations

import glob as globmod
import io
import json
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string,"
    " caption string, phash long, lon double, lat double"
)

_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "lon", "lat"]


def write_shards(images: DataFrame, out_dir: str, shards: int | None = None) -> list[dict]:
    """Write the image table as WebDataset tar shards; returns the shard
    manifest [{shard, rows, bytes}]. One shard per partition (pass
    ``shards`` to repartition first); members per key: ``<id>.<fmt>``
    (encoded image), ``<id>.txt`` (caption), ``<id>.json`` (w/h/phash/
    lon/lat metadata). Writes happen on executors; rows are sorted by
    key inside a shard and mtimes zeroed, so shard bytes are a pure
    function of the partition's row set."""
    os.makedirs(out_dir, exist_ok=True)
    out_abs = os.path.abspath(out_dir)
    if shards is not None:
        images = images.repartition(shards, "image_id")

    def _write(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = []
        for pdf in batches:
            rows.extend(pdf[_COLS].itertuples(index=False))
        rows.sort(key=lambda r: r.image_id)
        path = os.path.join(out_abs, f"shard-{pid:06d}.tar")
        if rows:
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
                for r in rows:
                    meta = {
                        "w": int(r.w), "h": int(r.h), "phash": int(r.phash),
                        "lon": float(r.lon), "lat": float(r.lat),
                    }
                    for name, payload in (
                        (f"{r.image_id}.{r.fmt}", bytes(r.bytes)),
                        (f"{r.image_id}.txt", r.caption.encode()),
                        (f"{r.image_id}.json", json.dumps(meta, sort_keys=True).encode()),
                    ):
                        ti = tarfile.TarInfo(name)
                        ti.size = len(payload)
                        ti.mtime = 0
                        tf.addfile(ti, io.BytesIO(payload))
            data = buf.getvalue()
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, path)  # atomic: readers never see a torn shard
            yield pd.DataFrame(
                [(os.path.basename(path), len(rows), len(data))],
                columns=["shard", "rows", "bytes"],
            )
        else:
            yield pd.DataFrame(columns=["shard", "rows", "bytes"]).astype(
                {"shard": str, "rows": "int64", "bytes": "int64"}
            )

    manifest = (
        images.mapInPandas(_write, "shard string, rows long, bytes long")
        .collect()  # manifest rows only — one tiny row per shard
    )
    return sorted(
        ({"shard": r["shard"], "rows": r["rows"], "bytes": r["bytes"]} for r in manifest),
        key=lambda m: m["shard"],
    )


def read_shards(spark: SparkSession, path_or_glob: str | list[str]) -> DataFrame:
    """Tar-shard pool -> input_hint DataFrame, one task per shard.

    The shard list is the split plan (same move as read_pbf's blob
    index): tiny path rows are distributed, each task streams ITS tar
    sequentially — no seeks, no cross-shard shuffle, and a 100k-shard
    pool saturates any executor count up to the shard count."""
    if isinstance(path_or_glob, str):
        paths = sorted(
            globmod.glob(os.path.join(path_or_glob, "*.tar"))
            if os.path.isdir(path_or_glob)
            else globmod.glob(path_or_glob)
        )
    else:
        paths = sorted(path_or_glob)
    if not paths:
        raise FileNotFoundError(f"no tar shards match {path_or_glob!r}")
    pdf = spark.createDataFrame([(p,) for p in paths], "path string").repartitionByRange(
        len(paths), "path"
    )

    def _read(batches):
        for batch in batches:
            for path in batch["path"]:
                rows = {}
                with tarfile.open(path, mode="r") as tf:
                    for ti in tf:
                        stem, ext = os.path.splitext(ti.name)
                        payload = tf.extractfile(ti).read()
                        rec = rows.setdefault(stem, {"image_id": stem})
                        if ext == ".txt":
                            rec["caption"] = payload.decode()
                        elif ext == ".json":
                            rec.update(json.loads(payload))
                        else:
                            rec["bytes"] = payload
                            rec["fmt"] = ext[1:]
                yield pd.DataFrame(
                    [[rows[k][c] for c in _COLS] for k in sorted(rows)],
                    columns=_COLS,
                )

    return pdf.mapInPandas(_read, SCHEMA)
