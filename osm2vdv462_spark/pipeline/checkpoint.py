"""Stage checkpointing with per-partition lineage manifests (north rule:
"all stages are checkpoint-resumable with per-partition lineage manifests
and row/byte metrics").

Each stage materializes to parquet (stand-in for the Iceberg tables used
on a real cluster — same semantics: atomic snapshot + schema) plus a
manifest JSON recording:

* the stage's input snapshot ids (content fingerprints of its inputs),
* total rows / bytes and an order-insensitive content hash,
* one entry per output partition file with rows + bytes.

``materialize`` skips recomputation when a manifest exists whose input
snapshots match and whose files validate — so a rerun after a crash
resumes from the last good stage, and a rerun with identical inputs is a
no-op (verified bit-stable via the content hash). Content hash =
sum(xxhash64(all columns)) mod 2^63: commutative, so partitioning /
task order can't change it.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


def content_hash(df: DataFrame) -> int:
    """Order-insensitive 63-bit content hash over all columns.

    Map columns are canonicalized to sorted entry arrays first (Spark
    forbids hashing maps because their internal order is unspecified).
    """
    from pyspark.sql.types import MapType

    cols = []
    for f_ in df.schema.fields:
        c = F.col(f_.name)
        if isinstance(f_.dataType, MapType):
            c = F.array_sort(F.map_entries(c))
        cols.append(c)
    row = df.select(
        F.sum(
            F.pmod(F.xxhash64(*cols), F.lit(2**61 - 1)).cast("decimal(38,0)")
        ).alias("h")
    ).collect()[0]
    return int(row["h"] or 0) % (2**63)


def dir_snapshot(path: str) -> str:
    """Fingerprint of an input directory/file (names + sizes + mtimes)."""
    parts = []
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                parts.append(f"{f}:{st.st_size}:{int(st.st_mtime)}")
    elif os.path.exists(path):
        st = os.stat(path)
        parts.append(f"{os.path.basename(path)}:{st.st_size}:{int(st.st_mtime)}")
    import zlib

    return format(zlib.crc32("|".join(parts).encode()), "08x")


@dataclass
class StageCheckpoint:
    spark: SparkSession
    base_dir: str
    stats: dict = field(default_factory=dict)

    def _paths(self, name: str) -> tuple[str, str]:
        return (
            os.path.join(self.base_dir, name),
            os.path.join(self.base_dir, f"{name}.manifest.json"),
        )

    def _metrics_one_job(self, out) -> tuple[list[dict], int, int]:
        """(per-file partition metrics, total rows, content hash) in ONE
        Spark job: groupBy(input_file_name) with count + hash-sum."""
        from pyspark.sql.types import MapType

        cols = []
        for f_ in out.schema.fields:
            c = F.col(f_.name)
            if isinstance(f_.dataType, MapType):
                c = F.array_sort(F.map_entries(c))
            cols.append(c)
        per_file = (
            out.groupBy(F.input_file_name().alias("f"))
            .agg(
                F.count("*").alias("rows"),
                F.sum(
                    F.pmod(F.xxhash64(*cols), F.lit(2**61 - 1)).cast("decimal(38,0)")
                ).alias("h"),
            )
            .collect()
        )
        rows_by_file = {r["f"]: r["rows"] for r in per_file}
        total_rows = sum(rows_by_file.values())
        chash = int(sum(int(r["h"] or 0) for r in per_file)) % (2**63)
        return rows_by_file, total_rows, chash

    def _partition_files(self, data_path: str, rows_by_file: dict) -> list[dict]:
        files = []
        for f in sorted(os.listdir(data_path)):
            if f.endswith(".parquet"):
                full = os.path.join(data_path, f)
                match = [v for k, v in rows_by_file.items() if k.endswith(f)]
                files.append(
                    {"file": f, "bytes": os.path.getsize(full),
                     "rows": match[0] if match else 0}
                )
        return files

    def materialize(
        self,
        name: str,
        df_fn,
        input_snapshots: dict[str, str],
        force: bool = False,
    ) -> DataFrame:
        """Return the stage's DataFrame, computing it only if needed.

        ``df_fn``: zero-arg callable producing the stage DataFrame (lazy,
        so a resumed run never builds the skipped stage's plan).
        ``input_snapshots``: {input_name: snapshot_id} — mismatch with
        the stored manifest forces recomputation (lineage invalidation).
        """
        data_path, manifest_path = self._paths(name)
        if not force and os.path.exists(manifest_path):
            try:
                m = json.load(open(manifest_path))
                files_ok = all(
                    os.path.getsize(os.path.join(data_path, p["file"])) == p["bytes"]
                    for p in m["partitions"]
                )
                if m["input_snapshots"] == input_snapshots and files_ok:
                    self.stats[name] = {"skipped": True, **m["metrics"]}
                    return self.spark.read.parquet(data_path)
            except (OSError, KeyError, json.JSONDecodeError):
                pass  # invalid manifest -> recompute
        t0 = time.time()
        df = df_fn()
        df.write.mode("overwrite").parquet(data_path)
        out = self.spark.read.parquet(data_path)
        rows_by_file, total_rows, chash = self._metrics_one_job(out)
        partitions = self._partition_files(data_path, rows_by_file)
        metrics = {
            "rows": total_rows,
            "bytes": sum(p["bytes"] for p in partitions),
            "content_hash": chash,
            "wall_sec": round(time.time() - t0, 3),
        }
        manifest = {
            "stage": name,
            "created_unix": int(t0),
            "input_snapshots": input_snapshots,
            "metrics": metrics,
            "partitions": partitions,
        }
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh, indent=1)
        self.stats[name] = {"skipped": False, **metrics}
        return out

    def snapshot_of(self, name: str) -> str:
        """Snapshot id of a previously materialized stage (its content
        hash) — used as the input snapshot of downstream stages."""
        _, manifest_path = self._paths(name)
        m = json.load(open(manifest_path))
        return str(m["metrics"]["content_hash"])
