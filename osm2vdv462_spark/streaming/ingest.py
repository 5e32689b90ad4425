"""Streaming ingestion into the snapshot table format, exactly-once.

The standard production shape for a continuously-growing 100 TB corpus:
``readStream -> foreachBatch -> append_table``. Structured Streaming
gives at-least-once microbatch REPLAY after a crash (a batch can be
re-delivered with the same epoch id); the table commit must therefore be
idempotent per epoch. We get exactly-once the same way the public
Iceberg/Delta streaming sinks do: each committed snapshot records the
(query id, epoch id) that produced it, and a replayed epoch that is
already in the table's history commits NOTHING — not an empty snapshot,
literally no new version.

Combined with snaptable's changelog reads (``read_table(since=...)``)
this closes the loop: a downstream consumer processes each ingest
snapshot exactly once too, so the whole pipeline is end-to-end
exactly-once without a coordinator — the version-hint flip is the only
commit point anywhere.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame

from ..sources import snaptable as st


def _committed_epochs(table_path: str) -> set[tuple[str, int]]:
    """(query_id, epoch_id) pairs already in the table history — read
    from the snapshot metadata (O(versions) JSON reads, no data IO)."""
    meta = os.path.join(table_path, "metadata")
    out: set[tuple[str, int]] = set()
    if not os.path.isdir(meta):
        return out
    for name in os.listdir(meta):
        if not (name.startswith("v") and name.endswith(".json")):
            continue
        with open(os.path.join(meta, name)) as fh:
            snap = json.load(fh)
        src = snap.get("stream_epoch")
        if src is not None:
            out.add((src["query_id"], src["epoch_id"]))
    return out


def append_epoch(
    batch_df: DataFrame,
    table_path: str,
    query_id: str,
    epoch_id: int,
    *,
    cluster_by=None,
    files_hint: int = 4,
) -> int | None:
    """Idempotent per-epoch append: commit batch_df as a new snapshot
    tagged with (query_id, epoch_id), or do NOTHING if that epoch is
    already in the history (crash-replay path). Returns the committed
    version, or None for a skipped replay / empty batch."""
    if (query_id, int(epoch_id)) in _committed_epochs(table_path):
        return None  # replayed microbatch — already durable
    tag = {"query_id": query_id, "epoch_id": int(epoch_id)}
    if not os.path.exists(os.path.join(table_path, "metadata", st._HINT)):
        new = st._write_data_files(batch_df, table_path, cluster_by, files_hint)
        if not new:
            return None
        snap = {
            "version": 1, "parent": None, "ts": time.time(),
            "operation": "append", "stream_epoch": tag,
            "schema": json.loads(batch_df.schema.json()),
            "cluster_by": cluster_by, "files": new,
            "total_rows": sum(f["stats"]["rows"] for f in new),
        }
        return st._commit(table_path, snap)
    parent_v = st.current_version(table_path)
    parent = st._load_snapshot(table_path, parent_v)
    new = st._write_data_files(
        batch_df, table_path, parent.get("cluster_by"), files_hint
    )
    if not new:
        return None
    for f in new:
        f["added_in"] = parent_v + 1
    snap = {
        "props": parent.get("props", {}),
        "version": parent_v + 1, "parent": parent_v,
        "ts": time.time(),
        "operation": "append", "stream_epoch": tag,
        "schema": parent["schema"],
        "cluster_by": parent.get("cluster_by"),
        "files": parent["files"] + new,
        # pending merge-on-read state MUST ride along or deleted rows
        # would resurrect in the newest snapshot
        "deletes": parent.get("deletes", []),
        "eq_deletes": parent.get("eq_deletes", []),
        "total_rows": parent["total_rows"]
        + sum(f["stats"]["rows"] for f in new),
    }
    return st._commit(table_path, snap)


def stream_to_table(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    *,
    ingest_id: str = "ingest",
    cluster_by=None,
    files_hint: int = 4,
):
    """Wire a streaming DataFrame into the table: returns the started
    StreamingQuery (AvailableNow trigger — drain what exists, then
    stop; swap the trigger for continuous tailing in production).
    ``ingest_id`` names the logical stream; epoch ids are stable across
    restarts from the same checkpoint, so (ingest_id, epoch) dedups
    replays."""

    def _sink(batch_df: DataFrame, epoch_id: int):
        append_epoch(
            batch_df, table_path, ingest_id, epoch_id,
            cluster_by=cluster_by, files_hint=files_hint,
        )

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
