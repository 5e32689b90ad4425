"""Snapshot table format: from-scratch manifest/snapshot layout with
file-level column statistics and manifest-driven scan pruning.

The north rule runs the engine "over Iceberg tables" of image+caption
pairs. No table-format runtime ships in this sandbox, so this module
implements the three properties that make that design work at 10^12
rows, from scratch on plain parquet + JSON (layout modeled on the
PUBLIC Apache Iceberg spec's HadoopCatalog mode — metadata/version
files + a version hint — reimplemented, not ported):

* **Snapshot isolation + atomic commits.** Data files are written and
  fsynced first; a commit is a single atomic ``os.replace`` of the
  ``version-hint.text`` pointer. Readers resolve the pointer once and
  then read an immutable file list — a concurrent append can never
  tear a scan, and a crashed write leaves only invisible orphan files.
* **O(new-data) appends + time travel.** Snapshot N+1's manifest is
  snapshot N's file list plus the new files; nothing is rewritten.
  Every snapshot stays readable (``read_table(..., snapshot=n)``).
* **Manifest-driven file pruning.** The manifest records per-file row
  counts, bytes, and per-column min/max (harvested from parquet
  footers via pyarrow — footer-only, the data pages are never read).
  ``read_table(filters=...)`` drops whole files whose stats cannot
  match, BEFORE Spark ever lists or opens them. At 100 TB this is the
  difference between "scan one day's files" and "scan the table":
  partition pruning that works on any sorted/clustered column, not
  just directory keys.

Write clustering: ``cluster_by`` range-repartitions + sorts the data
so each file owns a tight key range (the public Iceberg write
"sort order" strategy) — that is what makes min/max pruning sharp.

Point lookups: ``bloom_cols`` adds per-file BLOOM FILTERS to the
manifest (the Iceberg/Parquet bloom metric, manifest-level) so
equality lookups on keys the clustering scatters (image_id on a
lon/lat-clustered table) prune to ~1 file instead of scanning the
corpus — see the blooms section below.

Reference parity note: the reference pipeline stages through Postgres
tables (docker-compose.yml services + SQL views); this is the
cluster-shaped analogue of those stage tables, as BASELINE.json's
north rule prescribes.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import time
import uuid

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

_HINT = "version-hint.text"

# filter ops understood by the pruner: (col, op, literal). "in" takes a
# list/tuple/set literal — the batched point-lookup shape: ONE scan
# whose plan keeps only files where at least one member may live
# (bloom + min/max probed per member).
_OPS = ("==", "<", "<=", ">", ">=", "in")


class CommitConflict(Exception):
    """Another writer claimed the target snapshot version first.
    Data files already staged by the loser remain invisible orphans;
    append-shaped commits rebase + retry automatically."""


# --------------------------------------------------------------- stats


def _file_stats(path: str) -> dict:
    """Per-column min/max + rows from the parquet FOOTER (no data-page
    IO). Columns whose physical type has no usable order (binary
    payloads, nested) are skipped — they simply never prune."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested field — skip
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
                except UnicodeDecodeError:
                    continue
            if not isinstance(lo, (int, float, str, bool)):
                continue
            if name not in mins or lo < mins[name]:
                mins[name] = lo
            if name not in maxs or hi > maxs[name]:
                maxs[name] = hi
    return {
        "rows": md.num_rows,
        "bytes": os.path.getsize(path),
        "min": mins,
        "max": maxs,
    }


# --------------------------------------------------------------- blooms
#
# Per-file BLOOM FILTERS in the manifest, for equality lookups on
# columns min/max cannot prune (the public Iceberg/Parquet bloom-filter
# metric, reimplemented at the manifest level): a table clustered by
# (lon, lat) interleaves image_ids across every file, so each file's
# id min/max spans the whole key range and a point lookup scans the
# corpus. A per-file bloom answers "is this key DEFINITELY absent?" in
# O(k) bit probes per file — at 10^12 rows that turns "find one image
# by id" from a table scan into opening ~1 file. Pruning stays a
# superset guarantee: a false positive only costs one extra file scan,
# and read_table re-applies the predicate row-level regardless.

_BLOOM_BITS = 1 << 17  # bits per (file, col); fixed so partials OR-combine
_BLOOM_K = 7  # hash probes; fpp ~0.5% at ~13k distinct keys per file


def _bloom_key_bytes(v) -> bytes:
    """Canonical hash input per key type — MUST be identical between
    build (executor) and probe (planner). Floats are excluded: equality
    pruning on floats is ill-defined across engines."""
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
        return str(int(v)).encode()
    raise TypeError(
        f"bloom columns take string/integer/binary keys, not {type(v).__name__}"
    )


def _bloom_indices(key: bytes, m: int, k: int) -> list[int]:
    """k probe positions via double hashing over one md5 (stable across
    processes/runs, unlike hash())."""
    d = hashlib.md5(key).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _harvest_blooms(
    spark: SparkSession, staging: str, cols: list[str], m: int = _BLOOM_BITS
) -> dict:
    """{staged file basename: {col: {m, k, bits(b64)}}} — computed
    EXECUTOR-side: a column-pruned scan of the staged files builds one
    partial bitmap per (task, file, col); fixed m makes partials
    OR-combinable, so the only shuffle carries KB bitmaps, never rows.
    The data pass this costs is the same class as the write itself and
    runs before the commit, like Iceberg's write-time metrics."""
    import pandas as pd

    from ..operators import _guard

    k = _BLOOM_K
    src = spark.read.parquet(staging).select(
        F.input_file_name().alias("f"), *cols
    )

    def _partials(batches):
        # self-contained closure (no module-global references): the
        # snaptable API must work under a PLAIN session with no shipped
        # package — nested defs are what cloudpickle serializes by
        # value. Hash scheme kept in lockstep with _bloom_key_bytes /
        # _bloom_indices; TestBloom round-trips build against probe.
        import hashlib as _hl

        import numpy as _np

        def _key(v):
            if isinstance(v, str):
                return v.encode("utf-8")
            if isinstance(v, (bytes, bytearray)):
                return bytes(v)
            return str(int(v)).encode()

        acc: dict = {}
        for pdf in batches:
            for fname, grp in pdf.groupby("f"):
                base = os.path.basename(fname)
                for c in cols:
                    bits = acc.get((base, c))
                    if bits is None:
                        bits = acc[(base, c)] = _np.zeros(m // 8, _np.uint8)
                    for v in grp[c].dropna().unique():
                        d = _hl.md5(_key(v)).digest()
                        h1 = int.from_bytes(d[:8], "little")
                        h2 = int.from_bytes(d[8:], "little") | 1
                        for i in range(k):
                            idx = (h1 + i * h2) % m
                            bits[idx >> 3] |= _np.uint8(1 << (idx & 7))
        yield pd.DataFrame(
            [(f, c, b.tobytes()) for (f, c), b in acc.items()],
            columns=["f", "col", "bits"],
        )

    def _combine(pdf):
        import numpy as _np

        import pandas as _pd

        out = _np.zeros(m // 8, _np.uint8)
        for b in pdf["bits"]:
            out |= _np.frombuffer(b, _np.uint8)
        return _pd.DataFrame(
            [(pdf["f"].iloc[0], pdf["col"].iloc[0], out.tobytes())],
            columns=["f", "col", "bits"],
        )

    rows = _guard.collect_dim(
        src.mapInPandas(_partials, "f string, col string, bits binary")
        .groupBy("f", "col")
        .applyInPandas(_combine, "f string, col string, bits binary"),
        "snaptable bloom manifests (files x bloom_cols rows)",
    )
    out: dict = {}
    for r in rows:
        out.setdefault(r["f"], {})[r["col"]] = {
            "m": m,
            "k": k,
            "bits": base64.b64encode(r["bits"]).decode("ascii"),
        }
    return out


def _bloom_may_contain(f: dict, col: str, val) -> bool:
    """False iff the file's bloom PROVES the key absent."""
    bl = f.get("blooms", {}).get(col)
    if bl is None:
        return True
    try:
        key = _bloom_key_bytes(val)
    except TypeError:
        return True
    bits = np.frombuffer(base64.b64decode(bl["bits"]), np.uint8)
    for idx in _bloom_indices(key, bl["m"], bl["k"]):
        if not (int(bits[idx >> 3]) >> (idx & 7)) & 1:
            return False
    return True


def _may_match(f: dict, col: str, op: str, val) -> bool:
    """Can any row in file f satisfy (col op val)? Missing stats => yes.
    Null rows never satisfy any comparison, so min/max bounds (which
    ignore nulls) are sound."""
    if op == "in":
        return any(_may_match(f, col, "==", v) for v in val)
    if op == "==" and not _bloom_may_contain(f, col, val):
        return False
    lo = f["stats"]["min"].get(col)
    hi = f["stats"]["max"].get(col)
    if lo is None or hi is None:
        return True
    try:
        if op == "==":
            return lo <= val <= hi
        if op == "<":
            return lo < val
        if op == "<=":
            return lo <= val
        if op == ">":
            return hi > val
        if op == ">=":
            return hi >= val
    except TypeError:  # cross-type comparison — never prune on it
        return True
    return True


# --------------------------------------------------------------- write


_Z_BITS = 16


def _zvalue(df: DataFrame, cols: list[str]):
    """Morton/Z-order key over numeric columns (public Iceberg/Delta
    Z-ORDER write strategy, reimplemented): per-column value -> 16-bit
    bucket between the column's global bounds, buckets bit-interleaved
    into one long. Pure Catalyst bit arithmetic (whole-stage codegen) —
    the only driver work is one 1-row bounds aggregate."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    b = df.agg(*aggs).first()  # 1 row by construction
    top = (1 << _Z_BITS) - 1
    buckets = []
    for c in cols:
        lo, hi = float(b[f"lo_{c}"]), float(b[f"hi_{c}"])
        span = (hi - lo) or 1.0
        buckets.append(
            F.least(
                F.greatest(
                    F.floor(
                        (F.col(c).cast("double") - F.lit(lo))
                        / F.lit(span) * F.lit(float(top))
                    ),
                    F.lit(0),
                ),
                F.lit(top),
            ).cast("long")
        )
    n = len(buckets)
    z = None
    for i in range(_Z_BITS):
        for j, bucket in enumerate(buckets):
            bit = F.shiftleft(
                F.shiftright(bucket, i).bitwiseAND(F.lit(1)), i * n + j
            )
            z = bit if z is None else z.bitwiseOR(bit)
    return z


def _write_data_files(
    df: DataFrame, table_path: str, cluster_by, files_hint: int,
    bloom_cols: list[str] | None = None,
) -> list[dict]:
    """Write df as new immutable data files under <table>/data and
    return their manifest entries (executor-side write; the driver only
    harvests footers). ``cluster_by``: a column name for 1-D range
    clustering, or a LIST of numeric columns for Z-order clustering
    (tight per-file ranges on EVERY listed column -> multi-dimension
    min/max pruning, e.g. bounding-box scans on (lon, lat)).
    ``bloom_cols``: columns that additionally get per-file bloom
    filters in the manifest (equality pruning on keys the clustering
    scatters — see the blooms section)."""
    data_dir = os.path.join(table_path, "data")
    os.makedirs(data_dir, exist_ok=True)
    if isinstance(cluster_by, (list, tuple)):
        df = (
            df.withColumn("_z", _zvalue(df, list(cluster_by)))
            .repartitionByRange(files_hint, F.col("_z"))
            .sortWithinPartitions("_z")
            .drop("_z")
        )
    elif cluster_by is not None:
        # tight per-file key ranges -> sharp min/max pruning
        df = df.repartitionByRange(files_hint, F.col(cluster_by)) \
               .sortWithinPartitions(cluster_by)
    staging = os.path.join(table_path, f"_staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    blooms: dict = {}
    want = [c for c in (bloom_cols or []) if c in df.columns]
    if want:
        hashable = {"string", "binary", "byte", "short", "integer", "long"}
        for fld in df.schema.fields:
            if fld.name in want and fld.dataType.typeName() not in hashable:
                raise ValueError(
                    f"bloom column {fld.name!r} has type"
                    f" {fld.dataType.typeName()!r}; blooms support"
                    " string/integral/binary keys only"
                )
        blooms = _harvest_blooms(df.sparkSession, staging, want)
    entries = []
    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        final = os.path.join(data_dir, f"{uuid.uuid4().hex}.parquet")
        os.replace(os.path.join(staging, name), final)
        st = _file_stats(final)
        if st["rows"] == 0:
            os.remove(final)
            continue
        entry = {"path": os.path.relpath(final, table_path), "stats": st}
        if name in blooms:
            entry["blooms"] = blooms[name]
        entries.append(entry)
    # clear staging remnants (_SUCCESS, .crc)
    for name in os.listdir(staging):
        os.remove(os.path.join(staging, name))
    os.rmdir(staging)
    return entries


def _commit(table_path: str, snapshot: dict) -> int:
    """Atomically publish a snapshot: claim vN.json with an EXCLUSIVE
    create (optimistic concurrency — the public Iceberg commit
    protocol: first writer of the version file wins, losers raise
    CommitConflict and must rebase on the new parent), then flip the
    version hint with os.replace (POSIX-atomic)."""
    meta = os.path.join(table_path, "metadata")
    os.makedirs(meta, exist_ok=True)
    version = snapshot["version"]
    vpath = os.path.join(meta, f"v{version}.json")
    try:
        fd = os.open(vpath, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    except FileExistsError:
        raise CommitConflict(
            f"snapshot v{version} was committed concurrently; rebase on"
            " the new parent and retry"
        ) from None
    with os.fdopen(fd, "w") as fh:
        json.dump(snapshot, fh)
    tmp = os.path.join(meta, f"_hint_{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(meta, _HINT))
    return version


def table_props(table_path: str, *, snapshot: int | None = None) -> dict:
    """Free-form properties of a snapshot (default: current)."""
    v = snapshot if snapshot is not None else current_version(table_path)
    return _load_snapshot(table_path, v).get("props", {})


def current_version(table_path: str) -> int:
    with open(os.path.join(table_path, "metadata", _HINT)) as fh:
        return int(fh.read().strip())


def _load_snapshot(table_path: str, version: int) -> dict:
    with open(os.path.join(table_path, "metadata", f"v{version}.json")) as fh:
        return json.load(fh)


def create_table(
    df: DataFrame,
    table_path: str,
    *,
    cluster_by: str | list[str] | None = None,
    bloom_cols: list[str] | None = None,
    files_hint: int = 8,
    props: dict | None = None,
) -> int:
    """Create the table at snapshot v1 from df. Returns the version.
    ``props``: free-form table properties carried on the snapshot
    (e.g. an incremental view's source watermark). ``bloom_cols``:
    table-level setting (inherited by appends/compaction/upserts, like
    ``cluster_by``) — these columns get per-file bloom filters for
    equality-lookup pruning."""
    os.makedirs(table_path, exist_ok=True)
    files = _write_data_files(df, table_path, cluster_by, files_hint, bloom_cols)
    for f in files:
        f["added_in"] = 1
    snap = {
        "props": props or {},
        "version": 1,
        "parent": None,
        "ts": time.time(),
        "schema": json.loads(df.schema.json()),
        "cluster_by": cluster_by,
        "bloom_cols": bloom_cols,
        "files": files,
        "deletes": [],
        "total_rows": sum(f["stats"]["rows"] for f in files),
    }
    return _commit(table_path, snap)


def _evolve_schema(parent_schema: dict, df, allow: bool) -> dict:
    """Union the table schema with the appended frame's (public Iceberg
    schema-evolution rules for the append path): new columns are ADDED
    to the table schema (old files read them as null), columns the
    frame omits stay (its files read them as null), and a TYPE change
    on an existing column always raises — evolution is additive only."""
    new_fields = json.loads(df.schema.json())["fields"]
    old = {f["name"]: f for f in parent_schema["fields"]}
    for f in new_fields:
        if f["name"] in old and old[f["name"]]["type"] != f["type"]:
            raise ValueError(
                f"column {f['name']!r} type change"
                f" {old[f['name']]['type']!r} -> {f['type']!r}:"
                " unsupported (rewrite the table instead)"
            )
    added = [dict(f, nullable=True) for f in new_fields if f["name"] not in old]
    missing = [n for n in old if n not in {f["name"] for f in new_fields}]
    if (added or missing) and not allow:
        raise ValueError(
            f"appended schema differs from table schema (new: "
            f"{[f['name'] for f in added]}, omitted: {missing}); pass"
            " allow_schema_evolution=True to evolve additively"
        )
    if not added:
        return parent_schema
    return {**parent_schema, "fields": parent_schema["fields"] + added}


def append_table(
    df: DataFrame,
    table_path: str,
    *,
    files_hint: int = 8,
    allow_schema_evolution: bool = False,
) -> int:
    """Append df as a new snapshot: parent's file list + new files only
    (O(new data) — nothing is rewritten, the parent stays readable).
    ``allow_schema_evolution``: accept an additively-different frame
    schema (see _evolve_schema); off by default so a malformed producer
    fails fast instead of silently widening the table."""
    parent_v = current_version(table_path)
    parent = _load_snapshot(table_path, parent_v)
    schema = _evolve_schema(parent["schema"], df, allow_schema_evolution)
    new_files = _write_data_files(
        df, table_path, parent.get("cluster_by"), files_hint,
        parent.get("bloom_cols"),
    )
    # optimistic concurrency: an append commutes with other appends, so
    # on CommitConflict rebase onto the new parent (data files are
    # already durable — only the manifest is rebuilt) and retry.
    for _ in range(16):
        for f in new_files:
            f["added_in"] = parent_v + 1
        snap = {
            "props": parent.get("props", {}),
            "version": parent_v + 1,
            "parent": parent_v,
            "ts": time.time(),
            "operation": "append",
            "schema": schema,
            "cluster_by": parent.get("cluster_by"),
            "bloom_cols": parent.get("bloom_cols"),
            "files": parent["files"] + new_files,
            "deletes": parent.get("deletes", []),
            "eq_deletes": parent.get("eq_deletes", []),
            "total_rows": parent["total_rows"]
            + sum(f["stats"]["rows"] for f in new_files),
        }
        try:
            return _commit(table_path, snap)
        except CommitConflict:
            # walk forward to the claimed version even if the winner
            # hasn't flipped the hint yet (claim order IS commit order)
            try:
                parent = _load_snapshot(table_path, parent_v + 1)
                parent_v += 1
            except (OSError, json.JSONDecodeError):
                time.sleep(0.05)  # winner mid-write; re-read the hint
                parent_v = current_version(table_path)
                parent = _load_snapshot(table_path, parent_v)
            schema = _evolve_schema(parent["schema"], df, allow_schema_evolution)
    raise CommitConflict("append could not commit after 16 rebases")


def compact_table(
    spark: SparkSession, table_path: str, *, files_hint: int = 8
) -> int:
    """Rewrite the current snapshot's data into ~files_hint larger files
    (public Iceberg ``rewrite_data_files`` semantics): commits an
    ``operation: replace`` snapshot whose file list is ONLY the new
    files; content is bit-identical, old files stay on disk so every
    earlier snapshot remains time-travelable until expire_snapshots.

    The 100 TB motive is the small-file problem: a day of streaming
    appends leaves thousands of KB-scale files whose per-file open +
    footer cost dominates scans; compaction re-clusters them (same
    cluster_by, so min/max pruning sharpens back up) without blocking
    readers — the hint flip is the only point of mutation."""
    parent_v = current_version(table_path)
    parent = _load_snapshot(table_path, parent_v)
    current = read_table(spark, table_path)  # applies pending deletes
    new_files = _write_data_files(
        current, table_path, parent.get("cluster_by"), files_hint,
        parent.get("bloom_cols"),
    )
    for f in new_files:
        f["added_in"] = parent_v + 1
    snap = {
        "props": parent.get("props", {}),
        "version": parent_v + 1,
        "parent": parent_v,
        "ts": time.time(),
        "operation": "replace",
        "schema": parent["schema"],
        "cluster_by": parent.get("cluster_by"),
        "bloom_cols": parent.get("bloom_cols"),
        "files": new_files,
        "deletes": [],  # materialized by the rewrite
        "eq_deletes": [],
        "total_rows": sum(f["stats"]["rows"] for f in new_files),
    }
    return _commit(table_path, snap)


def upsert_table(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    key: str | list[str],
    *,
    files_hint: int = 8,
    props: dict | None = None,
) -> int:
    """MERGE/upsert by key, merge-on-read (public Iceberg v2
    EQUALITY-DELETE semantics, reimplemented): one snapshot that (a)
    writes df as new data files and (b) writes df's distinct key set as
    an equality-delete FILE applying to all files present before this
    version — so existing rows with those keys disappear and df's rows
    replace them, atomically, with no data file rewritten. Readers
    anti-join applicable delete files (broadcast-sized key sets stay
    map-side); ``compact_table`` materializes. This is the CDC-apply
    path at 100 TB: a day of updates commits in O(changed rows)."""
    keys = [key] if isinstance(key, str) else list(key)
    parent_v = current_version(table_path)
    parent = _load_snapshot(table_path, parent_v)
    version = parent_v + 1
    for k in keys:
        if k not in {f["name"] for f in parent["schema"]["fields"]}:
            raise ValueError(f"upsert key {k!r} not in table schema")
    del_dir = os.path.join(table_path, "deletes")
    os.makedirs(del_dir, exist_ok=True)
    staging = os.path.join(table_path, f"_delstage_{uuid.uuid4().hex}")
    df.select(*keys).distinct().coalesce(1).write.mode("overwrite").parquet(staging)
    del_path = os.path.join(del_dir, f"{uuid.uuid4().hex}.parquet")
    part = next(
        n for n in sorted(os.listdir(staging)) if n.endswith(".parquet")
    )
    os.replace(os.path.join(staging, part), del_path)
    for name in os.listdir(staging):
        os.remove(os.path.join(staging, name))
    os.rmdir(staging)
    new_files = _write_data_files(
        df, table_path, parent.get("cluster_by"), files_hint,
        parent.get("bloom_cols"),
    )
    for f in new_files:
        f["added_in"] = version
    snap = {
        "props": {**parent.get("props", {}), **(props or {})},
        "version": version,
        "parent": parent_v,
        "ts": time.time(),
        "operation": "upsert",
        "schema": parent["schema"],
        "cluster_by": parent.get("cluster_by"),
        "bloom_cols": parent.get("bloom_cols"),
        "files": parent["files"] + new_files,
        "deletes": parent.get("deletes", []),
        "eq_deletes": parent.get("eq_deletes", [])
        + [{"path": os.path.relpath(del_path, table_path),
            "keys": keys, "at": parent_v}],
        "total_rows": parent["total_rows"]
        + sum(f["stats"]["rows"] for f in new_files),
    }
    return _commit(table_path, snap)


def _fully_covered(f: dict, conds: list) -> bool:
    """True iff EVERY row the file can contain satisfies every conjunct
    (file min/max entirely inside the deleted region) — then the file
    can be dropped from the manifest at delete-commit time, zero IO."""
    for col, op, val in conds:
        lo = f["stats"]["min"].get(col)
        hi = f["stats"]["max"].get(col)
        if lo is None or hi is None:
            return False
        try:
            if op == "in":
                ok = lo == hi and lo in val
            else:
                ok = {
                    "==": lo == val and hi == val,
                    "<": hi < val,
                    "<=": hi <= val,
                    ">": lo > val,
                    ">=": lo >= val,
                }[op]
        except TypeError:
            return False
        if not ok:
            return False
    return True


def delete_where(table_path: str, filters: list[tuple]) -> int:
    """Row-level delete, merge-on-read (public Iceberg v2 equality/
    predicate-delete semantics, reimplemented): commits a METADATA-ONLY
    snapshot carrying the delete predicate (AND of ``filters``
    conjuncts); no data file is rewritten. Readers anti-apply pending
    deletes at scan time; ``compact_table`` materializes them. The
    predicate applies to rows present AT THIS VERSION only — files
    appended later are untouched (each file carries ``added_in``, each
    delete its commit version). Files whose min/max lie entirely inside
    the deleted region are dropped from the manifest immediately (the
    common 'delete an expired day' case costs zero IO)."""
    for col, op, val in filters:
        if op not in _OPS:
            raise ValueError(f"unsupported delete op {op!r}")
    parent_v = current_version(table_path)
    parent = _load_snapshot(table_path, parent_v)
    version = parent_v + 1
    conds = [list(c) for c in filters]
    kept, dropped_rows = [], 0
    for f in parent["files"]:
        if _fully_covered(f, conds):
            dropped_rows += f["stats"]["rows"]
        else:
            kept.append(f)
    snap = {
        "props": parent.get("props", {}),
        "version": version,
        "parent": parent_v,
        "ts": time.time(),
        "operation": "delete",
        "schema": parent["schema"],
        "cluster_by": parent.get("cluster_by"),
        "bloom_cols": parent.get("bloom_cols"),
        "files": kept,
        "deletes": parent.get("deletes", [])
        + [{"at": parent_v, "conds": conds}],
        "eq_deletes": parent.get("eq_deletes", []),
        # upper bound: partially-covered files keep their full row count
        # until compaction materializes the delete
        "total_rows": parent["total_rows"] - dropped_rows,
    }
    return _commit(table_path, snap)


def expire_snapshots(table_path: str, *, keep_from: int) -> dict:
    """Garbage-collect history: drop snapshots older than ``keep_from``
    and delete data files no kept snapshot references (the files a
    compaction replaced). Returns {snapshots_removed, files_removed,
    bytes_removed}. Time travel to an expired version raises thereafter;
    the current snapshot and everything >= keep_from are untouched."""
    cur = current_version(table_path)
    keep_from = min(keep_from, cur)
    meta = os.path.join(table_path, "metadata")
    versions = sorted(
        int(n[1:-5]) for n in os.listdir(meta)
        if n.startswith("v") and n.endswith(".json")
    )
    def _paths_of(snap: dict) -> set[str]:
        out = {f["path"] for f in snap["files"]}
        out.update(g["path"] for g in snap.get("eq_deletes", []))
        return out

    kept_files: set[str] = set()
    for v in versions:
        if v >= keep_from:
            kept_files.update(_paths_of(_load_snapshot(table_path, v)))
    out = {"snapshots_removed": 0, "files_removed": 0, "bytes_removed": 0}
    for v in versions:
        if v >= keep_from:
            continue
        for rel in sorted(_paths_of(_load_snapshot(table_path, v))):
            full = os.path.join(table_path, rel)
            if rel not in kept_files and os.path.exists(full):
                out["bytes_removed"] += os.path.getsize(full)
                os.remove(full)
                out["files_removed"] += 1
        os.remove(os.path.join(meta, f"v{v}.json"))
        out["snapshots_removed"] += 1
    return out


# ---------------------------------------------------------------- read


def plan_scan(
    table_path: str,
    *,
    snapshot: int | None = None,
    since: int | None = None,
    filters: list[tuple] | None = None,
) -> dict:
    """Resolve the file list for a scan: snapshot resolution + manifest
    min/max pruning. Pure metadata — no Spark, no data IO. Returns
    {files, schema, files_total, files_scanned, rows_skipped}.

    ``since``: INCREMENTAL read (public Iceberg "incremental scan"
    semantics for an append-only table): only files added AFTER
    snapshot ``since`` up to ``snapshot`` are planned. Because appends
    never rewrite files, the diff of the two immutable file lists IS
    the exact changelog — a daily consumer processes each day's new
    data in O(new files) metadata time, never rescanning the corpus."""
    version = snapshot if snapshot is not None else current_version(table_path)
    snap = _load_snapshot(table_path, version)
    files = snap["files"]
    if since is not None:
        if since > version:
            raise ValueError(f"since={since} is newer than snapshot {version}")
        for w in range(since + 1, version + 1):
            op = _load_snapshot(table_path, w).get("operation")
            if op in ("replace", "delete", "upsert"):
                raise ValueError(
                    f"incremental read {since}->{version} crosses a"
                    f" {op} snapshot v{w}: the file diff is not a pure"
                    " append changelog there — read from"
                    f" since={w} or use a full scan"
                )
        base = {f["path"] for f in _load_snapshot(table_path, since)["files"]}
        files = [f for f in files if f["path"] not in base]
    total = len(files)
    base_rows = sum(f["stats"]["rows"] for f in files)
    if filters:
        for col, op, val in filters:
            if op not in _OPS:
                raise ValueError(f"unsupported pruning op {op!r}")
            files = [f for f in files if _may_match(f, col, op, val)]
    return {
        "version": version,
        "schema": snap["schema"],
        "files": [os.path.join(table_path, f["path"]) for f in files],
        "entries": files,
        "deletes": snap.get("deletes", []),
        "eq_deletes": snap.get("eq_deletes", []),
        "files_total": total,
        "files_scanned": len(files),
        "rows_skipped": base_rows - sum(f["stats"]["rows"] for f in files),
    }


def read_table(
    spark: SparkSession,
    table_path: str,
    *,
    snapshot: int | None = None,
    since: int | None = None,
    filters: list[tuple] | None = None,
    report: dict | None = None,
) -> DataFrame:
    """Scan the table at a snapshot. ``filters`` is a list of
    (col, op, literal) conjuncts; files whose footer stats cannot match
    are dropped before Spark ever opens them, and the SAME predicate is
    re-applied row-level (pruning is a superset guarantee, not the
    filter itself). ``since`` restricts the scan to files appended
    after that snapshot (incremental read). ``report`` receives the
    plan_scan() counters."""
    plan = plan_scan(table_path, snapshot=snapshot, since=since, filters=filters)
    if report is not None:
        report.update(
            {k: plan[k] for k in ("version", "files_total", "files_scanned",
                                  "rows_skipped")}
        )
    schema = StructType.fromJson(plan["schema"])
    if not plan["files"]:
        return spark.createDataFrame([], schema)

    def _cmp(col, op, val):
        c = F.col(col)
        if op == "in":
            return c.isin(list(val))
        return {"==": c == val, "<": c < val, "<=": c <= val,
                ">": c > val, ">=": c >= val}[op]

    # merge-on-read: bucket files by which pending delete groups apply
    # (a delete at version V covers files added at or before V), read
    # each bucket once, anti-apply its predicate groups and anti-join
    # its equality-delete files. Pure appends -> one bucket with no
    # deletes -> identical plan to before.
    deletes = plan["deletes"]
    eq_deletes = plan["eq_deletes"]
    buckets: dict[tuple, list[str]] = {}
    for entry in plan["entries"]:
        added = entry.get("added_in", 0)
        key = (
            tuple(i for i, g in enumerate(deletes) if added <= g["at"]),
            tuple(i for i, g in enumerate(eq_deletes) if added <= g["at"]),
        )
        buckets.setdefault(key, []).append(
            os.path.join(table_path, entry["path"])
        )
    parts = []
    for (pred_idx, eq_idx), paths in sorted(buckets.items()):
        df = spark.read.schema(schema).parquet(*paths)
        for i in pred_idx:
            cond = None
            for col, op, val in deletes[i]["conds"]:
                c = _cmp(col, op, val)
                cond = c if cond is None else (cond & c)
            # null comparisons -> null -> not deleted (coalesce False)
            df = df.filter(~F.coalesce(cond, F.lit(False)))
        for i in eq_idx:
            g = eq_deletes[i]
            dead = spark.read.parquet(os.path.join(table_path, g["path"]))
            # key sets are O(changed rows) — broadcast keeps the
            # anti-join map-side at scale
            df = df.join(F.broadcast(dead), on=g["keys"], how="left_anti")
        parts.append(df)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    for col, op, val in filters or []:
        df = df.filter(_cmp(col, op, val))
    return df


def count_rows(
    spark: SparkSession,
    table_path: str,
    *,
    snapshot: int | None = None,
    filters: list[tuple] | None = None,
    report: dict | None = None,
) -> int:
    """COUNT(*) with aggregate pushdown into the manifests (the public
    Iceberg/DuckDB metadata-count optimization): files whose min/max
    prove EVERY row matches the filters are counted from their footer
    row counts with zero data IO; only boundary files (stats overlap
    the predicate) are actually scanned, with the row-level predicate
    re-applied. Falls back to a full scan-count when merge-on-read
    deletes are pending (metadata rows would overcount).

    ``report`` receives {files_total, files_meta_counted,
    files_scanned, rows_from_metadata} so callers can assert the
    metadata path actually fired."""
    plan = plan_scan(table_path, snapshot=snapshot, filters=filters)
    conds = filters or []
    if plan["deletes"] or plan["eq_deletes"]:
        df = read_table(
            spark, table_path, snapshot=snapshot, filters=filters
        )
        n = df.count()
        if report is not None:
            report.update(
                {
                    "files_total": plan["files_total"],
                    "files_meta_counted": 0,
                    "files_scanned": plan["files_scanned"],
                    "rows_from_metadata": 0,
                    "fallback": "merge-on-read deletes pending",
                }
            )
        return n
    full = [f for f in plan["entries"] if _fully_covered(f, conds)]
    full_paths = {f["path"] for f in full}
    partial = [f for f in plan["entries"] if f["path"] not in full_paths]
    meta_rows = sum(f["stats"]["rows"] for f in full)
    n = meta_rows
    if partial:
        schema = StructType.fromJson(plan["schema"])
        df = spark.read.schema(schema).parquet(
            *[os.path.join(table_path, f["path"]) for f in partial]
        )
        for col, op, val in conds:
            c = F.col(col)
            pred = (
                c.isin(list(val))
                if op == "in"
                else {
                    "==": c == val,
                    "<": c < val,
                    "<=": c <= val,
                    ">": c > val,
                    ">=": c >= val,
                }[op]
            )
            df = df.filter(pred)
        n += df.count()
    if report is not None:
        report.update(
            {
                "files_total": plan["files_total"],
                "files_meta_counted": len(full),
                "files_scanned": len(partial),
                "rows_from_metadata": meta_rows,
            }
        )
    return n
