"""From-scratch Apache Iceberg table reader/writer (format version 1).

The north rule's input is "an Iceberg table of image+caption rows", and no
Iceberg runtime jar or pyiceberg exists in this container — so this module
implements the public Iceberg table spec directly on top of the from-scratch
Avro codec (kernels/avro.py):

  table/metadata/version-hint.text        latest metadata version N
  table/metadata/vN.metadata.json         schema, partition spec, snapshots
  table/metadata/snap-<id>.avro           manifest list (one per snapshot)
  table/metadata/m-<uuid>.avro            manifests (data-file entries)
  table/data/<part>=<v>/...parquet        data files (hive-style identity
                                          partitioning, so Spark re-projects
                                          the identity partition column the
                                          same way Iceberg readers do)

What the reader gives Spark that plain `spark.read.parquet` cannot:

  * snapshot isolation + time travel (`snapshot_id=`): a reader pinned to a
    snapshot never sees concurrent appends — at 100 TB this is the
    difference between a reproducible training run and a moving target;
  * MANIFEST-level pruning: each manifest list row carries per-partition-
    field summaries (lower/upper bound, contains_null), so whole manifests
    — thousands of files — are skipped without opening them;
  * FILE-level pruning: identity partition values and per-file column
    min/max bounds (harvested from the parquet footers at commit time,
    Iceberg single-value serialization, Appendix D: little-endian ints and
    longs, UTF-8 strings) prune files before the Spark scan starts, on
    non-partition columns too — metadata-only planning, no file I/O.

The scan result is a plain parquet DataFrame over the surviving files, so
Catalyst still does row-group pushdown inside each file; Iceberg metadata
removes whole files/manifests before Spark ever lists them.

Checkpoint/resume (operators/checkpoint.py) keys on the same identity
partition values, completing the brief's "checkpoints per-Iceberg-partition"
loop. Appends are atomic: data + manifests land first, the metadata json is
written via tmp+rename, version-hint last. Scope boundaries, stated
honestly: single writer at a time (real Iceberg arbitrates concurrent
commits through a catalog's atomic swap; this filesystem layout has no
catalog, so the last rename wins), appends only (no row deletes / schema
evolution), format v1.
"""

from __future__ import annotations

import json
import os
import struct
import time
import uuid

from ..kernels import avro

__all__ = ["write_iceberg", "read_iceberg", "plan_scan", "table_info"]


# --- Iceberg single-value serialization (spec Appendix D) --------------------

def _ser_bound(v, typ: str) -> bytes:
    if typ == "int":
        return struct.pack("<i", int(v))
    if typ == "long":
        return struct.pack("<q", int(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        return str(v).encode("utf-8")
    raise ValueError(f"unsupported bound type {typ}")


def _deser_bound(b: bytes, typ: str):
    if typ == "int":
        return struct.unpack("<i", b)[0]
    if typ == "long":
        return struct.unpack("<q", b)[0]
    if typ == "double":
        return struct.unpack("<d", b)[0]
    if typ == "string":
        return b.decode("utf-8")
    raise ValueError(f"unsupported bound type {typ}")


# --- avro schemas for the metadata files (v1 manifest / manifest list) -------

def _kv_array(name: str, value_type) -> dict:
    """Iceberg stores maps with non-string keys as arrays of k/v records."""
    return {"type": "array", "items": {
        "type": "record", "name": name,
        "fields": [{"name": "key", "type": "int"},
                   {"name": "value", "type": value_type}]}}


def _partition_schema(spec_fields: list[dict]) -> dict:
    return {"type": "record", "name": "r102",
            "fields": [{"name": f["name"], "type": ["null", f["type"]]}
                       for f in spec_fields]}


def _manifest_schema(spec_fields: list[dict]) -> dict:
    data_file = {
        "type": "record", "name": "r2",
        "fields": [
            {"name": "file_path", "type": "string"},
            {"name": "file_format", "type": "string"},
            {"name": "partition", "type": _partition_schema(spec_fields)},
            {"name": "record_count", "type": "long"},
            {"name": "file_size_in_bytes", "type": "long"},
            {"name": "lower_bounds", "type": ["null", _kv_array("k126", "bytes")]},
            {"name": "upper_bounds", "type": ["null", _kv_array("k127", "bytes")]},
        ]}
    return {"type": "record", "name": "manifest_entry",
            "fields": [
                {"name": "status", "type": "int"},
                {"name": "snapshot_id", "type": ["null", "long"]},
                {"name": "data_file", "type": data_file},
            ]}


_FIELD_SUMMARY = {"type": "array", "items": {
    "type": "record", "name": "r508",
    "fields": [{"name": "contains_null", "type": "boolean"},
               {"name": "lower_bound", "type": ["null", "bytes"]},
               {"name": "upper_bound", "type": ["null", "bytes"]}]}}

_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_data_files_count", "type": "int"},
        {"name": "partitions", "type": ["null", _FIELD_SUMMARY]},
    ]}


# --- commit path ---------------------------------------------------------------

_SPARK_TO_ICEBERG = {"integer": "int", "long": "long", "string": "string",
                     "double": "double", "float": "float", "binary": "binary",
                     "boolean": "boolean"}


def _meta_dir(table: str) -> str:
    return os.path.join(table, "metadata")


def _current_version(table: str) -> int:
    """Latest committed metadata version: the version hint, or — because the
    hint is written AFTER the metadata commit and a racing slower committer
    may momentarily regress it — the max vN.metadata.json actually on disk,
    whichever is newer (HadoopTableOperations has the same glob fallback)."""
    hint = os.path.join(_meta_dir(table), "version-hint.text")
    v = 0
    if os.path.exists(hint):
        with open(hint) as f:
            v = int(f.read().strip())
    try:
        for fn in os.listdir(_meta_dir(table)):
            if fn.startswith("v") and fn.endswith(".metadata.json"):
                try:
                    v = max(v, int(fn[1:-len(".metadata.json")]))
                except ValueError:
                    pass
    except FileNotFoundError:
        pass
    return v


def _load_metadata(table: str) -> dict:
    v = _current_version(table)
    if v == 0:
        raise FileNotFoundError(f"{table}: no Iceberg metadata (version-hint.text)")
    with open(os.path.join(_meta_dir(table), f"v{v}.metadata.json")) as f:
        return json.load(f)


def _parquet_file_stats(path: str, stats_cols: dict[str, str]):
    """record_count + per-column min/max from the parquet FOOTER (pyarrow) —
    the same footer Iceberg's commit path harvests; no data pages read."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(path).metadata
    nrows = md.num_rows
    lowers, uppers = {}, {}
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    for col, typ in stats_cols.items():
        if col not in names:
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(names[col]).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            lowers[col] = _ser_bound(lo, typ)
            uppers[col] = _ser_bound(hi, typ)
    return nrows, lowers, uppers


def write_iceberg(spark, df, table: str, partition_col: str | None = None,
                  stats_cols: tuple[str, ...] = ()) -> int:
    """Append `df` to the Iceberg table at `table` (creating it on first
    call) and return the new snapshot id. Identity partitioning on
    `partition_col`; `stats_cols` get per-file min/max bounds in the
    manifest (plus the partition column automatically)."""
    os.makedirs(_meta_dir(table), exist_ok=True)
    version = _current_version(table)
    meta = _load_metadata(table) if version else None

    # ---- schema + spec (field ids assigned on create, stable afterwards) ----
    spark_fields = [(f.name, _SPARK_TO_ICEBERG.get(f.dataType.typeName(),
                                                   f.dataType.typeName()))
                    for f in df.schema.fields]
    if meta is None:
        fields = [{"id": i + 1, "name": n, "required": False, "type": t}
                  for i, (n, t) in enumerate(spark_fields)]
        schema = {"schema-id": 0, "type": "struct", "fields": fields}
        spec_fields = []
        if partition_col:
            src = next(f for f in fields if f["name"] == partition_col)
            spec_fields = [{"name": partition_col, "transform": "identity",
                            "source-id": src["id"], "field-id": 1000}]
        meta = {
            "format-version": 1,
            "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, table)),
            "location": table,
            "last-updated-ms": int(time.time() * 1000),
            "last-column-id": len(fields),
            "schema": schema, "schemas": [schema], "current-schema-id": 0,
            "partition-spec": spec_fields,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "default-spec-id": 0,
            "properties": {}, "snapshots": [], "current-snapshot-id": -1,
        }
    field_types = {f["name"]: f["type"] for f in meta["schema"]["fields"]}
    got = {n: t for n, t in spark_fields}
    if got != field_types:
        raise ValueError(
            f"append schema mismatch: table has {field_types}, got {got} "
            "(schema evolution is out of scope for this writer)")
    spec_fields = [{"name": s["name"], "type": field_types[s["name"]]}
                   for s in meta["partition-specs"][0]["fields"]]

    # ---- data files: hive-layout write into a staging dir, then move each
    # file into the table's single data/ tree under a COMMIT-TOKEN-unique
    # name (one consistent <part>=<v> hierarchy keeps Spark partition
    # discovery valid across snapshots; the token keeps two concurrent
    # appenders' files from ever colliding), stats from the footers ----
    token = uuid.uuid4().hex[:12]
    stage_dir = os.path.join(table, f"_stage-{token}")
    w = df.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(stage_dir)

    want_stats = {c: field_types[c] for c in stats_cols if c in field_types}
    entries = []
    seq = 0
    for root, _dirs, files in os.walk(stage_dir):
        for fn in sorted(files):
            if not fn.endswith(".parquet"):
                continue
            part = {}
            rel_dirs = []
            for seg in os.path.relpath(root, stage_dir).split(os.sep):
                if "=" in seg:
                    rel_dirs.append(seg)
                    k, v = seg.split("=", 1)
                    t = field_types.get(k, "string")
                    part[k] = int(v) if t in ("int", "long") else v
            dest_dir = os.path.join(table, "data", *rel_dirs)
            os.makedirs(dest_dir, exist_ok=True)
            path = os.path.join(dest_dir, f"snap-{token}-{seq:05d}.parquet")
            seq += 1
            os.replace(os.path.join(root, fn), path)
            nrows, lowers, uppers = _parquet_file_stats(path, want_stats)
            entries.append({
                "status": 1, "snapshot_id": 0,  # filled per commit attempt
                "data_file": {
                    "file_path": path, "file_format": "PARQUET",
                    "partition": part,
                    "record_count": nrows,
                    "file_size_in_bytes": os.path.getsize(path),
                    "lower_bounds": [{"key": _fid(meta, c), "value": b}
                                     for c, b in lowers.items()],
                    "upper_bounds": [{"key": _fid(meta, c), "value": b}
                                     for c, b in uppers.items()],
                }})

    import shutil
    shutil.rmtree(stage_dir, ignore_errors=True)

    # field summaries for manifest-level pruning (snap-id independent)
    summaries = None
    if spec_fields:
        summaries = []
        for sf in spec_fields:
            vals = [e["data_file"]["partition"].get(sf["name"])
                    for e in entries]
            present = [v for v in vals if v is not None]
            summaries.append({
                "contains_null": any(v is None for v in vals),
                "lower_bound": _ser_bound(min(present), sf["type"]) if present else None,
                "upper_bound": _ser_bound(max(present), sf["type"]) if present else None,
            })

    # ---- commit: optimistic read-rebase-publish loop. Two appenders racing
    # the same base version both build v{N+1}; the PUBLISH is an atomic
    # os.link (create-exclusive on every POSIX fs) so exactly one wins; the
    # loser re-reads the winner's metadata, rebases its manifest onto the
    # new current snapshot, and retries at v{N+2} — a snapshot can be
    # retried or conflict loudly, never silently lost. (A real catalog does
    # this swap server-side; HadoopTableOperations does exactly this
    # rename-if-absent dance.) ----
    for _attempt in range(10):
        version = _current_version(table)
        if version:
            # load THE version just read (not _load_metadata, which re-derives
            # the version and could pair a newer json with a stale number)
            with open(os.path.join(_meta_dir(table),
                                   f"v{version}.metadata.json")) as f:
                cur = json.load(f)
            cur_types = {f["name"]: f["type"] for f in cur["schema"]["fields"]}
            if cur_types != got:
                raise ValueError(
                    f"append schema mismatch after concurrent commit: table "
                    f"has {cur_types}, got {got}")
        else:
            cur = meta  # first commit: the freshly-built create metadata
        snap_id = len(cur["snapshots"]) + 1
        for e in entries:
            e["snapshot_id"] = snap_id
        mpath = os.path.join(_meta_dir(table), f"m-{snap_id}-{token}.avro")
        avro.write_container(
            mpath, _manifest_schema(spec_fields), entries,
            extra_meta={"schema": json.dumps(cur["schema"]).encode(),
                        "partition-spec": json.dumps(
                            cur["partition-specs"][0]["fields"]).encode(),
                        "partition-spec-id": b"0",
                        "format-version": b"1", "content": b"data"})

        # manifest list: current snapshot's manifests + the new one
        manifests = []
        if cur["current-snapshot-id"] != -1:
            prev = next(s for s in cur["snapshots"]
                        if s["snapshot-id"] == cur["current-snapshot-id"])
            _, manifests = avro.read_container(prev["manifest-list"])
        manifests = list(manifests) + [{
            "manifest_path": mpath, "manifest_length": os.path.getsize(mpath),
            "partition_spec_id": 0, "added_snapshot_id": snap_id,
            "added_data_files_count": len(entries), "partitions": summaries,
        }]
        lpath = os.path.join(_meta_dir(table), f"snap-{snap_id}-{token}.avro")
        avro.write_container(lpath, _MANIFEST_LIST_SCHEMA, manifests)

        new_meta = dict(cur)
        new_meta["snapshots"] = cur["snapshots"] + [{
            "snapshot-id": snap_id, "timestamp-ms": int(time.time() * 1000),
            "manifest-list": lpath, "summary": {"operation": "append"},
            "schema-id": 0,
        }]
        new_meta["current-snapshot-id"] = snap_id
        new_meta["last-updated-ms"] = int(time.time() * 1000)
        mjson = os.path.join(_meta_dir(table), f"v{version + 1}.metadata.json")
        tmp = mjson + f".{token}.tmp"
        with open(tmp, "w") as f:
            json.dump(new_meta, f, indent=1)
        try:
            os.link(tmp, mjson)  # atomic create-exclusive publish
        except FileExistsError:
            os.unlink(tmp)       # lost the race: rebase and retry
            for p in (mpath, lpath):
                try:
                    os.unlink(p)
                except FileNotFoundError:
                    pass
            continue
        os.unlink(tmp)
        # hint last, monotonic (a slower racer must not regress it; readers
        # also glob for the max committed version — _current_version)
        hint = os.path.join(_meta_dir(table), "version-hint.text")
        if _hint_value(hint) < version + 1:
            with open(hint + f".{token}.tmp", "w") as f:
                f.write(str(version + 1))
            os.replace(hint + f".{token}.tmp", hint)
        return snap_id
    raise RuntimeError(
        f"{table}: commit conflict persisted through 10 rebase attempts — "
        "another writer is appending faster than this one can rebase")


def _hint_value(hint: str) -> int:
    try:
        with open(hint) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return 0


def _fid(meta: dict, col: str) -> int:
    return next(f["id"] for f in meta["schema"]["fields"] if f["name"] == col)


# --- scan path -------------------------------------------------------------------

class ScanPlan:
    """Result of metadata-only planning: the file list plus pruning counters
    (so tests and operators can assert pruning really happened)."""

    def __init__(self):
        self.files: list[dict] = []
        self.file_snapshots: list[int | None] = []  # snapshot that added each
        self.manifests_total = 0
        self.manifests_skipped = 0
        self.files_total = 0
        self.files_skipped = 0
        self.snapshot_id = None

    @property
    def paths(self) -> list[str]:
        return [f["file_path"] for f in self.files]


def plan_scan(table: str, snapshot_id: int | None = None,
              partition_filter: dict | None = None,
              column_ranges: dict | None = None) -> ScanPlan:
    """Metadata-only scan planning.

    partition_filter: {col: value} or {col: (lo, hi)} on identity partition
    columns — applied at BOTH manifest level (field summaries) and file
    level (partition values). column_ranges: {col: (lo, hi)} on any column
    with bounds in the manifest — overlap test against per-file min/max.
    Bounds use None for +/- infinity."""
    meta = _load_metadata(table)
    plan = ScanPlan()
    snap_id = snapshot_id if snapshot_id is not None else meta["current-snapshot-id"]
    if snap_id == -1:
        return plan
    plan.snapshot_id = snap_id
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == snap_id)
    field_types = {f["name"]: f["type"] for f in meta["schema"]["fields"]}
    field_ids = {f["name"]: f["id"] for f in meta["schema"]["fields"]}
    spec_names = [s["name"] for s in meta["partition-specs"][0]["fields"]]

    def as_range(v):
        return v if isinstance(v, tuple) else (v, v)

    _, manifests = avro.read_container(snap["manifest-list"])
    plan.manifests_total = len(manifests)
    for m in manifests:
        # manifest-level pruning via partition field summaries
        if partition_filter and m.get("partitions"):
            skip = False
            for i, name in enumerate(spec_names):
                if name not in partition_filter or i >= len(m["partitions"]):
                    continue
                lo, hi = as_range(partition_filter[name])
                s = m["partitions"][i]
                t = field_types[name]
                mlo = _deser_bound(s["lower_bound"], t) if s["lower_bound"] else None
                mhi = _deser_bound(s["upper_bound"], t) if s["upper_bound"] else None
                if (mlo is not None and hi is not None and mlo > hi) or \
                   (mhi is not None and lo is not None and mhi < lo):
                    skip = True
                    break
            if skip:
                plan.manifests_skipped += 1
                continue
        _, entries = avro.read_container(m["manifest_path"])
        for e in entries:
            if e["status"] == 2:        # deleted
                continue
            plan.files_total += 1
            df_ = e["data_file"]
            keep = True
            if partition_filter:
                for name, pv in df_["partition"].items():
                    if name in partition_filter and pv is not None:
                        lo, hi = as_range(partition_filter[name])
                        if (lo is not None and pv < lo) or (hi is not None and pv > hi):
                            keep = False
                            break
            if keep and column_ranges:
                lowers = {kv["key"]: kv["value"] for kv in (df_.get("lower_bounds") or [])}
                uppers = {kv["key"]: kv["value"] for kv in (df_.get("upper_bounds") or [])}
                for col, (lo, hi) in column_ranges.items():
                    fid = field_ids.get(col)
                    if fid is None or fid not in lowers:
                        continue    # no stats -> cannot prune, keep
                    t = field_types[col]
                    flo = _deser_bound(lowers[fid], t)
                    fhi = _deser_bound(uppers[fid], t)
                    if (hi is not None and flo > hi) or (lo is not None and fhi < lo):
                        keep = False
                        break
            if keep:
                plan.files.append(df_)
                plan.file_snapshots.append(e.get("snapshot_id"))
            else:
                plan.files_skipped += 1
    return plan


def read_iceberg(spark, table: str, snapshot_id: int | None = None,
                 partition_filter: dict | None = None,
                 column_ranges: dict | None = None):
    """Iceberg table -> Spark DataFrame over exactly the surviving data
    files. Identity partition columns are re-projected by Spark's hive
    partition discovery (basePath anchored at the table's data root), the
    same projection real Iceberg readers perform from metadata. Returns an
    EMPTY typed DataFrame when everything was pruned."""
    plan = plan_scan(table, snapshot_id, partition_filter, column_ranges)
    if not plan.files:
        meta = _load_metadata(table)
        from pyspark.sql import types as T
        inv = {"int": T.IntegerType(), "long": T.LongType(),
               "string": T.StringType(), "double": T.DoubleType(),
               "float": T.FloatType(), "binary": T.BinaryType(),
               "boolean": T.BooleanType()}
        schema = T.StructType([
            T.StructField(f["name"], inv.get(f["type"], T.StringType()))
            for f in meta["schema"]["fields"]])
        return spark.createDataFrame([], schema)
    out = (spark.read.option("basePath", os.path.join(table, "data"))
           .parquet(*plan.paths))
    # residual filters: pruning is file-granular, so kept files can still
    # hold rows outside the requested ranges — apply the same predicates
    # row-wise (Catalyst pushes them into the parquet row-group scan)
    from pyspark.sql import functions as F
    for flt in (partition_filter or {}), (column_ranges or {}):
        for col, v in flt.items():
            lo, hi = v if isinstance(v, tuple) else (v, v)
            if lo is not None:
                out = out.filter(F.col(col) >= lo)
            if hi is not None:
                out = out.filter(F.col(col) <= hi)
    return out


def read_incremental(spark, table: str, from_snapshot: int,
                     to_snapshot: int | None = None):
    """Rows APPENDED after `from_snapshot` up to `to_snapshot` (default:
    current) — the incremental-consumption primitive: each manifest entry
    records the snapshot that added its file, so the delta is a metadata-only
    file-list diff, never a data diff. Feeding these deltas to the
    incremental tileset maintainer (streaming/tiles.py) keeps a tile table
    current without rescanning the base — the 100 TB refresh path."""
    meta = _load_metadata(table)
    snap_id = to_snapshot if to_snapshot is not None else meta["current-snapshot-id"]
    plan = plan_scan(table, snapshot_id=snap_id)
    files = [f for f, s in zip(plan.files, plan.file_snapshots)
             if s is not None and from_snapshot < s <= snap_id]
    if not files:
        return read_iceberg(spark, table, snapshot_id=snap_id).limit(0)
    return (spark.read.option("basePath", os.path.join(table, "data"))
            .parquet(*[f["file_path"] for f in files]))


def table_info(table: str) -> dict:
    """Snapshot lineage + current stats — the metadata half of the
    checkpoint story (row counts are exact from manifests, no scan)."""
    meta = _load_metadata(table)
    out = {"table-uuid": meta["table-uuid"],
           "current-snapshot-id": meta["current-snapshot-id"],
           "snapshots": []}
    for s in meta["snapshots"]:
        _, manifests = avro.read_container(s["manifest-list"])
        rows = files = 0
        for m in manifests:
            _, entries = avro.read_container(m["manifest_path"])
            live = [e for e in entries if e["status"] != 2]
            files += len(live)
            rows += sum(e["data_file"]["record_count"] for e in live)
        out["snapshots"].append({"snapshot-id": s["snapshot-id"],
                                 "files": files, "rows": rows})
    return out
