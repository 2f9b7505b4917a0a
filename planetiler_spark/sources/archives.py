"""Tile archive sinks — MBTiles, PMTiles, files tree, CSV/JSON streams.

Reference parity (SURVEY §2.2):
  - MBTiles (mbtiles/Mbtiles.java:282-345): sqlite `tiles(z, col, row, data)`
    with TMS row flip, plus the fork's NORMALIZED layout `tiles_shallow ⋈
    tiles_data` deduping identical tile contents by id — here keyed by the
    pipeline's content_hash (the order-free replacement for consecutive-tile
    memoization, TileArchiveWriter.java:277-300).
  - PMTiles v3 (pmtiles/WriteablePmtiles.java:40, Pmtiles.java:82-119 and the
    public spec): Hilbert-clustered single file, varint directories, run-length
    + offset dedup of identical tiles.
  - Files archive (files/WriteableFilesArchive.java:47): {z}/{x}/{y}.pbf tree.
  - CSV / JSON stream archives (stream/WriteableCsvArchive.java:68,
    WriteableJsonStreamArchive.java:32): df.write, fully parallel.

The single-file writers drain `toLocalIterator()` on the driver — mirroring
the reference's dedicated ordered writer thread (TileArchiveWriter.java:128);
the upstream DataFrame arrives already tile-ordered, so the driver never holds
more than a partition. The parallel formats (files/csv/json) write from
executors.
"""

from __future__ import annotations

import gzip
import json
import os
import sqlite3
import struct

import numpy as np

from ..kernels import tile_math as tm


# ---------------------------------------------------------------------------
# MBTiles
# ---------------------------------------------------------------------------

def write_mbtiles(tiles_df, path: str, metadata: dict | None = None,
                  normalized: bool = True) -> dict:
    """tiles_df: (tile_id, zoom, x, y, tile_bytes, content_hash) -> sqlite.
    normalized=True dedups identical tile contents (ocean tiles stored once)."""
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("PRAGMA journal_mode=OFF")
    cur.execute("PRAGMA synchronous=OFF")
    cur.execute("CREATE TABLE metadata (name text, value text)")
    n = 0
    uniq = 0
    if normalized:
        # fork's normalized schema (Mbtiles.java createTablesWithoutIndexes)
        cur.execute("""CREATE TABLE tiles_data
                       (tile_data_id integer primary key, tile_data blob)""")
        cur.execute("""CREATE TABLE tiles_shallow
                       (zoom_level integer, tile_column integer, tile_row integer,
                        tile_data_id integer,
                        primary key(zoom_level, tile_column, tile_row))
                       WITHOUT ROWID""")
        cur.execute("""CREATE VIEW tiles AS
                       SELECT zoom_level, tile_column, tile_row, tile_data
                       FROM tiles_shallow JOIN tiles_data USING (tile_data_id)""")
        hash_to_id: dict[str, int] = {}
        for r in tiles_df.toLocalIterator():
            tid = hash_to_id.get(r.content_hash)
            if tid is None:
                tid = len(hash_to_id) + 1
                hash_to_id[r.content_hash] = tid
                cur.execute("INSERT INTO tiles_data VALUES (?, ?)",
                            (tid, bytes(r.tile_bytes)))
                uniq += 1
            row = (1 << r.zoom) - 1 - r.y  # TMS flip (Mbtiles.java tileRow)
            cur.execute("INSERT INTO tiles_shallow VALUES (?, ?, ?, ?)",
                        (r.zoom, r.x, row, tid))
            n += 1
    else:
        cur.execute("""CREATE TABLE tiles
                       (zoom_level integer, tile_column integer, tile_row integer,
                        tile_data blob)""")
        for r in tiles_df.toLocalIterator():
            row = (1 << r.zoom) - 1 - r.y
            cur.execute("INSERT INTO tiles VALUES (?, ?, ?, ?)",
                        (r.zoom, r.x, row, bytes(r.tile_bytes)))
            n += 1
        cur.execute("CREATE UNIQUE INDEX tile_index ON tiles "
                    "(zoom_level, tile_column, tile_row)")
        uniq = n
    meta = {"format": "pbf", "type": "overlay", "name": "planetiler_spark",
            **(metadata or {})}
    cur.executemany("INSERT INTO metadata VALUES (?, ?)",
                    [(k, str(v)) for k, v in meta.items()])
    con.commit()
    con.close()
    return {"tiles": n, "unique_blobs": uniq}


def read_mbtiles(path: str) -> dict:
    """{(z, x, y): bytes} with y back in XYZ orientation (for verification —
    the analog of mbtiles/Verify.java + CompareArchives)."""
    con = sqlite3.connect(path)
    out = {}
    for z, col, row, data in con.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"):
        out[(z, col, (1 << z) - 1 - row)] = data
    con.close()
    return out


# ---------------------------------------------------------------------------
# PMTiles v3 (public spec; reference pmtiles/Pmtiles.java)
# ---------------------------------------------------------------------------

_PM_MAGIC = b"PMTiles"
_PM_HEADER_LEN = 127
_MAX_DIR_ENTRIES = 16384


def _pm_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pm_varints_flat(vals: np.ndarray) -> bytes:
    """Vectorized LEB128 of an int64 array, concatenated (mvt.varint_matrix
    + one boolean-mask compaction — no per-value Python)."""
    from ..kernels.mvt import varint_matrix

    B, L = varint_matrix(np.asarray(vals, dtype=np.int64))
    if B.shape[1] == 1:
        return B.tobytes()
    mask = np.arange(B.shape[1])[None, :] < L[:, None]
    return B[mask].tobytes()


def _pm_dir(entries) -> bytes:
    """Serialize directory: delta tile ids, runlengths, lengths, offsets
    (Pmtiles.java directory layout / spec §directories). entries: (N,4)
    int64 array (or any sequence of [tid, off, len, run]) — the four varint
    streams are built with whole-array numpy passes."""
    arr = np.asarray(entries, dtype=np.int64).reshape(-1, 4)
    n = len(arr)
    buf = bytearray(_pm_varint(n))
    if n:
        tid, off, ln = arr[:, 0], arr[:, 1], arr[:, 2]
        buf += _pm_varints_flat(np.diff(tid, prepend=np.int64(0)))
        buf += _pm_varints_flat(arr[:, 3])
        buf += _pm_varints_flat(ln)
        prev_end = np.empty(n, dtype=np.int64)
        prev_end[0] = -1  # first entry never takes the contiguous shortcut
        np.add(off[:-1], ln[:-1], out=prev_end[1:])
        buf += _pm_varints_flat(np.where(off == prev_end, 0, off + 1))
    return gzip.compress(bytes(buf), mtime=0)


def _pm_build_dirs(entries, max_dir_entries: int = _MAX_DIR_ENTRIES):
    """entries ((N,4) int64) -> (root_bytes, leaves_bytes). If the entry list
    fits in one directory it all goes in the root; otherwise entries are
    chunked into leaf directories and the root holds one pointer entry per
    leaf (run_length=0, offset into the leaf section — spec §3 semantics,
    pmtiles/WriteablePmtiles.java:40 buildRootLeaves)."""
    entries = np.asarray(entries, dtype=np.int64).reshape(-1, 4)
    if len(entries) <= max_dir_entries:
        return _pm_dir(entries), b"", 0
    leaf_size = max_dir_entries
    while (len(entries) + leaf_size - 1) // leaf_size > max_dir_entries:
        leaf_size *= 2
    root_entries = []
    leaves = bytearray()
    for i in range(0, len(entries), leaf_size):
        chunk = entries[i:i + leaf_size]
        ser = _pm_dir(chunk)
        root_entries.append((int(chunk[0][0]), len(leaves), len(ser), 0))
        leaves += ser
    return _pm_dir(root_entries), bytes(leaves), len(root_entries)


def write_pmtiles(tiles_df, path: str, metadata: dict | None = None,
                  max_dir_entries: int = _MAX_DIR_ENTRIES,
                  dedup_cap: int = 1 << 22) -> dict:
    """Hilbert-clustered single-file archive with run-length + content dedup
    and root+leaf directories. tiles_df must carry (zoom, x, y, tile_bytes,
    content_hash).

    STREAMING: tile bytes never accumulate on the driver. The cluster sorts
    globally by hilbert id (repartitionByRange + sortWithinPartitions — the
    shuffle IS the sort), the driver drains toLocalIterator() one partition at
    a time (the same ordered-writer-thread shape as write_mbtiles /
    TileArchiveWriter.java:128) and appends blobs to a temp data file; only
    the directory entries (4 ints per run) and a bounded content-dedup map
    stay in memory. Directories follow the public PMTiles v3 spec
    (pmtiles/Pmtiles.java:82-119): entries beyond max_dir_entries spill into
    leaf directories with root pointer entries."""
    import os as _os
    from pyspark.sql import functions as F
    from ..functions.geo import hilbert_of_tile

    if "tile_id" in tiles_df.columns:
        df = (tiles_df.select("tile_id", "zoom", "tile_bytes", "content_hash")
              .withColumn("hilbert_id", hilbert_of_tile("tile_id")))
    else:
        @F.pandas_udf("long")
        def _h(zoom, x, y):
            import pandas as pd
            return pd.Series(tm.hilbert_encode(
                x.to_numpy(np.int64), y.to_numpy(np.int64), zoom.to_numpy(np.int64)))
        df = (tiles_df.select("zoom", "x", "y", "tile_bytes", "content_hash")
              .withColumn("hilbert_id", _h("zoom", "x", "y")))
    # materialize BEFORE the range exchange: repartitionByRange samples its
    # child to pick boundaries, which re-executes the entire upstream plan
    # (a full tileset pipeline) in a separate job. A single-file sink is an
    # inherent materialization point anyway (the ordered-writer drains it
    # once), so one persist turns the sampling pass into a cache read.
    df = df.persist()
    ordered = (df.repartitionByRange("hilbert_id")
               .sortWithinPartitions("hilbert_id"))

    tmp_data = path + ".data.tmp"
    # entries live in a flat array('q') — 32 bytes per [tid, off, len, run]
    # run instead of ~250 for a Python list-of-lists, so a planet-scale
    # O(10^7-10^8)-entry directory stays a few GB -> a few hundred MB of
    # driver memory (the reference holds the same compact longs,
    # WriteablePmtiles; bounded-memory test in test_archives)
    import array as _array
    entries = _array.array("q")                # flat [tid, off, len, run] * N
    offsets: dict[str, tuple[int, int]] = {}   # content dedup (bounded)
    n_tiles = 0
    data_len = 0
    minz = maxz = None
    try:
      with open(tmp_data, "wb") as dataf:
        for r in ordered.toLocalIterator():
            tid = int(r.hilbert_id)
            blob = bytes(r.tile_bytes)
            minz = r.zoom if minz is None else min(minz, r.zoom)
            maxz = r.zoom if maxz is None else max(maxz, r.zoom)
            got = offsets.get(r.content_hash)
            if got is None:
                got = (data_len, len(blob))
                if len(offsets) < dedup_cap:  # bounded driver memory; dedup
                    offsets[r.content_hash] = got  # beyond cap just stores dup
                dataf.write(blob)
                data_len += len(blob)
            off, ln = got
            n_tiles += 1
            if entries and entries[-4] + entries[-1] == tid and \
                    entries[-3] == off and entries[-2] == ln:
                entries[-1] += 1  # run-length of identical consecutive tiles
            else:
                entries.extend((tid, off, ln, 1))
    finally:
        df.unpersist()  # even on a failed drain: don't pin the tileset cache

    n_contents = len(offsets)
    entries_np = np.frombuffer(entries, dtype=np.int64).reshape(-1, 4) \
        if len(entries) else np.empty((0, 4), dtype=np.int64)
    root, leaves, n_leaves = _pm_build_dirs(entries_np, max_dir_entries)
    meta_bytes = gzip.compress(json.dumps(metadata or {}).encode(), mtime=0)

    root_off = _PM_HEADER_LEN
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta_bytes)
    data_off = leaf_off + len(leaves)
    hdr = bytearray(_PM_HEADER_LEN)
    hdr[0:7] = _PM_MAGIC
    hdr[7] = 3  # spec version
    struct.pack_into("<QQQQQQQQ", hdr, 8,
                     root_off, len(root), meta_off, len(meta_bytes),
                     leaf_off, len(leaves), data_off, data_len)
    # spec bytes 72/80/88: addressed tiles / tile entries / tile contents
    # (Pmtiles.java:122-124)
    struct.pack_into("<QQQ", hdr, 72, n_tiles, len(entries_np), n_contents)
    hdr[96] = 1   # clustered
    hdr[97] = 2   # internal compression: gzip
    hdr[98] = 2   # tile compression: gzip
    hdr[99] = 1   # tile type: mvt
    hdr[100] = minz or 0
    hdr[101] = maxz or 0
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(root)
        f.write(meta_bytes)
        f.write(leaves)
        with open(tmp_data, "rb") as dataf:  # stream-append, no full read
            while True:
                chunk = dataf.read(1 << 24)
                if not chunk:
                    break
                f.write(chunk)
    _os.remove(tmp_data)
    return {"tiles": n_tiles, "entries": len(entries_np),
            "unique_blobs": n_contents, "n_leaves": n_leaves,
            "bytes": data_off + data_len}


def _pm_parse_dir(comp: bytes):
    """Decompress + parse one serialized directory -> (tids, runs, lens, offs).
    run == 0 marks a leaf-pointer entry (offset into the leaf section)."""
    raw = gzip.decompress(comp)
    pos = 0

    def rv():
        nonlocal pos
        out = shift = 0
        while True:
            b = raw[pos]
            pos += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    n = rv()
    tids = []
    last = 0
    for _ in range(n):
        last += rv()
        tids.append(last)
    runs = [rv() for _ in range(n)]
    lens = [rv() for _ in range(n)]
    offs = []
    for i in range(n):
        v = rv()
        offs.append(offs[-1] + lens[i - 1] if v == 0 else v - 1)
    return tids, runs, lens, offs


def read_pmtiles(path: str) -> dict:
    """{(z, x, y): bytes} — verification reader; follows leaf directories."""
    with open(path, "rb") as f:
        buf = f.read()
    assert buf[:7] == _PM_MAGIC and buf[7] == 3
    (root_off, root_len, _mo, _ml, leaf_off, _ll, data_off, _dl) = \
        struct.unpack_from("<QQQQQQQQ", buf, 8)
    out = {}

    def emit(tids, runs, lens, offs):
        for tid, run, ln, off in zip(tids, runs, lens, offs):
            if run == 0:  # leaf pointer: parse the referenced leaf directory
                emit(*_pm_parse_dir(buf[leaf_off + off:leaf_off + off + ln]))
                continue
            for k in range(run):
                x, y, z = tm.hilbert_decode(np.int64(tid + k))
                out[(int(z), int(x), int(y))] = \
                    buf[data_off + off:data_off + off + ln]

    emit(*_pm_parse_dir(buf[root_off:root_off + root_len]))
    return out


# ---------------------------------------------------------------------------
# files archive + stream archives
# ---------------------------------------------------------------------------

def write_files_archive(tiles_df, base: str, metadata: dict | None = None) -> int:
    """{base}/{z}/{x}/{y}.pbf tree (TileSchemeEncoding z/x/y default),
    written in parallel from executors via foreachPartition."""
    os.makedirs(base, exist_ok=True)

    def write_part(it):
        for r in it:
            d = os.path.join(base, str(r.zoom), str(r.x))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{r.y}.pbf"), "wb") as f:
                f.write(bytes(r.tile_bytes))

    tiles_df.select("zoom", "x", "y", "tile_bytes").foreachPartition(write_part)
    with open(os.path.join(base, "metadata.json"), "w") as f:
        json.dump({"format": "pbf", **(metadata or {})}, f)
    n = 0
    for z in os.listdir(base):
        if z.isdigit():
            for x in os.listdir(os.path.join(base, z)):
                n += len(os.listdir(os.path.join(base, z, x)))
    return n


def read_files_archive(base: str) -> dict:
    out = {}
    for z in os.listdir(base):
        if not z.isdigit():
            continue
        for x in os.listdir(os.path.join(base, z)):
            for fn in os.listdir(os.path.join(base, z, x)):
                with open(os.path.join(base, z, x, fn), "rb") as f:
                    out[(int(z), int(x), int(fn.split(".")[0]))] = f.read()
    return out


def write_proto_archive(tiles_df, path: str, metadata: dict | None = None) -> int:
    """Length-delimited protobuf stream archive
    (stream/WriteableProtoStreamArchive.java:39, schema
    stream_archive_proto.proto): an empty initialization Entry, one
    Entry{tile: TileEntry{x,y,z,encoded_data}} per tile, then
    Entry{finish: FinishEntry{metadata}}. Canonical proto3 encoding
    (zero-valued scalar fields omitted), hand-rolled with the same varint
    helpers as the MVT codec. The driver drains toLocalIterator() in tile
    order — the single-stream ordered-writer shape of write_mbtiles."""
    from ..kernels.mvt import _varint, _len_delim, _tag

    n = 0
    with open(path, "wb") as f:
        f.write(_varint(0))  # initialization: empty Entry (initialize():57)
        for r in tiles_df.select("zoom", "x", "y", "tile_bytes").toLocalIterator():
            te = b""
            if r.x:
                te += _tag(1, 0) + _varint(int(r.x))
            if r.y:
                te += _tag(2, 0) + _varint(int(r.y))
            if r.zoom:
                te += _tag(3, 0) + _varint(int(r.zoom))
            te += _len_delim(4, bytes(r.tile_bytes))
            ent = _len_delim(1, te)
            f.write(_varint(len(ent)) + ent)
            n += 1
        md = b""
        for field, key in ((1, "name"), (2, "description"), (3, "attribution"),
                           (4, "version"), (5, "type"), (6, "format")):
            if (metadata or {}).get(key):
                md += _len_delim(field, str(metadata[key]).encode())
        meta = metadata or {}
        if meta.get("min_zoom"):
            md += _tag(9, 0) + _varint(int(meta["min_zoom"]))
        if meta.get("max_zoom"):
            md += _tag(10, 0) + _varint(int(meta["max_zoom"]))
        md += _tag(13, 0) + _varint(1)  # TILE_COMPRESSION_GZIP
        ent = _len_delim(3, _len_delim(1, md))
        f.write(_varint(len(ent)) + ent)
    return n


def read_proto_archive(path: str):
    """Verification reader: ({(z, x, y): bytes}, metadata dict)."""
    from ..kernels.mvt import _read_varint

    with open(path, "rb") as f:
        buf = memoryview(f.read())
    tiles = {}
    meta = {}
    off = 0

    def parse_fields(mv):
        pos = 0
        out = []
        while pos < len(mv):
            key, pos = _read_varint(mv, pos)
            field, wire = key >> 3, key & 7
            if wire == 0:
                v, pos = _read_varint(mv, pos)
                out.append((field, v))
            elif wire == 2:
                ln, pos = _read_varint(mv, pos)
                out.append((field, bytes(mv[pos:pos + ln])))
                pos += ln
            else:
                raise ValueError(f"unexpected wire type {wire}")
        return out

    meta_names = {1: "name", 2: "description", 3: "attribution", 4: "version",
                  5: "type", 6: "format", 9: "min_zoom", 10: "max_zoom",
                  13: "tile_compression"}
    while off < len(buf):
        ln, off = _read_varint(buf, off)
        entry = buf[off:off + ln]
        off += ln
        for field, val in parse_fields(entry):
            if field == 1:  # tile
                x = y = z = 0
                data = b""
                for tf, tv in parse_fields(memoryview(val)):
                    if tf == 1:
                        x = tv
                    elif tf == 2:
                        y = tv
                    elif tf == 3:
                        z = tv
                    elif tf == 4:
                        data = tv
                tiles[(z, x, y)] = data
            elif field == 3:  # finish -> metadata
                for ff, fv in parse_fields(memoryview(val)):
                    if ff == 1:
                        for mf, mval in parse_fields(memoryview(fv)):
                            name = meta_names.get(mf, mf)
                            meta[name] = (mval.decode() if isinstance(mval, bytes)
                                          else mval)
    return tiles, meta


def write_csv_archive(tiles_df, path: str, base64_data: bool = True):
    """Streaming CSV archive (stream/WriteableCsvArchive.java:68): one line per
    tile, data base64'd — parallel df.write."""
    from pyspark.sql import functions as F
    enc = (F.regexp_replace(F.base64("tile_bytes"), "[\\r\\n]", "")
           if base64_data else F.hex("tile_bytes"))
    df = tiles_df.select("x", "y", "zoom", enc.alias("encoded_data"))
    df.write.mode("overwrite").csv(path)


def write_json_archive(tiles_df, path: str):
    """Streaming JSON archive (stream/WriteableJsonStreamArchive.java:32)."""
    from pyspark.sql import functions as F
    df = tiles_df.select(
        F.col("x"), F.col("y"), F.col("zoom").alias("z"),
        F.regexp_replace(F.base64("tile_bytes"), "[\\r\\n]", "").alias("encoded_data"))
    df.write.mode("overwrite").json(path)
