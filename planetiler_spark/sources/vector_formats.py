"""Shapefile / GeoPackage / NaturalEarth readers — the remaining SURVEY §2.1
source family, from scratch (no GDAL/GeoTools) and Spark-parallel.

Reference parity:
  - ShapefileReader.java:44 — ESRI shapefile (.shp geometry + .dbf dBase
    attributes + .cpg encoding). Here the driver reads the tiny .shx record
    index, splits record ranges, and executors seek straight into .shp/.dbf
    inside mapInPandas (the format's fixed-width records were designed for
    exactly this random access).
  - GeoPackageReader.java:42 — sqlite with `gpkg_contents`/
    `gpkg_geometry_columns` metadata and GP-header-prefixed WKB blobs.
    Executors open the db read-only and scan disjoint rowid ranges (sqlite
    supports unlimited concurrent readers).
  - NaturalEarthReader.java:38 — plain sqlite tables with a WKB `geometry`
    column; same rowid-range scan, no GP header.

All normalize to the engine feature shape (id, source, layer,
tags map<string,string>, geom_wkb, minx..maxy) in EPSG:4326 lon/lat —
projected sources are reprojected through kernels/proj.py (from-scratch
Snyder/Krueger projections + Helmert datum shifts), mirroring the
reference's GeoTools findMathTransform-to-4326 step
(ShapefileReader.java:65-78, GeoPackageReader.java:165-201).
"""

from __future__ import annotations

import os
import sqlite3
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels import geom as gk

FEATURE_SCHEMA = ("id long, source string, layer string, tags map<string,string>, "
                  "geom_wkb binary, minx double, miny double, maxx double, maxy double")

_SHP_POINT = 1
_SHP_POLYLINE = 3
_SHP_POLYGON = 5
_SHP_MULTIPOINT = 8


# --- .dbf (dBase III) attribute table ----------------------------------------

def _dbf_fields(buf: memoryview):
    """[(name, type, length)] + (header_size, record_size, n_records)."""
    n_records = struct.unpack_from("<I", buf, 4)[0]
    header_size, record_size = struct.unpack_from("<HH", buf, 8)
    fields = []
    off = 32
    while off < header_size - 1 and buf[off] != 0x0D:
        raw = bytes(buf[off:off + 11]).split(b"\x00")[0]
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fields.append((raw.decode("ascii", "replace"), ftype, flen))
        off += 32
    return fields, header_size, record_size, n_records


def _dbf_record(buf: memoryview, header_size: int, record_size: int,
                fields, idx: int, encoding: str) -> dict:
    off = header_size + idx * record_size
    if buf[off] == 0x2A:  # deleted
        return {}
    off += 1
    tags = {}
    for name, ftype, flen in fields:
        raw = bytes(buf[off:off + flen]).strip()
        off += flen
        if raw:
            tags[name] = raw.decode(encoding, "replace")
    return tags


# --- .shp geometry records ----------------------------------------------------

def _shp_geom(mv: memoryview, tfm=None):
    """One record's content -> (wkb, minx, miny, maxx, maxy) or None.

    `tfm` is an optional vectorized (x_arr, y_arr) -> (lon_arr, lat_arr)
    reprojection (kernels/proj.CRS.to_wgs84) applied to every coordinate
    before WKB packing — the ShapefileReader.java:65-78 transform-to-EPSG:4326
    step, done here batch-vectorized per record."""
    (stype,) = struct.unpack_from("<i", mv, 0)
    if stype == 0:
        return None
    if stype == _SHP_POINT:
        x, y = struct.unpack_from("<dd", mv, 4)
        if tfm is not None:
            xa, ya = tfm(np.array([x]), np.array([y]))
            x, y = float(xa[0]), float(ya[0])
        return gk.wkb_point(x, y), x, y, x, y
    if stype == _SHP_MULTIPOINT:
        minx, miny, maxx, maxy = struct.unpack_from("<dddd", mv, 4)
        (n,) = struct.unpack_from("<i", mv, 36)
        pts = np.frombuffer(mv, dtype="<f8", count=2 * n, offset=40).reshape(n, 2)
        if tfm is not None:
            tx, ty = tfm(pts[:, 0], pts[:, 1])
            pts = np.stack([tx, ty], axis=1)
            minx, miny = float(tx.min()), float(ty.min())
            maxx, maxy = float(tx.max()), float(ty.max())
        # engine shape has no multipoint WKB: emit the first point's WKB +
        # the true bbox (parity with SimpleFeature's single-geometry model
        # would emit one row per point; multipoint sources are rare)
        return gk.wkb_point(pts[0, 0], pts[0, 1]), minx, miny, maxx, maxy
    if stype in (_SHP_POLYLINE, _SHP_POLYGON):
        minx, miny, maxx, maxy = struct.unpack_from("<dddd", mv, 4)
        nparts, npoints = struct.unpack_from("<ii", mv, 36)
        parts = np.frombuffer(mv, dtype="<i4", count=nparts, offset=44)
        pts = np.frombuffer(mv, dtype="<f8", count=2 * npoints,
                            offset=44 + 4 * nparts).reshape(npoints, 2)
        if tfm is not None:
            tx, ty = tfm(pts[:, 0], pts[:, 1])
            pts = np.stack([tx, ty], axis=1)
            minx, miny = float(tx.min()), float(ty.min())
            maxx, maxy = float(tx.max()), float(ty.max())
        bounds = np.append(parts, npoints)
        rings = [pts[bounds[i]:bounds[i + 1]].astype(np.float64)
                 for i in range(nparts) if bounds[i + 1] - bounds[i] >= 2]
        if not rings:
            return None
        if stype == _SHP_POLYGON:
            return gk.wkb_polygon(rings), minx, miny, maxx, maxy
        return gk.wkb_linestring(rings[0]), minx, miny, maxx, maxy
    raise ValueError(f"unsupported shapefile shape type {stype}")


def _shx_offsets(path_shx: str) -> np.ndarray:
    """Record byte offsets from the .shx index (8 bytes per record:
    int32 BE offset in 16-bit words, int32 BE length)."""
    with open(path_shx, "rb") as f:
        buf = f.read()
    body = np.frombuffer(buf, dtype=">i4", offset=100)
    return body[0::2].astype(np.int64) * 2


def read_shapefile(spark: SparkSession, shp_path: str, source: str = "shapefile",
                   layer: str | None = None, partitions: int = 8,
                   source_projection: str | None = None) -> DataFrame:
    """stations.shp + .shx + .dbf (+ .cpg, + .prj) -> engine feature rows,
    executor-parallel over .shx record ranges.

    CRS handling mirrors ShapefileReader.java:65-78: `source_projection`
    (an `EPSG:n` code or WKT, GeoUtils.decodeCRS:768-791) overrides the
    `.prj` sidecar; geometry is reprojected to EPSG:4326 lon/lat. A missing
    or geographic no-datum-shift CRS passes coordinates through (the
    reference's lenient=true transform)."""
    base = shp_path[:-4]
    layer = layer if layer is not None else os.path.basename(base)
    offsets = _shx_offsets(base + ".shx")
    n = len(offsets)
    encoding = "latin-1"
    if os.path.exists(base + ".cpg"):
        with open(base + ".cpg") as f:
            encoding = f.read().strip() or "latin-1"
    crs_spec = source_projection
    if crs_spec is None and os.path.exists(base + ".prj"):
        with open(base + ".prj") as f:
            crs_spec = f.read().strip() or None
    splits = np.array_split(np.arange(n), min(partitions, max(n, 1)))
    ranges = [(int(s[0]), int(s[-1]) + 1) for s in splits if len(s)]
    rdf = spark.createDataFrame(ranges, "start long, stop long")

    def gen(batches):
        with open(base + ".shp", "rb") as f:
            shp = memoryview(f.read())
        with open(base + ".dbf", "rb") as f:
            dbf = memoryview(f.read())
        fields, hs, rs, _ = _dbf_fields(dbf)
        tfm = None
        if crs_spec is not None:
            from ..kernels import proj as pj
            crs = pj.decode_crs(crs_spec)
            if not (crs.is_geographic and crs.helmert.identity):
                tfm = crs.to_wgs84
        for pdf in batches:
            rows = {k: [] for k in ("id", "source", "layer", "tags", "geom_wkb",
                                    "minx", "miny", "maxx", "maxy")}
            for r in pdf.itertuples(index=False):
                for i in range(int(r.start), int(r.stop)):
                    off = int(offsets[i])
                    (_recno, clen) = struct.unpack_from(">ii", shp, off)
                    geom = _shp_geom(shp[off + 8:off + 8 + 2 * clen], tfm)
                    if geom is None:
                        continue
                    wkb, x0, y0, x1, y1 = geom
                    rows["id"].append(i)
                    rows["source"].append(source)
                    rows["layer"].append(layer)
                    rows["tags"].append(_dbf_record(dbf, hs, rs, fields, i, encoding))
                    rows["geom_wkb"].append(wkb)
                    rows["minx"].append(x0)
                    rows["miny"].append(y0)
                    rows["maxx"].append(x1)
                    rows["maxy"].append(y1)
            if rows["id"]:  # empty frames carry wrong dtypes for arrow
                yield pd.DataFrame(rows)

    return rdf.repartition(len(ranges), "start").mapInPandas(gen, FEATURE_SCHEMA)


# --- GeoPackage / NaturalEarth sqlite ----------------------------------------

def _gpkg_unwrap(blob: bytes) -> bytes:
    """Strip the GeoPackage binary header (magic 'GP', version, flags,
    srs_id, optional envelope) -> raw WKB."""
    if blob[:2] != b"GP":
        return blob  # already raw WKB (NaturalEarth style)
    flags = blob[3]
    env = (flags >> 1) & 0x07
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env]
    return blob[8 + env_len:]


def _sqlite_feature_tables(path: str) -> list[tuple[str, str]]:
    """[(table, geometry_column)] — gpkg metadata if present, else every
    table with a `geometry`/`GEOMETRY` column (NaturalEarthReader.java:58)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        tables = []
        names = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
        if "gpkg_contents" in names:
            for t, in con.execute(
                    "SELECT table_name FROM gpkg_contents WHERE data_type='features'"):
                gc = con.execute(
                    "SELECT column_name FROM gpkg_geometry_columns "
                    "WHERE table_name=?", (t,)).fetchone()
                tables.append((t, gc[0] if gc else "geom"))
            return tables
        for t in sorted(names):
            cols = [r[1] for r in con.execute(f'PRAGMA table_info("{t}")')]
            for c in cols:
                if c.lower() == "geometry":
                    tables.append((t, c))
                    break
        return tables
    finally:
        con.close()


def _gpkg_srs_by_table(path: str) -> dict:
    """{table: WKT definition} for feature tables whose srs is not already
    lon/lat WGS84 — the GeoPackageReader.java:165-201 reprojection inputs
    (gpkg_geometry_columns.srs_id -> gpkg_spatial_ref_sys.definition)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        names = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
        if "gpkg_geometry_columns" not in names or "gpkg_spatial_ref_sys" not in names:
            return {}
        out = {}
        for t, srs in con.execute(
                "SELECT table_name, srs_id FROM gpkg_geometry_columns"):
            if srs in (4326, 0, -1):
                continue
            row = con.execute(
                "SELECT organization, organization_coordsys_id, definition "
                "FROM gpkg_spatial_ref_sys WHERE srs_id=?", (srs,)).fetchone()
            if row is None:
                continue
            org, org_id, definition = row
            if (org or "").upper() == "EPSG" and org_id == 4326:
                continue
            out[t] = (f"EPSG:{org_id}" if (org or "").upper() == "EPSG" and org_id
                      else definition)
        return out
    finally:
        con.close()


def _transform_geom(typ, data, tfm):
    """Parsed WKB geometry -> reprojected (wkb, (minx, miny, maxx, maxy))."""
    if typ == "point":
        xa, ya = tfm(np.array([data[0]]), np.array([data[1]]))
        x, y = float(xa[0]), float(ya[0])
        return gk.wkb_point(x, y), (x, y, x, y)
    if typ == "linestring":
        tx, ty = tfm(data[:, 0], data[:, 1])
        pts = np.stack([tx, ty], axis=1)
        return gk.wkb_linestring(pts), (float(tx.min()), float(ty.min()),
                                        float(tx.max()), float(ty.max()))
    if typ == "polygon":
        rings = []
        for ring in data:
            tx, ty = tfm(ring[:, 0], ring[:, 1])
            rings.append(np.stack([tx, ty], axis=1))
        allx = np.concatenate([r[:, 0] for r in rings])
        ally = np.concatenate([r[:, 1] for r in rings])
        return gk.wkb_polygon(rings), (float(allx.min()), float(ally.min()),
                                       float(allx.max()), float(ally.max()))
    if typ == "multipolygon":
        polys = []
        for poly in data:
            rings = []
            for ring in poly:
                tx, ty = tfm(ring[:, 0], ring[:, 1])
                rings.append(np.stack([tx, ty], axis=1))
            polys.append(rings)
        allx = np.concatenate([r[:, 0] for p in polys for r in p])
        ally = np.concatenate([r[:, 1] for p in polys for r in p])
        return gk.wkb_multipolygon(polys), (float(allx.min()), float(ally.min()),
                                            float(allx.max()), float(ally.max()))
    raise ValueError(f"unsupported geometry type {typ}")


def read_geopackage(spark: SparkSession, path: str, source: str = "geopackage",
                    partitions: int = 8,
                    source_projection: str | None = None) -> DataFrame:
    """All feature tables of a GeoPackage (or NaturalEarth-style sqlite) ->
    engine feature rows; executors scan disjoint rowid ranges read-only.

    Per-table CRS from gpkg_spatial_ref_sys (or the `source_projection`
    override) is reprojected to EPSG:4326 (GeoPackageReader.java:165-201)."""
    tables = _sqlite_feature_tables(path)
    srs_by_table = ({t: source_projection for t, _ in tables}
                    if source_projection is not None else _gpkg_srs_by_table(path))
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    ranges = []
    for t, gcol in tables:
        row = con.execute(f'SELECT min(rowid), max(rowid) FROM "{t}"').fetchone()
        if row[0] is None:
            continue
        lo, hi = int(row[0]), int(row[1])
        step = max(1, (hi - lo + 1) // partitions)
        r = lo
        while r <= hi:
            ranges.append((t, gcol, r, min(r + step - 1, hi)))
            r += step
    con.close()
    if not ranges:
        raise ValueError(f"no feature tables found in {path}")
    rdf = spark.createDataFrame(ranges, "tbl string, gcol string, lo long, hi long")

    def gen(batches):
        local = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        local.text_factory = lambda b: b.decode("utf-8", "replace")
        tfms = {}
        for t, spec in srs_by_table.items():
            from ..kernels import proj as pj
            crs = pj.decode_crs(spec)
            if not (crs.is_geographic and crs.helmert.identity):
                tfms[t] = crs.to_wgs84
        try:
            for pdf in batches:
                rows = {k: [] for k in ("id", "source", "layer", "tags", "geom_wkb",
                                        "minx", "miny", "maxx", "maxy")}
                for r in pdf.itertuples(index=False):
                    cols = [c[1] for c in local.execute(
                        f'PRAGMA table_info("{r.tbl}")')]
                    attr_cols = [c for c in cols if c != r.gcol]
                    sel = ", ".join(f'"{c}"' for c in attr_cols)
                    q = (f'SELECT rowid, "{r.gcol}", {sel} FROM "{r.tbl}" '
                         f"WHERE rowid BETWEEN ? AND ?")
                    tfm = tfms.get(r.tbl)
                    for rec in local.execute(q, (int(r.lo), int(r.hi))):
                        rid, blob = rec[0], rec[1]
                        if blob is None:
                            continue
                        wkb = _gpkg_unwrap(bytes(blob))
                        try:
                            typ, data = gk.parse_wkb(wkb)
                            if tfm is not None:
                                wkb, (x0, y0, x1, y1) = _transform_geom(typ, data, tfm)
                            else:
                                x0, y0, x1, y1 = _wkb_bounds(typ, data)
                        except ValueError:
                            continue  # unsupported or EMPTY geometry
                        except IndexError:
                            continue
                        rows["id"].append(int(rid))
                        rows["source"].append(source)
                        rows["layer"].append(r.tbl)
                        rows["tags"].append({c: str(v) for c, v in
                                             zip(attr_cols, rec[2:])
                                             if v is not None})
                        rows["geom_wkb"].append(wkb)
                        rows["minx"].append(x0)
                        rows["miny"].append(y0)
                        rows["maxx"].append(x1)
                        rows["maxy"].append(y1)
                if rows["id"]:  # empty frames carry wrong dtypes for arrow
                    yield pd.DataFrame(rows)
        finally:
            local.close()

    return rdf.repartition(min(len(ranges), partitions), "tbl", "lo") \
        .mapInPandas(gen, FEATURE_SCHEMA)


def read_natural_earth(spark: SparkSession, path: str,
                       source: str = "natural_earth",
                       partitions: int = 8) -> DataFrame:
    """NaturalEarth sqlite (plain WKB `geometry` columns) — same engine as
    read_geopackage; _sqlite_feature_tables falls back to column sniffing
    when gpkg metadata is absent (NaturalEarthReader.java:58)."""
    return read_geopackage(spark, path, source=source, partitions=partitions)


def _wkb_bounds(typ, data):
    if typ == "point":
        return data[0], data[1], data[0], data[1]
    if typ == "linestring":
        return (float(data[:, 0].min()), float(data[:, 1].min()),
                float(data[:, 0].max()), float(data[:, 1].max()))
    if typ == "polygon":
        sh = data[0]
        return (float(sh[:, 0].min()), float(sh[:, 1].min()),
                float(sh[:, 0].max()), float(sh[:, 1].max()))
    # multipolygon (EMPTY geometries raise ValueError -> row skipped upstream)
    shells = [p[0] for p in data if len(p)]
    if not shells:
        raise ValueError("empty multipolygon")
    xs = np.concatenate([s[:, 0] for s in shells])
    ys = np.concatenate([s[:, 1] for s in shells])
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())
