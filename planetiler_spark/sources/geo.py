"""Geo format sources: GeoJSON and GeoParquet-style readers.

Reference parity (SURVEY §2.1):
  - GeoJSON scan (reader/geojson/GeoJsonReader.java:24): streaming parse ->
    SourceFeature rows. Here: spark.read.json (Jackson-parallel, splittable
    for newline-delimited GeoJSON) + a vectorized coordinate->WKB kernel.
  - GeoParquet scan (reader/parquet/ParquetReader.java:38-46): WKB geometry
    column + bbox struct for row-group pushdown (ParquetInputFile.java:83-96).
    Here the bbox lives in four plain columns, so Catalyst pushes bbox
    predicates into parquet row-group min/max pruning natively — the whole
    point of the reference's hand-rolled pushdown, for free.

Both normalize to the engine's feature shape:
  (id long, source string, layer string, tags map<string,string>,
   geom_wkb binary, minx, miny, maxx, maxy double)   [world coords]
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import geom as gk
from ..kernels import tile_math as tm

FEATURE_SCHEMA = ("id long, source string, layer string, tags map<string,string>, "
                  "geom_wkb binary, minx double, miny double, maxx double, maxy double")


def _geojson_geom_to_wkb(geom: dict) -> tuple[bytes, float, float, float, float]:
    """GeoJSON geometry dict (lon/lat) -> world-coordinate WKB + bbox."""
    typ = geom["type"]
    def w(c):
        lon, lat = np.asarray(c, dtype=np.float64).T
        return np.stack([tm.get_world_x(lon), tm.get_world_y(lat)], axis=1)
    if typ == "Point":
        pt = w([geom["coordinates"]])[0]
        return gk.wkb_point(pt[0], pt[1]), pt[0], pt[1], pt[0], pt[1]
    if typ == "LineString":
        c = w(geom["coordinates"])
        return (gk.wkb_linestring(c), c[:, 0].min(), c[:, 1].min(),
                c[:, 0].max(), c[:, 1].max())
    if typ == "Polygon":
        rings = [w(r) for r in geom["coordinates"]]
        sh = rings[0]
        return (gk.wkb_polygon(rings), sh[:, 0].min(), sh[:, 1].min(),
                sh[:, 0].max(), sh[:, 1].max())
    if typ == "MultiPolygon":
        polys = [[w(r) for r in p] for p in geom["coordinates"]]
        xs = np.concatenate([p[0][:, 0] for p in polys])
        ys = np.concatenate([p[0][:, 1] for p in polys])
        return (gk.wkb_multipolygon(polys), xs.min(), ys.min(), xs.max(), ys.max())
    raise ValueError(f"unsupported GeoJSON geometry {typ}")


def read_geojson(spark: SparkSession, path: str, source: str = "geojson",
                 layer: str = "") -> DataFrame:
    """Newline-delimited GeoJSON features -> engine feature rows. Lines are
    read splittable/parallel as text (Spark's JSON schema inference coerces
    ragged coordinate arrays to strings, so geometry parses inside the UDF
    instead — mirroring the reference's streaming GeoJsonFeatureIterator)."""
    # globally unique feature ids even across partitions of a splittable
    # multi-partition input: monotonically_increasing_id embeds the partition
    # id in the high bits, so no two lines share an id
    raw = spark.read.text(path).withColumn("_rid", F.monotonically_increasing_id())

    def conv(batches):
        for pdf in batches:
            rows = {k: [] for k in ("id", "source", "layer", "tags", "geom_wkb",
                                    "minx", "miny", "maxx", "maxy")}
            for line, rid in zip(pdf["value"], pdf["_rid"]):
                if not line.strip():
                    continue
                feat = json.loads(line)
                geom = feat["geometry"]
                props = feat.get("properties") or {}
                wkb, x0, y0, x1, y1 = _geojson_geom_to_wkb(geom)
                rows["id"].append(int(rid))
                rows["source"].append(source)
                rows["layer"].append(layer)
                rows["tags"].append({k: str(v) for k, v in props.items()})
                rows["geom_wkb"].append(wkb)
                rows["minx"].append(float(x0))
                rows["miny"].append(float(y0))
                rows["maxx"].append(float(x1))
                rows["maxy"].append(float(y1))
            yield pd.DataFrame(rows)

    return raw.mapInPandas(conv, FEATURE_SCHEMA)


def write_geoparquet(features: DataFrame, path: str):
    """Engine feature rows -> parquet with WKB + bbox columns; min/max
    statistics on (minx,miny,maxx,maxy) give row-group pruning to any reader."""
    features.write.mode("overwrite").parquet(path)


def read_geoparquet(spark: SparkSession, path: str,
                    bounds: tuple[float, float, float, float] | None = None) -> DataFrame:
    """GeoParquet-style scan with bbox pushdown: the bounds filter lands in
    the parquet scan as PushedFilters (verify with .explain) — the Spark
    equivalent of ParquetInputFile's row-group bbox pruning (:83-96), plus
    the early bounds pre-filter (SourceFeatureProcessor.java:96-97)."""
    df = spark.read.parquet(path)
    if bounds is not None:
        x0, y0, x1, y1 = bounds
        df = df.filter((F.col("maxx") >= x0) & (F.col("minx") <= x1) &
                       (F.col("maxy") >= y0) & (F.col("miny") <= y1))
    return df
