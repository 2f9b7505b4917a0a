"""End-to-end OSM -> vector-tile archive: the reference's headline flow
(Planetiler.run, Planetiler.java:791-996: osm.pbf -> profile -> render ->
sort -> mbtiles) replayed Spark-first over this engine's own pieces:

  read_osm_pbf (parallel blob decode)            sources/osm.py
    -> way_geometries (distributed node lookup)  the pass-2 equi-join
    -> multipolygon assembly for relations       kernels/lines.py
    -> profile match (layer rules on tags)       Catalyst filters, this file
    -> per-zoom render: slice points/lines/      operators/render.py
       polygons into tile-local fragments
    -> shuffle on the 64-bit sort key            the external merge sort
    -> consecutive-run MVT encode (multi-layer   kernels/mvt.py LayerBuilder
       tiles with interned attrs)
    -> MBTiles / PMTiles / files archive         sources/archives.py

The built-in DEFAULT_PROFILE is a compact OpenMapTiles-flavored schema
(water/landuse/building/road/poi) — swap in any rules of the same shape, or
compile them from YAML via plans/profile.py. Geometry typing follows the
reference's rule (OsmReader.canBePolygon/canBeLine): a closed way with an
area-ish tag renders as a polygon, other matched ways as lines; relations
tagged type=multipolygon assemble member ways into shells + holes.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import geom as gk
from ..kernels import lines as lk
from ..kernels import mvt
from ..kernels import tile_math as tm
from ..operators import render as R
from ..sources import osm as osrc

# layer rules: (layer, tag key, allowed values or None=any, geom, minzoom,
# attr keys carried into the tile)
DEFAULT_PROFILE = [
    ("water", "natural", {"water"}, "polygon", 6, ("natural", "name")),
    ("landuse", "landuse", {"residential", "grass", "forest", "meadow",
                            "industrial", "cemetery"}, "polygon", 9,
     ("landuse",)),
    ("building", "building", None, "polygon", 13, ("building",)),
    ("road", "highway", None, "line", 5, ("highway", "name")),
    ("poi", "amenity", None, "point", 14, ("amenity", "name")),
]

FEATURES_SCHEMA = ("key long, tile_id long, zoom int, layer string, fid long, "
                   "ftype int, fill boolean, parts binary, attrs string")
_LAYER_IDX = {name: i for i, (name, *_rest) in enumerate(DEFAULT_PROFILE)}
_AREA_KEYS = ("building", "landuse", "natural", "leisure", "amenity")


def _match_col(key: str, vals):
    c = F.col("tags")[key]
    return c.isNotNull() if vals is None else c.isin(*vals)


def _attrs_json(tags: dict, keys) -> str:
    return json.dumps({k: tags[k] for k in keys if tags.get(k) is not None},
                      sort_keys=True)


def osm_features(spark: SparkSession, pbf: str, profile=DEFAULT_PROFILE) -> DataFrame:
    """Entities -> one matched-feature DataFrame:
    (fid, layer, kind point|line|polygon|multipolygon, minzoom, tags,
    lons/lats as array<array<double>>) — geometry is uniformly NESTED: a
    point/way is a single inner array, a multipolygon relation carries one
    inner array per member way (ring assembly happens at render, where numpy
    is available)."""
    ents = osrc.read_osm_pbf(spark, pbf).cache()
    nodes = ents.filter("etype = 0")
    ways = ents.filter("etype = 1")
    rels = ents.filter("etype = 2")
    geoms = osrc.way_geometries(ents)
    ways_g = ways.select("id", "tags", (F.element_at("refs", 1) ==
                                        F.element_at("refs", -1)).alias("closed")) \
                 .join(geoms.withColumnRenamed("way_id", "id"), "id")

    def rows(src_df, layer, kind, minzoom, lons_col, lats_col):
        return src_df.select(
            F.col("id").alias("fid"), F.lit(layer).alias("layer"),
            F.lit(kind).alias("kind"), F.lit(minzoom).alias("minzoom"),
            "tags", lons_col.alias("lons"), lats_col.alias("lats"))

    # multipolygon relations: members joined to way coords, grouped per rel
    mp = (rels.filter(F.col("tags")["type"] == "multipolygon")
          .select(F.col("id").alias("rid"), "tags",
                  F.explode(F.arrays_zip(F.col("member_ids").alias("mid"),
                                         F.col("member_types").alias("mtype"))).alias("m"))
          .filter("m.mtype = 1")
          .select("rid", "tags", F.col("m.mid").alias("id"))
          .join(geoms.withColumnRenamed("way_id", "id"), "id")
          .groupBy("rid")
          .agg(F.first("tags").alias("tags"),
               F.collect_list("lons").alias("lons"),
               F.collect_list("lats").alias("lats"))
          .withColumnRenamed("rid", "id"))

    out = []
    for layer, key, vals, geom, minzoom, _attr_keys in profile:
        m = _match_col(key, vals)
        if geom == "point":
            out.append(rows(nodes.filter(m), layer, "point", minzoom,
                            F.array(F.array("lon")), F.array(F.array("lat"))))
        elif geom == "line":
            out.append(rows(ways_g.filter(m), layer, "line", minzoom,
                            F.array("lons"), F.array("lats")))
        else:
            out.append(rows(ways_g.filter(m & F.col("closed")), layer,
                            "polygon", minzoom,
                            F.array("lons"), F.array("lats")))
            out.append(rows(mp.filter(m), layer, "multipolygon", minzoom,
                            F.col("lons"), F.col("lats")))
    feats = out[0]
    for o in out[1:]:
        feats = feats.unionByName(o)
    return feats


def _rings_world(lons, lats) -> list[np.ndarray]:
    wx = tm.get_world_x(np.asarray(lons, dtype=np.float64))
    wy = tm.get_world_y(np.asarray(lats, dtype=np.float64))
    return np.stack([wx, wy], axis=1)


def render_osm_features(feats: DataFrame, profile=DEFAULT_PROFILE,
                        min_zoom: int = 0, max_zoom: int = 14) -> DataFrame:
    """Matched features -> per-(tile, zoom) fragment rows in the sorted-KV
    model (ftype = MVT geometry type; fill rows for polygon interiors)."""
    attr_keys = {layer: ak for layer, _k, _v, _g, _mz, ak in profile}
    layer_idx = dict(_LAYER_IDX)

    def gen(batches):
        for pdf in batches:
            rows = {k: [] for k in ("key", "tile_id", "zoom", "layer", "fid",
                                    "ftype", "fill", "parts", "attrs")}

            def emit(z, tx, ty, layer, fid, ftype, fill, parts, attrs):
                tid = int(tm.tile_encode(tx, ty, z))
                li = layer_idx.get(layer, 7)
                rows["key"].append(int(tm.encode_sort_key(tid, li, 0, 0)))
                rows["tile_id"].append(tid)
                rows["zoom"].append(z)
                rows["layer"].append(layer)
                rows["fid"].append(int(fid))
                rows["ftype"].append(ftype)
                rows["fill"].append(fill)
                rows["parts"].append(b"" if parts is None else
                                     gk.pack_parts([np.asarray(p, np.int64)
                                                    for p in parts]))
                rows["attrs"].append(attrs)

            for r in pdf.itertuples(index=False):
                attrs = _attrs_json(dict(r.tags),
                                    attr_keys.get(r.layer, ("name",)))
                z0 = max(min_zoom, int(r.minzoom))
                if r.kind == "point":
                    wx = tm.get_world_x(np.asarray(r.lons[0]))
                    wy = tm.get_world_y(np.asarray(r.lats[0]))
                    for z in range(z0, max_zoom + 1):
                        idx, tx, ty, ex, ey = R.slice_points(wx, wy, z)
                        for i in range(len(tx)):
                            emit(z, int(tx[i]), int(ty[i]), r.layer, r.fid, 1,
                                 False, [np.array([[int(ex[i]), int(ey[i])]])],
                                 attrs)
                elif r.kind == "line":
                    coords = _rings_world(r.lons[0], r.lats[0])
                    for z in range(z0, max_zoom + 1):
                        for tx, ty, parts in R.slice_line(coords, z):
                            emit(z, int(tx), int(ty), r.layer, r.fid, 2, False,
                                 parts, attrs)
                else:  # polygon / multipolygon
                    if r.kind == "multipolygon":
                        members = [_rings_world(lo, la)
                                   for lo, la in zip(r.lons, r.lats)]
                        polys = lk.assemble_multipolygon(members)
                    else:
                        polys = [[_rings_world(r.lons[0], r.lats[0])]]
                    for rings in polys:
                        for z in range(z0, max_zoom + 1):
                            for tx, ty, kind, parts in R.slice_polygon(rings, z):
                                emit(z, int(tx), int(ty), r.layer, r.fid, 3,
                                     kind == "fill", parts, attrs)
            yield pd.DataFrame(rows)

    return feats.mapInPandas(gen, FEATURES_SCHEMA)


TILES_SCHEMA = ("tile_id long, zoom int, x int, y int, n_features long, "
                "tile_bytes binary, content_hash string")


def encode_osm_tiles(frags: DataFrame, partitions: int | None = None) -> DataFrame:
    """Shuffle on the sort key, then consecutive-run multi-layer MVT encode."""
    import hashlib
    p = int(partitions or frags.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    shuffled = (frags.repartition(p, "tile_id")
                .sortWithinPartitions("tile_id", "key", "fid"))
    fill_cmds = mvt.encode_fill()

    def encode(batches):
        cur_tile = None
        layers: dict[str, mvt.LayerBuilder] = {}
        nfeat = 0

        def flush():
            nonlocal layers, nfeat
            if cur_tile is None:
                return None
            blob = mvt.encode_tile(list(layers.values()))
            x, y, z = tm.tile_decode(np.int64(cur_tile))
            row = (int(cur_tile), int(z), int(x), int(y), nfeat, blob,
                   hashlib.sha256(blob).hexdigest()[:16])
            layers = {}
            nfeat = 0
            return row

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.tile_id != cur_tile:
                    row = flush()
                    if row:
                        out.append(row)
                    cur_tile = r.tile_id
                lb = layers.get(r.layer)
                if lb is None:
                    lb = layers[r.layer] = mvt.LayerBuilder(r.layer)
                cmds = fill_cmds if r.fill else mvt.encode_geometry(
                    int(r.ftype), gk.unpack_parts(bytes(r.parts)))
                lb.add_feature(int(r.fid), int(r.ftype), cmds,
                               json.loads(r.attrs))
                nfeat += 1
            if out:
                yield pd.DataFrame(out, columns=["tile_id", "zoom", "x", "y",
                                                 "n_features", "tile_bytes",
                                                 "content_hash"])
        row = flush()
        if row:
            yield pd.DataFrame([row], columns=["tile_id", "zoom", "x", "y",
                                               "n_features", "tile_bytes",
                                               "content_hash"])

    return shuffled.mapInPandas(encode, TILES_SCHEMA)


def osm_tileset(spark: SparkSession, pbf: str, min_zoom: int = 0,
                max_zoom: int = 14, profile=DEFAULT_PROFILE,
                partitions: int | None = None) -> DataFrame:
    feats = osm_features(spark, pbf, profile)
    frags = render_osm_features(feats, profile, min_zoom, max_zoom)
    return encode_osm_tiles(frags, partitions)
