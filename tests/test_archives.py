"""Archive sink round-trips: MBTiles (plain + normalized dedup), PMTiles v3,
files tree, CSV/JSON streams — all archives must agree tile-for-tile
(util/CompareArchives.java:48 is the model)."""

import gzip
import json
import os
import sqlite3

import pytest

from planetiler_spark.operators import tile_pipeline as tp
from planetiler_spark.sources import archives as ar
from planetiler_spark.sources import images as src

N = 64


@pytest.fixture(scope="module")
def tiles(spark):
    imgs = src.images_df(spark, N, partitions=4, with_bytes=False)
    t = tp.tileset(spark, imgs, min_zoom=0, max_zoom=5)
    t.cache().count()
    return t


@pytest.fixture(scope="module")
def tile_map(tiles):
    return {(r.zoom, r.x, r.y): bytes(r.tile_bytes) for r in tiles.collect()}


def test_mbtiles_roundtrip(tiles, tile_map, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mb") / "out.mbtiles")
    stats = ar.write_mbtiles(tiles, path, {"minzoom": 0, "maxzoom": 5},
                             normalized=False)
    assert stats["tiles"] == len(tile_map)
    assert ar.read_mbtiles(path) == tile_map


def test_mbtiles_normalized_dedup(tiles, tile_map, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mbn") / "out.mbtiles")
    stats = ar.write_mbtiles(tiles, path, normalized=True)
    assert ar.read_mbtiles(path) == tile_map  # view reconstructs everything
    assert stats["unique_blobs"] <= stats["tiles"]
    # sqlite actually holds only unique blobs
    con = sqlite3.connect(path)
    (n_data,) = con.execute("SELECT count(*) FROM tiles_data").fetchone()
    con.close()
    assert n_data == stats["unique_blobs"]


def test_pmtiles_roundtrip(tiles, tile_map, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pm") / "out.pmtiles")
    stats = ar.write_pmtiles(tiles, path, {"name": "test"})
    assert stats["tiles"] == len(tile_map)
    got = ar.read_pmtiles(path)
    assert got == tile_map
    assert stats["unique_blobs"] <= stats["tiles"]
    assert os.path.getsize(path) == stats["bytes"]


def test_files_archive_roundtrip(tiles, tile_map, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("files") / "tree")
    n = ar.write_files_archive(tiles, base)
    assert n == len(tile_map)
    assert ar.read_files_archive(base) == tile_map
    assert json.load(open(os.path.join(base, "metadata.json")))["format"] == "pbf"


def test_csv_and_json_archives(spark, tiles, tile_map, tmp_path_factory):
    import base64
    csvp = str(tmp_path_factory.mktemp("csv") / "tiles")
    ar.write_csv_archive(tiles, csvp)
    rows = spark.read.csv(csvp).collect()
    assert len(rows) == len(tile_map)
    jsonp = str(tmp_path_factory.mktemp("json") / "tiles")
    ar.write_json_archive(tiles, jsonp)
    jrows = spark.read.json(jsonp).collect()
    assert len(jrows) == len(tile_map)
    r0 = jrows[0]
    assert base64.b64decode(r0.encoded_data) == tile_map[(r0.z, r0.x, r0.y)]


def test_all_archives_agree(tile_map):
    # gzip payloads decode to the same MVT bytes regardless of archive
    blob = next(iter(tile_map.values()))
    assert gzip.decompress(blob)
