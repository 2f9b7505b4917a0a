"""Overture STAC walker + TopOsmTiles clients (sources/stac.py) driven
against in-process stubs — util/OvertureStac.java, util/TopOsmTiles.java,
util/TileWeights.java semantics."""

import datetime
import json
import lzma
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from planetiler_spark.kernels import tile_math as tm
from planetiler_spark.sources import stac


def _catalog_tree(base):
    """A miniature Overture STAC tree: two releases (2024-01, 2024-02 marked
    latest), themes buildings/places, type collections with bboxed items."""
    return {
        "/catalog.json": {
            "latest": "2024-02",
            "links": [
                {"rel": "child", "href": "./2024-01/catalog.json", "title": "2024-01"},
                {"rel": "child", "href": "./2024-02/catalog.json", "title": "2024-02",
                 "latest": True},
            ],
        },
        "/2024-02/catalog.json": {
            "links": [
                {"rel": "child", "href": "./buildings/catalog.json", "title": "Buildings"},
                {"rel": "child", "href": "./places/catalog.json"},
            ],
        },
        "/2024-02/buildings/catalog.json": {
            "links": [
                {"rel": "child", "href": "./building/collection.json",
                 "title": "building"},
            ],
        },
        "/2024-02/buildings/building/collection.json": {
            "extent": {"spatial": {"bbox": [[-180.0, -90.0, 180.0, 90.0]]}},
            "links": [
                {"rel": "item", "href": "./part-0.json"},
                {"rel": "item", "href": "./part-1.json"},
                {"rel": "item", "href": "./part-2.json"},
            ],
        },
        "/2024-02/buildings/building/part-0.json": {
            "bbox": [-80.0, 30.0, -70.0, 45.0],  # US east coast
            "assets": {"aws": {"href": f"{base}/data/part-0.parquet"}},
        },
        "/2024-02/buildings/building/part-1.json": {
            "bbox": [0.0, 40.0, 10.0, 50.0],  # western europe
            "assets": {"azure": {"href": f"{base}/az/part-1.parquet"}},
        },
        "/2024-02/buildings/building/part-2.json": {
            # no bbox: include conservatively; aws preferred over azure
            "assets": {"aws": {"href": f"{base}/data/part-2.parquet"},
                       "azure": {"href": f"{base}/az/part-2.parquet"}},
        },
        "/2024-02/places/catalog.json": {
            "links": [{"rel": "child", "href": "./place/collection.json"}],
        },
        "/2024-02/places/place/collection.json": {
            "extent": {"spatial": {"bbox": [[100.0, 0.0, 120.0, 20.0]]}},
            "links": [{"rel": "item", "href": "./part-0.json"}],
        },
        "/2024-02/places/place/part-0.json": {
            "bbox": [100.0, 0.0, 120.0, 20.0],
            "assets": {"aws": {"href": f"{base}/data/places-0.parquet"}},
        },
    }


@pytest.fixture()
def stac_server():
    tree = {}

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            doc = tree.get(self.path)
            if doc is None:
                self.send_response(404)
                self.end_headers()
                return
            body = json.dumps(doc).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}"
    tree.update(_catalog_tree(base))
    yield base
    srv.shutdown()


def test_overture_walk_latest_and_bbox_filter(stac_server):
    # world bounds: all three building items, aws preferred, azure fallback
    urls = stac.overture_parquet_urls(
        "buildings", "building", catalog_url=f"{stac_server}/catalog.json")
    assert urls == [f"{stac_server}/data/part-0.parquet",
                    f"{stac_server}/az/part-1.parquet",
                    f"{stac_server}/data/part-2.parquet"]
    # europe bounds: item 0 filtered out, bbox-less item kept conservatively
    urls = stac.overture_parquet_urls(
        "buildings", "building", bounds=(-5.0, 35.0, 15.0, 55.0),
        catalog_url=f"{stac_server}/catalog.json")
    assert urls == [f"{stac_server}/az/part-1.parquet",
                    f"{stac_server}/data/part-2.parquet"]


def test_overture_collection_extent_prefilter_and_href_match(stac_server):
    # `places` theme has no title on its child link -> matched by href
    # segment; its collection extent (SE asia) doesn't intersect europe
    assert stac.overture_parquet_urls(
        "places", "place", bounds=(-5.0, 35.0, 15.0, 55.0),
        catalog_url=f"{stac_server}/catalog.json") == []
    # ...but intersecting bounds walk through
    assert stac.overture_parquet_urls(
        "PLACES", "Place", bounds=(105.0, 5.0, 110.0, 10.0),
        catalog_url=f"{stac_server}/catalog.json") == \
        [f"{stac_server}/data/places-0.parquet"]


def test_overture_latest_field_fallback_and_errors(stac_server):
    # a root whose child links carry no `latest` flag falls back to the
    # catalog-level `latest` version field (resolveLatestCatalogUrl:184-188)
    fetched = []

    def fetch(url):
        fetched.append(url)
        if url.endswith("/root.json"):
            return {"latest": "2024-02", "links": [
                {"rel": "child", "href": "./2024-01/catalog.json"}]}
        return stac._http_fetch_json(url)

    urls = stac.overture_parquet_urls(
        "buildings", "building",
        catalog_url=f"{stac_server}/root.json", fetch=fetch)
    assert len(urls) == 3
    assert any(u.endswith("/2024-02/catalog.json") for u in fetched)
    with pytest.raises(ValueError, match="theme 'roads' not found"):
        stac.overture_parquet_urls("roads", "road",
                                   catalog_url=f"{stac_server}/catalog.json")
    with pytest.raises(ValueError, match="type 'door' not found"):
        stac.overture_parquet_urls("buildings", "door",
                                   catalog_url=f"{stac_server}/catalog.json")


# --- TopOsmTiles ---------------------------------------------------------------

def test_parse_tile_log_zoom_shift():
    # 256px OSM tiles move UP one zoom onto the 512px vector grid
    counts = stac.parse_tile_log(
        "4/8/6 100\n4/9/7 50\n1/1/1 7\n0/0/0 9\nbad line\n17/0/0 1\n",
        max_zoom=14)
    # 4/8/6 and 4/9/7 both land on 3/4/3; 0/0/0 drops (z-1 < 0)
    assert counts == {(3, 4, 3): 150, (0, 0, 0): 7}


def test_top_osm_tiles_merge_topn_and_missing_days():
    days = [datetime.date(2024, 1, d) for d in (1, 2, 3)]
    logs = {
        days[0]: "2/0/0 10\n2/2/2 5\n",
        days[1]: "2/0/0 20\n2/2/0 1\n",
        days[2]: None,  # no data for this day (404 analog)
    }
    calls = {"n": 0}

    def fetch(date):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("transient")  # first fetch retries
        raw = logs[date]
        return None if raw is None else lzma.compress(raw.encode())

    top = stac.top_osm_tiles(days, top_n=2, max_zoom=14, fetch=fetch, retries=1)
    assert top == {(1, 0, 0): 30, (1, 1, 1): 5}  # top-2 of three tiles


def test_tile_weights_file_roundtrip(tmp_path):
    w = {(3, 4, 3): 150, (0, 0, 0): 7, (14, 1000, 2000): 42}
    p = str(tmp_path / "weights.tsv.gz")
    stac.write_tile_weights(p, w)
    assert stac.read_tile_weights(p) == w
    import gzip
    lines = gzip.open(p, "rt").read().splitlines()
    assert lines[0] == "z\tx\ty\tloads"  # reference header + tab separator
    # rows sorted by tile id (TileWeights.writeToFile:74-76)
    ids = [int(tm.tile_encode(int(x), int(y), int(z)))
           for z, x, y, _ in (ln.split("\t") for ln in lines[1:])]
    assert ids == sorted(ids)


def test_weights_roundtrip_into_weighted_stats(spark, tmp_path):
    """The VERDICT r4 #7 round-trip: stub logs -> top_osm_tiles ->
    weights file -> tile_weights_df -> the same broadcast-left-join weighted
    aggregation the oracle-backed tileset_stats row uses."""
    day = [datetime.date(2024, 1, 1)]
    log = "3/0/0 8\n3/2/2 4\n3/4/4 2\n"
    w = stac.top_osm_tiles(day, fetch=lambda d: lzma.compress(log.encode()))
    p = str(tmp_path / "w.tsv.gz")
    stac.write_tile_weights(p, w)
    wdf = stac.tile_weights_df(spark, p)

    tiles = spark.createDataFrame(
        [(int(tm.tile_encode(x, y, 2)), (x + 1) * 100) for x in range(3)
         for y in range(3)], "tile_id long, n_bytes long")
    got = (tiles.join(F.broadcast(wdf), "tile_id", "left")
           .agg(F.sum(F.col("n_bytes") * F.coalesce("w", F.lit(0))).alias("ws"),
                F.sum(F.coalesce("w", F.lit(0))).alias("tw")).collect()[0])
    # log tiles 3/0/0 -> 2/0/0 (w=8), 3/2/2 -> 2/1/1 (w=4), 3/4/4 -> 2/2/2 (w=2)
    assert got.ws == 100 * 8 + 200 * 4 + 300 * 2
    assert got.tw == 14
