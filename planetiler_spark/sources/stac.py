"""Overture STAC catalog walker + TopOsmTiles traffic-weights fetcher —
util/OvertureStac.java:33-275 and util/TopOsmTiles.java:53-209 re-expressed
with the stdlib HTTP client (sources/download.py's openStream).

Semantics ported:
  - OvertureStac.getParquetUrls: root catalog -> latest release catalog
    (child link flagged latest, else the catalog's `latest` version field)
    -> theme child catalog -> type collection (child links matched by title
    OR first href path segment, case-insensitive) -> collection spatial
    extent prefilter -> per-item bbox intersect filter -> `aws` asset href
    with `azure` fallback (OvertureStac.java:98-171, :178-263);
  - TopOsmTiles.run/readFile: per-day xz'd tile logs `z/x/y loads`, each OSM
    256px tile shifted UP one zoom to the 512px vector grid (z-1, x>>1,
    y>>1), counts merged, top-N by loads (TopOsmTiles.java:79-157);
  - TileWeights.writeToFile/readFromFile: gzipped TSV `z x y loads` with a
    header, rows sorted by tile id (TileWeights.java:66-120);
  - downloadPrecomputed: fetch the published top-1m weights file if the
    destination doesn't exist (TopOsmTiles.java:185-208).

No network exists in this sandbox, so tests drive everything against
in-process HTTP servers / injected fetchers (tests/test_stac.py), the same
pattern as sources/download.py and sources/wikidata.py.
"""

from __future__ import annotations

import gzip
import json
import lzma
from urllib.parse import urljoin

from . import download as dl
from ..kernels import tile_math as tm

OVERTURE_CATALOG_URL = "https://stac.overturemaps.org/catalog.json"
TOP_OSM_TILES_URL = ("https://raw.githubusercontent.com/onthegomap/planetiler/"
                     "main/layerstats/top_osm_tiles.tsv.gz")
OSM_TILE_LOG_URL = "https://planet.openstreetmap.org/tile_logs/tiles-{y:04d}-{m:02d}-{d:02d}.txt.xz"


def _http_fetch_json(url: str, timeout: float = 30.0):
    with dl.open_stream(url, timeout) as f:
        return json.loads(f.read().decode())


def _resolve(base: str, href: str) -> str:
    if href.startswith(("http://", "https://")):
        return href
    return urljoin(base, href)


def _latest_catalog_url(catalog: dict, base: str) -> str:
    """OvertureStac.resolveLatestCatalogUrl:178-190."""
    for link in catalog.get("links") or []:
        if link.get("rel") == "child" and link.get("latest"):
            return _resolve(base, link.get("href", ""))
    latest = catalog.get("latest")
    if latest:
        return _resolve(base, f"./{latest}/catalog.json")
    raise ValueError(f"Could not find latest Overture release in catalog {base}")


def _href_segment(href: str) -> str:
    s = href[2:] if href.startswith("./") else href
    return s.split("/", 1)[0]


def _child_url(catalog: dict, base: str, name: str) -> str | None:
    """OvertureStac.resolveChildUrl:192-206: child links matched by title or
    first href path segment, case-insensitive."""
    for link in catalog.get("links") or []:
        if link.get("rel") != "child":
            continue
        href = link.get("href") or ""
        title = link.get("title") or ""
        if name.lower() in (title.lower(), _href_segment(href).lower()):
            return _resolve(base, href)
    return None


def _bbox_intersects(bbox, bounds) -> bool:
    if not bbox or len(bbox) < 4 or bounds is None:
        return True  # no bbox -> include conservatively (itemBboxIntersects:241)
    min_lon, min_lat, max_lon, max_lat = bbox[:4]
    b_min_lon, b_min_lat, b_max_lon, b_max_lat = bounds
    return not (max_lon < b_min_lon or min_lon > b_max_lon
                or max_lat < b_min_lat or min_lat > b_max_lat)


def _collection_intersects(collection: dict, bounds) -> bool:
    """collectionExtentIntersects:216-236: false only if a declared extent
    bbox exists and none of its boxes overlap."""
    if bounds is None:
        return True
    spatial = (collection.get("extent") or {}).get("spatial") or {}
    bboxes = spatial.get("bbox") or []
    if not bboxes:
        return True
    return any(_bbox_intersects(b, bounds) for b in bboxes if b and len(b) >= 4)


def overture_parquet_urls(theme: str, type_: str, bounds=None,
                          catalog_url: str = OVERTURE_CATALOG_URL,
                          fetch=None) -> list[str]:
    """HTTPS parquet URLs for theme/type in the latest Overture release whose
    STAC item bbox intersects `bounds` ((min_lon, min_lat, max_lon, max_lat)
    or None for the world) — OvertureStac.getParquetUrls:98-171. `fetch`
    (url -> parsed JSON) is injectable for tests; defaults to HTTP."""
    fetch = fetch or _http_fetch_json
    catalog = fetch(catalog_url)
    release_url = _latest_catalog_url(catalog, catalog_url)
    release = fetch(release_url)
    theme_url = _child_url(release, release_url, theme)
    if theme_url is None:
        raise ValueError(f"Overture theme {theme!r} not found in catalog {release_url}")
    theme_cat = fetch(theme_url)
    coll_url = _child_url(theme_cat, theme_url, type_)
    if coll_url is None:
        raise ValueError(f"Overture type {type_!r} not found in theme {theme!r} "
                         f"catalog {theme_url}")
    collection = fetch(coll_url)
    if not _collection_intersects(collection, bounds):
        return []
    urls = []
    for link in collection.get("links") or []:
        if link.get("rel") != "item":
            continue
        item = fetch(_resolve(coll_url, link.get("href", "")))
        if not _bbox_intersects(item.get("bbox"), bounds):
            continue
        assets = item.get("assets") or {}
        # Prefer AWS, fall back to Azure (:149-152)
        href = (assets.get("aws") or {}).get("href") or \
               (assets.get("azure") or {}).get("href")
        if href:
            urls.append(href)
    return urls


# --- TopOsmTiles (traffic-weighted tile stats input) --------------------------

def _http_fetch_log(date, timeout: float = 30.0) -> bytes | None:
    """Fetch one day's xz'd tile log; None when the day has no data (404,
    TopOsmTiles.readFile:147-149)."""
    url = OSM_TILE_LOG_URL.format(y=date.year, m=date.month, d=date.day)
    import urllib.error
    try:
        with dl.open_stream(url, timeout) as f:
            return f.read()
    except urllib.error.HTTPError as e:
        if e.code == 404:
            return None
        raise


def parse_tile_log(text: str, max_zoom: int) -> dict[tuple[int, int, int], int]:
    """One tile-log file -> {(z, x, y): loads} on the VECTOR tile grid:
    openstreetmap.org logs 256px raster tiles, so each entry moves UP one
    zoom (z-1, x>>1, y>>1) — TopOsmTiles.readFile:133-144."""
    counts: dict[tuple[int, int, int], int] = {}
    for line in text.splitlines():
        parts = line.replace("/", " ").split()
        if len(parts) != 4:
            continue
        z = int(parts[0]) - 1
        if 0 <= z <= max_zoom:
            key = (z, int(parts[1]) >> 1, int(parts[2]) >> 1)
            counts[key] = counts.get(key, 0) + int(parts[3])
    return counts


def top_osm_tiles(dates, top_n: int = 1_000_000, max_zoom: int = 16,
                  fetch=None, retries: int = 1) -> dict[tuple[int, int, int], int]:
    """Merge per-day tile logs and keep the top-N tiles by loads
    (TopOsmTiles.run:79-124). `fetch(date) -> xz bytes | None` is injectable;
    a day that errors past `retries` is skipped with its data (readFile's
    per-file retry loop :128-156)."""
    fetch = fetch or _http_fetch_log
    counts: dict[tuple[int, int, int], int] = {}
    for date in dates:
        raw = None
        for _ in range(retries + 1):
            try:
                raw = fetch(date)
                break
            except OSError:
                continue
        if raw is None:
            continue
        day = parse_tile_log(lzma.decompress(raw).decode(), max_zoom)
        for k, v in day.items():
            counts[k] = counts.get(k, 0) + v
    top = sorted(counts.items(), key=lambda kv: -kv[1])[:top_n]
    return dict(top)


def write_tile_weights(path: str, weights: dict[tuple[int, int, int], int]):
    """Gzipped TSV `z x y loads` with header, rows sorted by tile id
    (TileWeights.writeToFile:66-86)."""
    rows = sorted(weights.items(),
                  key=lambda kv: int(tm.tile_encode(kv[0][1], kv[0][2], kv[0][0])))
    with gzip.open(path, "wt", newline="") as f:
        f.write("z\tx\ty\tloads\n")
        for (z, x, y), loads in rows:
            f.write(f"{z}\t{x}\t{y}\t{loads}\n")


def read_tile_weights(path: str) -> dict[tuple[int, int, int], int]:
    """TileWeights.readFromFile:93-113 (merging duplicate coords)."""
    weights: dict[tuple[int, int, int], int] = {}
    with gzip.open(path, "rt") as f:
        header = f.readline()
        if header.strip() and header.split("\t")[0] != "z":
            raise ValueError(f"bad tile-weights header: {header!r}")
        for line in f:
            parts = line.split("\t")
            if len(parts) != 4:
                continue
            key = (int(parts[0]), int(parts[1]), int(parts[2]))
            weights[key] = weights.get(key, 0) + int(parts[3])
    return weights


def download_precomputed(dest: str, url: str = TOP_OSM_TILES_URL,
                         timeout: float = 30.0) -> bool:
    """Fetch the published precomputed top-1m weights if `dest` doesn't exist
    (TopOsmTiles.downloadPrecomputed:185-208). Returns True if downloaded."""
    import os
    if os.path.exists(dest):
        return False
    dl.download(url, dest, threads=1, timeout=timeout)
    return True


def tile_weights_df(spark, path_or_weights):
    """Weights as a (tile_id, w) DataFrame ready for the broadcast left join
    the weighted tileset_stats path uses (queries.py tileset_stats)."""
    w = (read_tile_weights(path_or_weights)
         if isinstance(path_or_weights, str) else path_or_weights)
    rows = [(int(tm.tile_encode(x, y, z)), int(loads))
            for (z, x, y), loads in w.items()]
    return spark.createDataFrame(rows, "tile_id long, w long")
