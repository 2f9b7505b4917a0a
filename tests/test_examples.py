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
