"""Distributed per-tile line merge: slicing a ring into pieces then merging
within each tile must preserve total length and reduce piece counts
(FeatureMerge.mergeLineStrings semantics)."""

import pytest

from planetiler_spark.operators import merge as mg


@pytest.fixture(scope="module")
def merged(spark):
    feats = mg.render_boundary_lines(spark, min_zoom=5, max_zoom=6)
    return mg.merge_tile_lines(feats).collect()


def test_length_preserved(merged):
    assert len(merged) > 0
    for r in merged:
        assert r.len_after == pytest.approx(r.len_before, rel=1e-6), \
            f"length changed in tile {r.tile_id} zone {r.zone_id}"


def test_merge_reduces_pieces(merged):
    assert all(r.n_merged <= r.n_pieces for r in merged)
    # at least some tiles actually merge multiple pieces into fewer strokes
    assert any(r.n_merged < r.n_pieces for r in merged)


def test_single_boundary_in_interior_tile(merged):
    # a tile fully containing a small zone's boundary gets exactly 1 stroke
    singles = [r for r in merged if r.n_pieces >= 2 and r.n_merged == 1]
    assert len(singles) > 0
