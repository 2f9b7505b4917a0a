"""Golden-vector tests ported verbatim from the reference unit tests.

Sources: geo/TileCoordTest.java:14-101, util/HilbertTest.java:10-52,
geo/GeoUtilsTest.java:30-55, collection/FeatureGroupTest.java (key layout).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from planetiler_spark.kernels import tile_math as tm

# --- TMS encode golden vectors (TileCoordTest.java:14-53) ---
TMS_VECTORS = [
    (0, 0, 0, 0),
    (0, 1, 1, 1),
    (0, 0, 1, 2),
    (1, 1, 1, 3),
    (1, 0, 1, 4),
    (0, 3, 2, 5),
    (0, 0, 2, 8),
    (3, 0, 2, 20),
    (0, 0, 15, 357946708),
    (0, 32767, 15, 357913941),
    (32767, 0, 15, 1431655764),
    (32767, 32767, 15, 1431622997),
    (0, 0, 16, 1431721300),
    (65535, 65535, 16, 5726557525),
]


@pytest.mark.parametrize("x,y,z,expected", TMS_VECTORS)
def test_tms_encode(x, y, z, expected):
    assert int(tm.tile_encode(x, y, z)) == expected


def test_tms_encode_vectorized_and_decode_roundtrip():
    xs = np.array([v[0] for v in TMS_VECTORS])
    ys = np.array([v[1] for v in TMS_VECTORS])
    zs = np.array([v[2] for v in TMS_VECTORS])
    exp = np.array([v[3] for v in TMS_VECTORS])
    enc = tm.tile_encode(xs, ys, zs)
    np.testing.assert_array_equal(enc, exp)
    dx, dy, dz = tm.tile_decode(enc)
    np.testing.assert_array_equal(dx, xs)
    np.testing.assert_array_equal(dy, ys)
    np.testing.assert_array_equal(dz, zs)


def test_tms_origin_monotonic_in_zoom():
    # TileCoordTest.java:55-65
    encs = [int(tm.tile_encode(0, 0, z)) for z in range(17)]
    assert encs == sorted(encs)
    assert len(set(encs)) == len(encs)


# --- Hilbert tile ids (TileCoordTest.java:67-101) ---
HILBERT_TILE_VECTORS = [
    (0, 0, 0, 0),
    (0, 0, 1, 1),
    (0, 1, 1, 2),
    (1, 1, 1, 3),
    (1, 0, 1, 4),
    (0, 0, 2, 5),
    (1, 0, 2, 6),
    (1, 1, 2, 7),
    (0, 1, 2, 8),
    (3, 0, 2, 20),
    (0, 0, 16, 1431655765),
    (65535, 0, 16, 5726623060),
    (65535, 65535, 16, 4294967295),
]


@pytest.mark.parametrize("x,y,z,expected", HILBERT_TILE_VECTORS)
def test_hilbert_tile_encode(x, y, z, expected):
    assert int(tm.hilbert_encode(x, y, z)) == expected


# --- raw hilbertXYToIndex (HilbertTest.java:10-52) ---
HILBERT_RAW_VECTORS = [
    (15, 32767, 0, 1073741823),
    (15, 32767, 32767, 715827882),
    (16, 1, 0, 1),
    (16, 1, 1, 2),
    (16, 0, 1, 3),
    (16, 65535, 0, 4294967295),
    (16, 65535, 65535, 2863311530),
]


@pytest.mark.parametrize("level,x,y,expected", HILBERT_RAW_VECTORS)
def test_hilbert_raw(level, x, y, expected):
    assert int(tm.hilbert_xy_to_index(level, x, y)) == expected


@pytest.mark.parametrize("level", range(17))
def test_hilbert_roundtrip_each_level(level):
    # HilbertTest.java:13 — hilbertPositionToXY ∘ hilbertXYToIndex == id
    n = min(1 << (2 * level), 4096)
    rng = np.random.default_rng(level)
    pos = np.unique(rng.integers(0, 1 << (2 * level), size=n)) if level else np.array([0])
    x, y = tm.hilbert_position_to_xy(level, pos)
    back = tm.hilbert_xy_to_index(level, x, y)
    np.testing.assert_array_equal(back, pos)


def test_hilbert_decode_roundtrip():
    xs = np.array([v[0] for v in HILBERT_TILE_VECTORS])
    ys = np.array([v[1] for v in HILBERT_TILE_VECTORS])
    zs = np.array([v[2] for v in HILBERT_TILE_VECTORS])
    enc = tm.hilbert_encode(xs, ys, zs)
    dx, dy, dz = tm.hilbert_decode(enc)
    np.testing.assert_array_equal(dx, xs)
    np.testing.assert_array_equal(dy, ys)
    np.testing.assert_array_equal(dz, zs)


# --- world mercator projection (GeoUtilsTest.java:30-55, tolerance 1e-5) ---
WORLD_VECTORS = [
    (0.0, 0.0, 0.5, 0.5),
    (0.0, -180.0, 0.0, 0.5),
    (0.0, 180.0, 1.0, 0.5),
    (45.0, 0.0, 0.5, 0.359725),
    (-45.0, 0.0, 0.5, 0.640275),
    (86.0, -198.0, -0.05, -0.03391287),
    (-86.0, 198.0, 1.05, 1.03391287),
]


@pytest.mark.parametrize("lat,lon,wx,wy", WORLD_VECTORS)
def test_world_projection(lat, lon, wx, wy):
    assert float(tm.get_world_x(lon)) == pytest.approx(wx, abs=1e-5)
    assert float(tm.get_world_y(lat)) == pytest.approx(wy, abs=1e-5)


def test_world_roundtrip():
    lats = np.linspace(-85.0, 85.0, 101)
    lons = np.linspace(-180.0, 180.0, 101)
    np.testing.assert_allclose(tm.get_world_lat(tm.get_world_y(lats)), lats, atol=1e-9)
    np.testing.assert_allclose(tm.get_world_lon(tm.get_world_x(lons)), lons, atol=1e-9)


def test_extreme_clamps():
    # GeoUtils.java:190-195 — beyond MIN/MAX_LAT pins to 1.1 / -0.1
    assert float(tm.get_world_y(90.0)) == -0.1
    assert float(tm.get_world_y(-90.0)) == 1.1


def test_encode_flat_location_roundtrip():
    # GeoUtilsTest.java:44-46, 1e-5 tolerance
    rng = np.random.default_rng(42)
    lons = rng.uniform(-180, 180, 1000)
    lats = rng.uniform(-85, 85, 1000)
    enc = tm.encode_flat_location(lons, lats)
    np.testing.assert_allclose(tm.decode_world_x(enc), tm.get_world_x(lons), atol=1e-5)
    np.testing.assert_allclose(tm.decode_world_y(enc), tm.get_world_y(lats), atol=1e-5)


def test_tile_bounds_z0():
    # TileCoordTest.java:142-152 — z0 tile covers the whole mercator world
    minx, miny, maxx, maxy = tm.tile_bounds_world(0, 0, 0)
    assert float(tm.get_world_lon(minx)) == pytest.approx(-180)
    assert float(tm.get_world_lon(maxx)) == pytest.approx(180)
    assert float(tm.get_world_lat(miny)) == pytest.approx(85.0511287798066, abs=1e-10)
    assert float(tm.get_world_lat(maxy)) == pytest.approx(-85.0511287798066, abs=1e-10)


# --- 64-bit sort key (FeatureGroup.java:56-59, :168-196) ---
@given(
    tile=st.integers(0, (1 << 33) - 1),
    layer=st.integers(0, 255),
    sort_key=st.integers(tm.SORT_KEY_MIN, tm.SORT_KEY_MAX),
    has_group=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_sort_key_roundtrip(tile, layer, sort_key, has_group):
    key = tm.encode_sort_key(tile, layer, sort_key, has_group)
    assert int(tm.extract_tile_from_key(key)) == tile
    assert int(tm.extract_layer_from_key(key)) == layer
    assert int(tm.extract_sort_key_from_key(key)) == sort_key
    assert bool(tm.extract_has_group_from_key(key)) == has_group


def test_sort_key_ordering():
    # keys sort by (tile asc, layer asc, sortKey asc) — the heart of the engine
    ks = [
        tm.encode_sort_key(1, 0, tm.SORT_KEY_MAX, False),
        tm.encode_sort_key(2, 0, tm.SORT_KEY_MIN, False),
        tm.encode_sort_key(2, 0, 0, False),
        tm.encode_sort_key(2, 1, tm.SORT_KEY_MIN, False),
        tm.encode_sort_key(3, 0, tm.SORT_KEY_MIN, True),
    ]
    assert [int(k) for k in ks] == sorted(int(k) for k in ks)


# --- zigzag (VectorTile.java:202-210) ---
def test_zigzag():
    vals = np.array([0, -1, 1, -2, 2, 2147483647, -2147483648], dtype=np.int64)
    enc = tm.zigzag_encode(vals)
    np.testing.assert_array_equal(enc[:5], [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(tm.zigzag_decode(enc), vals.astype(np.int32))


# --- label grid (GeoUtils.labelGridId:422-427) ---
def test_label_grid_id_wraps():
    tiles_at_zoom = 4
    # x wraps modulo world width
    a = tm.label_grid_id(tiles_at_zoom, 0.5, -0.25, 1.0)
    b = tm.label_grid_id(tiles_at_zoom, 0.5, 3.75, 1.0)
    assert int(a) == int(b)
    # distinct cells differ
    assert int(tm.label_grid_id(4, 0.5, 0.1, 0.1)) != int(tm.label_grid_id(4, 0.5, 0.6, 0.1))


def test_haversine_known():
    # quarter meridian ~ 10,007.5 km on the sphere
    d = float(tm.meters_between(0.0, 0.0, 0.0, 90.0))
    assert d == pytest.approx(np.pi / 2 * tm.EARTH_RADIUS_METERS, rel=1e-9)
