"""MVT codec tests — encode/decode round-trips mirror VectorTileTest.java
(721 LoC in the reference; command/zigzag semantics VectorTile.java:202-210,
:426-489)."""

import gzip

import numpy as np

from planetiler_spark.kernels import mvt


def test_zigzag_roundtrip():
    for v in (0, 1, -1, 2, -2, 4095, -4096, 2**31 - 1, -(2**31)):
        assert mvt.unzigzag(mvt.zigzag(v)) == v


def test_point_feature_roundtrip():
    layer = mvt.LayerBuilder("pois")
    cmds = mvt.encode_geometry(mvt.GEOM_POINT, [np.array([[100, 200]])])
    layer.add_feature(7, mvt.GEOM_POINT, cmds, {"name": "x", "rank": 3, "score": 1.5, "on": True})
    blob = mvt.encode_tile([layer])
    assert blob[:2] == b"\x1f\x8b"  # gzipped
    decoded = mvt.decode_tile(blob)
    assert list(decoded) == ["pois"]
    (feat,) = decoded["pois"]
    assert feat["id"] == 7
    assert feat["type"] == mvt.GEOM_POINT
    np.testing.assert_array_equal(feat["geometry"][0], [[100, 200]])
    assert feat["attrs"] == {"name": "x", "rank": 3, "score": 1.5, "on": True}


def test_multipoint_and_negative_coords():
    layer = mvt.LayerBuilder("l")
    pts = np.array([[-10, -20], [4100, 0], [0, 4100]])
    layer.add_feature(None, mvt.GEOM_POINT, mvt.encode_geometry(mvt.GEOM_POINT, [pts]))
    decoded = mvt.decode_tile(mvt.encode_tile([layer], compress=False))
    got = np.vstack([g for g in decoded["l"][0]["geometry"]])
    np.testing.assert_array_equal(got, pts)


def test_linestring_roundtrip():
    layer = mvt.LayerBuilder("roads")
    parts = [np.array([[0, 0], [100, 100], [200, 100]]),
             np.array([[500, 500], [600, 700]])]
    layer.add_feature(1, mvt.GEOM_LINESTRING,
                      mvt.encode_geometry(mvt.GEOM_LINESTRING, parts))
    decoded = mvt.decode_tile(mvt.encode_tile([layer]))
    got = decoded["roads"][0]["geometry"]
    assert len(got) == 2
    np.testing.assert_array_equal(got[0], parts[0])
    np.testing.assert_array_equal(got[1], parts[1])


def test_polygon_close_path():
    ring = np.array([[0, 0], [4096, 0], [4096, 4096], [0, 4096], [0, 0]])
    layer = mvt.LayerBuilder("water")
    layer.add_feature(None, mvt.GEOM_POLYGON,
                      mvt.encode_geometry(mvt.GEOM_POLYGON, [ring]))
    decoded = mvt.decode_tile(mvt.encode_tile([layer]))
    got = decoded["water"][0]["geometry"][0]
    np.testing.assert_array_equal(got, ring)  # CLOSE_PATH restores closing vertex


def test_fill_constant(  ):
    # VectorTile.encodeFill:481-489 — rect covering tile+buffer
    cmds = mvt.encode_fill(4.0)
    layer = mvt.LayerBuilder("x")
    layer.add_feature(None, mvt.GEOM_POLYGON, cmds)
    got = mvt.decode_tile(mvt.encode_tile([layer]))["x"][0]["geometry"][0]
    b = round(4.0 * 4096 / 256)
    assert got.min() == -b and got.max() == 4096 + b


def test_deterministic_bytes():
    def build():
        layer = mvt.LayerBuilder("a")
        layer.add_feature(1, mvt.GEOM_POINT,
                          mvt.encode_geometry(mvt.GEOM_POINT, [np.array([[1, 2]])]),
                          {"k": "v"})
        return mvt.encode_tile([layer])
    assert build() == build()  # gzip mtime pinned -> content-hash dedup works


def test_point_stream_matches_builder():
    """The vectorized PointTileStream must decode identically to the
    LayerBuilder slow path (geometry, attrs, order) for random batches."""
    rng = np.random.default_rng(7)
    n = 500
    tids = np.sort(rng.integers(100, 140, n))
    ex = rng.integers(-300, 4400, n)
    ey = rng.integers(-300, 4400, n)
    sk = rng.integers(-3000, 3000, n)
    ids = np.array([f"img{i:012d}" for i in range(n)], dtype=object)
    caps = np.array([f"caption for img{i} at tile 14/{i % 50}/{i % 31}" for i in range(n)], dtype=object)

    starts = np.nonzero(np.diff(tids, prepend=tids[0] - 1))[0]
    ends = np.append(starts[1:], n)
    stream = mvt.PointTileStream(ex, ey, sk, ids, caps)
    fast = list(stream.encode_tiles(starts, ends))

    for g, (s, e) in enumerate(zip(starts, ends)):
        layer = mvt.LayerBuilder("images")
        for i in range(s, e):
            layer.add_feature(None, mvt.GEOM_POINT,
                              [9, mvt.zigzag(int(ex[i])), mvt.zigzag(int(ey[i]))],
                              {"image_id": ids[i], "caption": caps[i],
                               "sort_key": int(sk[i])})
        slow = mvt.decode_tile(mvt.encode_tile([layer]))
        got = mvt.decode_tile(fast[g])
        assert list(got) == ["images"]
        assert len(got["images"]) == len(slow["images"])
        for fa, fb in zip(got["images"], slow["images"]):
            assert fa["attrs"] == fb["attrs"]
            np.testing.assert_array_equal(fa["geometry"][0], fb["geometry"][0])


def test_point_stream_long_strings():
    """Value-stream headers for strings whose length varint is >1 byte: the
    outer Value-message length must be 1 + len(varint(len)) + len, not the
    1-byte-varint shortcut (silent protobuf corruption for >=128-byte attrs)."""
    n = 4
    tids = np.array([5, 5, 6, 6])
    ex = np.array([10, 20, 30, 40])
    ey = np.array([1, 2, 3, 4])
    sk = np.array([0, 1, 2, 3])
    ids = np.array(["i" * 127, "j" * 128, "k" * 300, "m" * 16500], dtype=object)
    caps = np.array(["c" * 128, "d" * 5, "e" * 129, "f" * 200], dtype=object)

    starts = np.array([0, 2])
    ends = np.array([2, 4])
    fast = list(mvt.PointTileStream(ex, ey, sk, ids, caps).encode_tiles(starts, ends))
    for g, (s, e) in enumerate(zip(starts, ends)):
        layer = mvt.LayerBuilder("images")
        for i in range(s, e):
            layer.add_feature(None, mvt.GEOM_POINT,
                              [9, mvt.zigzag(int(ex[i])), mvt.zigzag(int(ey[i]))],
                              {"image_id": ids[i], "caption": caps[i],
                               "sort_key": int(sk[i])})
        slow = mvt.decode_tile(mvt.encode_tile([layer]))
        got = mvt.decode_tile(fast[g])
        assert len(got["images"]) == len(slow["images"])
        for fa, fb in zip(got["images"], slow["images"]):
            assert fa["attrs"] == fb["attrs"]


def test_varint_matrix():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2097151, 2097152,
                     268435455, 268435456, (1 << 34)])
    B, L = mvt.varint_matrix(vals)
    for i, v in enumerate(vals):
        assert bytes(B[i, :L[i]]) == mvt._varint(int(v)), v


def test_key_value_interning():
    layer = mvt.LayerBuilder("l")
    for i in range(3):
        layer.add_feature(i, mvt.GEOM_POINT,
                          mvt.encode_geometry(mvt.GEOM_POINT, [np.array([[i, i]])]),
                          {"k": "same", "n": i})
    raw = gzip.decompress(mvt.encode_tile([layer]))
    # "same" appears once (interned); keys k/n appear once each
    assert raw.count(b"same") == 1
    assert raw.count(b"\x1a\x01k") == 1  # key "k" interned once


def test_polygon_stream_matches_slow_path():
    """polygon_geom_stream must be byte-identical to
    _packed(4, encode_geometry(GEOM_POLYGON, parts)) per feature."""
    rng = np.random.default_rng(3)
    feats = []
    # shell-only, shell+hole, multi-ring, big deltas, negative coords
    feats.append([np.array([[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]])])
    feats.append([np.array([[0, 0], [4096, 0], [4096, 4096], [0, 4096], [0, 0]]),
                  np.array([[1000, 1000], [1000, 2000], [2000, 2000], [1000, 1000]])])
    feats.append([np.array([[-64, -64], [4160, -64], [4160, 4160], [-64, 4160], [-64, -64]])])
    # degenerate ring (dropped) between real rings
    feats.append([np.array([[5, 5], [50, 5], [50, 50], [5, 5]]),
                  np.array([[7, 7], [8, 8], [7, 7]]),  # <3 after close-drop
                  np.array([[10, 10], [30, 10], [30, 30], [10, 30], [10, 10]])])
    # all-degenerate feature -> empty slice
    feats.append([np.array([[1, 1], [2, 2], [1, 1]])])
    # open (unclosed) ring
    feats.append([np.array([[0, 0], [10, 0], [10, 10], [0, 10]])])
    # random polygons incl. >127-vertex ring (multi-byte LINE_TO count)
    for _ in range(20):
        n = int(rng.integers(3, 12))
        ring = rng.integers(-64, 4160, size=(n, 2))
        ring = np.vstack([ring, ring[:1]])
        feats.append([ring])
    big = rng.integers(0, 4096, size=(200, 2))
    feats.append([np.vstack([big, big[:1]])])

    rings, rf = [], []
    for f, parts in enumerate(feats):
        for r in parts:
            rings.append(r)
            rf.append(f)
    off, flat = mvt.polygon_geom_stream(rings, rf, len(feats))
    for f, parts in enumerate(feats):
        cmds = mvt.encode_geometry(mvt.GEOM_POLYGON, parts)
        want = mvt._packed(4, cmds) if cmds else b""
        assert flat[off[f]:off[f + 1]] == want, f"feature {f}"


def test_point_stream_sliced_arrow_input():
    """Regression (ADVICE r2): a SLICED pyarrow array (nonzero offset) fed to
    PointTileStream must not corrupt the value stream."""
    import pyarrow as pa

    ids_full = pa.array(["xx", "abc", "d", "longer-string", "ee"])
    caps_full = pa.array(["c1", "c2", "c3", "c4", "c5"])
    sl = slice(2, 5)
    ids = ids_full.slice(2, 3)
    caps = caps_full.slice(2, 3)
    assert ids.offset != 0
    ex = np.array([1, 2, 3]); ey = np.array([4, 5, 6]); sk = np.array([0, 1, 2])
    fast = list(mvt.PointTileStream(ex, ey, sk, ids, caps)
                .encode_tiles(np.array([0]), np.array([3])))
    dec = mvt.decode_tile(fast[0])
    got = [f["attrs"]["image_id"] for f in dec["images"]]
    assert got == ["d", "longer-string", "ee"]
