"""Format util + 3857<->4326 transforms vs FormatTest.java vectors."""

import numpy as np

from planetiler_spark.functions import format as fmt


def test_numeric_vectors():
    # FormatTest.java:21-31
    cases = [(1.5, "1"), (999, "999"), (1000, "1k"), (9999, "9.9k"),
             (10001, "10k"), (99999, "99k"), (999999, "999k"),
             (9999999, "9.9M"), (-9999999, "-"), (5.5e12, "5.5T"), (0, "0"),
             (0.4, "<1")]
    for v, want in cases:
        assert fmt.numeric(v) == want, (v, want)


def test_storage_and_pad():
    assert fmt.storage(5.5e9) == "5.5G"
    assert fmt.storage(1000) == "1k"
    assert fmt.numeric(999, pad=True) == " 999"
    assert fmt.pad_left("a", 3) == "  a"
    assert fmt.pad_right("ab", 3) == "ab "


def test_percent_decimal():
    assert fmt.percent(0) == "0%"
    assert fmt.percent(1) == "100%"
    assert fmt.percent(0.11111) == "11%"
    assert fmt.decimal(0.11) == "0.1"


def test_mercator_roundtrip():
    lon = np.array([-180.0, -77.03, 0.0, 7.42, 179.9])
    lat = np.array([-85.0, 38.91, 0.0, 43.73, 84.9])
    x, y = fmt.lonlat_to_mercator(lon, lat)
    lon2, lat2 = fmt.mercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # known anchor: 3857 extent edge
    x0, _ = fmt.lonlat_to_mercator(180.0, 0.0)
    assert abs(x0 - 20037508.342789244) < 1e-6
