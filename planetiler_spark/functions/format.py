"""Human-readable number/storage formatting + web-mercator CRS math —
util/Format.java and the 3857<->4326 transforms the reference's output path
uses (GeoUtils.java mercator constants).

Format semantics (Format.java:124-162): scaled to k/M/G/T (storage) or
k/M/B/T (numeric), one decimal only when the mantissa has one significant
digit ("1.5k" but "15k"), "<1" for positives under 1, "-" for negatives,
optional right-aligned padding to width 4.
"""

from __future__ import annotations

import math

import numpy as np

_STORAGE = [(1_000_000_000_000, "T"), (1_000_000_000, "G"),
            (1_000_000, "M"), (1_000, "k")]
_NUMERIC = [(1_000_000_000_000, "T"), (1_000_000_000, "B"),
            (1_000_000, "M"), (1_000, "k")]


def _format(value: float, pad: bool, suffixes) -> str:
    def padded(s: str) -> str:
        return s.rjust(4) if pad else s

    if value < 0:
        return padded("-")
    if 0 < value < 1:
        return padded("<1")
    v = int(value)
    for cutoff, suffix in suffixes:
        if v >= cutoff:
            truncated = v * 10 // cutoff
            if truncated % 10 == 0 or truncated >= 100:
                return padded(f"{truncated // 10}{suffix}")
            return padded(f"{truncated / 10:.1f}{suffix}")
    return padded(str(v))


def storage(num: float, pad: bool = False) -> str:
    """'123' '1.2k' '240M' — bytes (Format.storage:124)."""
    return _format(num, pad, _STORAGE)


def numeric(num: float, pad: bool = False) -> str:
    """'123' '1.2k' '2.5B' — counts (Format.numeric:139)."""
    return _format(num, pad, _NUMERIC)


def percent(fraction: float) -> str:
    """'42%' (Format.percent)."""
    return f"{round(fraction * 100)}%"


def decimal(value: float) -> str:
    """One decimal point (Format.decimal:170)."""
    return f"{value:.1f}"


def pad_left(s: str, size: int) -> str:
    return str(s).rjust(size)


def pad_right(s: str, size: int) -> str:
    return str(s).ljust(size)


def osm_debug_url(zoom: int, lon: float, lat: float) -> str:
    return f"https://www.openstreetmap.org/#map={zoom}/{lat:.5f}/{lon:.5f}"


# --- EPSG:3857 <-> EPSG:4326 (the one CRS pair the reference's pipeline
# actually converts through; GeoUtils.java world-coordinate constants) -------

EARTH_RADIUS_M = 6378137.0
MAX_LAT = 85.05112877980659  # web-mercator clamp


def lonlat_to_mercator(lon, lat):
    """degrees -> EPSG:3857 meters (vectorized)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    x = np.radians(lon) * EARTH_RADIUS_M
    y = np.log(np.tan(math.pi / 4 + np.radians(lat) / 2)) * EARTH_RADIUS_M
    return x, y


def mercator_to_lonlat(x, y):
    """EPSG:3857 meters -> degrees (vectorized)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / EARTH_RADIUS_M)
    lat = np.degrees(2 * np.arctan(np.exp(y / EARTH_RADIUS_M)) - math.pi / 2)
    return lon, lat
