"""Arrow-vectorized geo pandas UDFs — the Python slow-path kernels, batched.

Each UDF wraps a numpy kernel from planetiler_spark.kernels so the whole Arrow
batch is processed in one vectorized call (no per-row Python), mirroring the
reference's per-feature worker loop (reader/SourceFeatureProcessor.java:90-100)
at Arrow-batch granularity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..kernels import tile_math as tm


@F.pandas_udf("long")
def hilbert_of_tile(tile_id: pd.Series) -> pd.Series:
    """TMS tile id -> Hilbert tile id (TileCoord.hilbertEncoded:158-161)."""
    x, y, z = tm.tile_decode(tile_id.to_numpy())
    return pd.Series(tm.hilbert_encode(x, y, z))


@F.pandas_udf("long")
def tms_tile_of_lonlat(lon: pd.Series, lat: pd.Series, zoom: pd.Series) -> pd.Series:
    """lon/lat -> TMS tile id at zoom (TileCoord.aroundLngLat:77-82 + encode)."""
    z = zoom.to_numpy()
    x, y = tm.tile_around_lnglat(lon.to_numpy(), lat.to_numpy(), z)
    return pd.Series(tm.tile_encode(x, y, z))


@F.pandas_udf("double")
def haversine_meters(lon1: pd.Series, lat1: pd.Series, lon2: pd.Series, lat2: pd.Series) -> pd.Series:
    """Haversine distance (GeoUtils.metersBetween:636)."""
    return pd.Series(tm.meters_between(lon1.to_numpy(), lat1.to_numpy(),
                                       lon2.to_numpy(), lat2.to_numpy()))


@F.pandas_udf("long")
def encode_feature_key(tile: pd.Series, layer: pd.Series, sort_key: pd.Series,
                       has_group: pd.Series) -> pd.Series:
    """64-bit sort key (FeatureGroup.encodeKey:176-180)."""
    return pd.Series(tm.encode_sort_key(tile.to_numpy(), layer.to_numpy(),
                                        sort_key.to_numpy(), has_group.to_numpy()))


@F.pandas_udf("long")
def hex_cell_of(wx: pd.Series, wy: pd.Series, res: pd.Series) -> pd.Series:
    """Packed hex cell key of each world point at resolution `res`
    (kernels/hex.py aperture-7 rotated hierarchy — the planar H3 analog).
    One fused numpy pass per Arrow batch; the key unpacks JVM-side with
    shiftright/bitwise-and, so ring-expansion joins stay in Catalyst."""
    import numpy as np

    from ..kernels import hex as hx

    rs = int(res.iloc[0]) if len(res) else 3
    keys = hx.hex_cell(wx.to_numpy(dtype=np.float64),
                       wy.to_numpy(dtype=np.float64), rs)
    return pd.Series(keys)


@F.pandas_udf("long")
def s2_cell_of(lon: pd.Series, lat: pd.Series, level: pd.Series) -> pd.Series:
    """S2 cell id of each (lon, lat) at `level` (kernels/s2.py from-scratch
    quad-tree; returned as int64 — reinterpret as uint64 for tokens). The
    discretized spherical join key the north_star names (H3/S2): equi-join /
    ring-expand on these exactly like knn_grid's planar cells."""
    import numpy as np

    from ..kernels import s2

    lv = int(level.iloc[0]) if len(level) else 30
    ids = s2.cell_id(lon.to_numpy(), lat.to_numpy(), lv)
    return pd.Series(ids.astype(np.int64))
