"""Per-tile layer size statistics — the reference's `--output-layerstats`
TSV (TileSizeStats.java:59-224) re-expressed Spark-first.

The reference streams every archived tile through a worker pipeline that
decodes the protobuf and emits one TSV row per (tile, layer). Here the
same computation is a shuffle-free `mapInPandas` over the tiles DataFrame
(kernels/mvt.compute_tile_stats carries the byte-exact semantics, validated
against TileSizeStatsTest's golden numbers), so it parallelizes with the
tile encode itself at 100 TB; only the final single-file tsv.gz writer
drains `toLocalIterator()` partition-at-a-time like every other single-file
sink in sources/archives.py.

Column set and header are byte-identical to the reference's CsvSchema
(TileSizeStats.headerRow:221 / OutputRow:391-404, snake_case):
z x y hilbert archived_tile_bytes layer layer_bytes layer_features
layer_geometries layer_attr_bytes layer_attr_keys layer_attr_values.
"""

from __future__ import annotations

import gzip

import pandas as pd
from pyspark.sql import DataFrame

from ..kernels import mvt
from ..kernels import tile_math as tm

__all__ = ["layer_size_stats", "write_layerstats", "HEADER"]

COLUMNS = ("z", "x", "y", "hilbert", "archived_tile_bytes", "layer",
           "layer_bytes", "layer_features", "layer_geometries",
           "layer_attr_bytes", "layer_attr_keys", "layer_attr_values")
HEADER = "\t".join(COLUMNS) + "\n"

_SCHEMA = ("z int, x int, y int, hilbert long, archived_tile_bytes int, "
           "layer string, layer_bytes int, layer_features int, "
           "layer_geometries int, layer_attr_bytes int, "
           "layer_attr_keys int, layer_attr_values int")


def layer_size_stats(tiles_df: DataFrame) -> DataFrame:
    """tiles (zoom, x, y, tile_bytes) -> one OutputRow per (tile, layer)."""
    import numpy as np

    def gen(batches):
        for pdf in batches:
            rows = []
            hil = tm.hilbert_encode(pdf["x"].to_numpy(np.int64),
                                    pdf["y"].to_numpy(np.int64),
                                    pdf["zoom"].to_numpy(np.int64))
            for (z, x, y, blob), h in zip(
                    zip(pdf["zoom"], pdf["x"], pdf["y"], pdf["tile_bytes"]), hil):
                data = bytes(blob)
                for s in mvt.compute_tile_stats(data):
                    rows.append((int(z), int(x), int(y), int(h), len(data),
                                 s["layer"], s["layer_bytes"],
                                 s["layer_features"], s["layer_geometries"],
                                 s["layer_attr_bytes"], s["layer_attr_keys"],
                                 s["layer_attr_values"]))
            yield pd.DataFrame(rows, columns=COLUMNS)

    return (tiles_df.select("zoom", "x", "y", "tile_bytes")
            .mapInPandas(gen, _SCHEMA))


def write_layerstats(stats_df: DataFrame, path: str) -> int:
    """OutputRow DataFrame -> single tsv.gz with the reference's exact
    header, rows in tile order (z, then hilbert — the archive write order)."""
    n = 0
    with gzip.open(path, "wt", compresslevel=6, newline="") as f:
        f.write(HEADER)
        it = stats_df.orderBy("z", "hilbert", "layer").toLocalIterator()
        for r in it:
            f.write("\t".join(str(r[c]) for c in COLUMNS) + "\n")
            n += 1
    return n
