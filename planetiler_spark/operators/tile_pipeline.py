"""The flagship job: Planetiler's 3-phase pipeline over the images table,
re-expressed Spark-first (ARCHITECTURE.md:5-11 of the reference).

  phase 1 RENDER  — mapInPandas: phash -> geo-anchor -> slice into per-tile
                    fragments across zooms (FeatureRenderer.java:62-111,
                    TiledGeometry.slicePoint:245-260), emit rows keyed by the
                    64-bit feature key (FeatureGroup.encodeKey:176-196)
  phase 2 SORT    — the shuffle IS the external merge sort
                    (ExternalMergeSort.java:168 -> repartitionByRange(key))
  phase 3 EMIT    — groupBy(tile_id).applyInPandas: label-grid limit, MVT
                    encode + gzip (VectorTile.java, TileArchiveWriter.java),
                    content-hash for order-free tile dedup

Raster graft axis: at max zoom each image's bytes are decoded ONCE in the
render stage, cropped to the tiles it overlaps, and shipped as per-tile PNG
patches (ships only needed pixels — the 100TB-friendly choice); the tile
reduce pastes patches into a 256x256 canvas per tile. Per-row invariant
(BASELINE.json input_hint): decoded patch pixels vs the deterministic source
are exact for png and PSNR>=40dB for the lossy codec; caption equality rides
along. `verify_patches` checks both distributed.

Skew (north_rule): dense city tiles are thinned by a SALTED two-stage
label-grid top-K (`label_grid_thin`) before the tile reduce, so no single
pandas group explodes; shuffle partitions are explicit everywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..kernels import image as ik
from ..kernels import mvt
from ..kernels import tile_math as tm
from ..sources import images as src
from . import render as R

MAX_ZOOM = 14
FEATURES_SCHEMA = ("key long, tile_id long, zoom int, ex int, ey int, "
                   "image_id string, caption string, sort_key int")
PATCH_SCHEMA = ("tile_id long, image_id string, px0 int, py0 int, "
                "pw int, ph int, patch binary, caption string, fmt string")
TILE_SCHEMA = "tile_id long, zoom int, x int, y int, n_features long, tile_bytes binary, content_hash string"
RASTER_SCHEMA = "tile_id long, zoom int, x int, y int, n_images long, raster binary"
VERIFY_SCHEMA = ("image_id string, tile_id long, psnr double, pixels_ok boolean, "
                 "caption_ok boolean")


# ---------------------------------------------------------------------------
# phase 1: render
# ---------------------------------------------------------------------------

def render_features(images: DataFrame, min_zoom: int = 0,
                    max_zoom: int = MAX_ZOOM) -> DataFrame:
    """images -> per-(feature, zoom, tile) rows in the sorted-KV model."""
    zooms = range(min_zoom, max_zoom + 1)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ph = pdf["phash"].to_numpy()
            wx, wy = src.anchor_world(ph)
            sort_key = (ph % 1000).astype(np.int64)  # deterministic draw order
            out = R.render_points_pdf(pdf, wx, wy, zooms, layer=0, sort_key=sort_key)
            idx = out.pop("feature_id").to_numpy()
            out["image_id"] = pdf["image_id"].to_numpy()[idx]
            out["caption"] = pdf["caption"].to_numpy()[idx]
            out["sort_key"] = sort_key[idx]
            yield out

    cols = [c for c in images.columns if c != "bytes"]  # column pruning: no pixels in the vector path
    return images.select(*cols).mapInPandas(gen, FEATURES_SCHEMA)


def render_patches(images: DataFrame, zoom: int = MAX_ZOOM) -> DataFrame:
    """Raster render: decode each image once, crop per overlapping tile,
    re-encode the crop as PNG. One output row per (image, tile)."""
    n = 1 << zoom

    def gen(batches):
        for pdf in batches:
            rows = {k: [] for k in ("tile_id", "image_id", "px0", "py0", "pw",
                                    "ph", "patch", "caption", "fmt")}
            for r in pdf.itertuples(index=False):
                ph = np.int64(r.phash)
                wx, wy = src.anchor_world(np.array([ph]))
                # global pixel coords of the image's top-left at this zoom
                gx0 = int(round(float(wx[0]) * 256 * n)) - r.w // 2
                gy0 = int(round(float(wy[0]) * 256 * n)) - r.h // 2
                pix = ik.decode_image(bytes(r.bytes), r.fmt)
                for ty in range(max(gy0 // 256, 0), min((gy0 + r.h - 1) // 256, n - 1) + 1):
                    for tx in range((gx0 // 256), ((gx0 + r.w - 1) // 256) + 1):
                        px0 = gx0 - tx * 256   # image origin in tile pixels
                        py0 = gy0 - ty * 256
                        cx0, cy0 = max(0, -px0), max(0, -py0)
                        cx1, cy1 = min(r.w, 256 - px0), min(r.h, 256 - py0)
                        if cx1 <= cx0 or cy1 <= cy0:
                            continue
                        crop = pix[cy0:cy1, cx0:cx1]
                        rows["tile_id"].append(tm.tile_encode(np.mod(tx, n), ty, zoom))
                        rows["image_id"].append(r.image_id)
                        rows["px0"].append(px0 + cx0)
                        rows["py0"].append(py0 + cy0)
                        rows["pw"].append(cx1 - cx0)
                        rows["ph"].append(cy1 - cy0)
                        rows["patch"].append(ik.encode_png(np.ascontiguousarray(crop)))
                        rows["caption"].append(r.caption)
                        rows["fmt"].append(r.fmt)
            yield pd.DataFrame(rows)

    return images.mapInPandas(gen, PATCH_SCHEMA)


# ---------------------------------------------------------------------------
# skew: salted two-stage label-grid thinning (north_rule)
# ---------------------------------------------------------------------------

def label_grid_thin(feats: DataFrame, limit: int = 64, grid_px: int = 32,
                    salt_buckets: int = 8) -> DataFrame:
    """Keep the first `limit` features per (tile, label-grid cell) in sortKey
    order (FeatureGroup.TileFeatures.add:616-637). Two-stage with salting:
    stage 1 ranks within (tile, cell, salt) and keeps `limit` per salt — a
    partial top-K that caps any single window partition even on a city tile
    with 10^6 features; stage 2 ranks the survivors exactly. Deterministic:
    full tie-breakers (sort_key, image_id) at both stages."""
    cell = grid_px * mvt.EXTENT // 256
    gx = (F.col("ex") / cell).cast("long")
    gy = (F.col("ey") / cell).cast("long")
    salt = F.pmod(F.xxhash64("image_id"), F.lit(salt_buckets))
    stage1 = (feats
              .withColumn("gx", gx).withColumn("gy", gy)
              .withColumn("salt", salt)
              .withColumn("rn1", F.row_number().over(
                  W.partitionBy("tile_id", "gx", "gy", "salt")
                  .orderBy("sort_key", "image_id")))
              .filter(F.col("rn1") <= limit))
    stage2 = (stage1
              .withColumn("rn", F.row_number().over(
                  W.partitionBy("tile_id", "gx", "gy")
                  .orderBy("sort_key", "image_id")))
              .filter(F.col("rn") <= limit))
    return stage2.drop("gx", "gy", "salt", "rn1", "rn")


# ---------------------------------------------------------------------------
# phase 3: tile reduce
# ---------------------------------------------------------------------------

def _grouped_by_tile(df: DataFrame, partitions: int | None, order_cols: list[str],
                     reduce_fn):
    """The reference's phase-3 shape, Spark-first: hash-repartition by tile so
    each tile's rows land in one partition, sort within partitions by tile
    (the shuffle+sort IS ExternalMergeSort.java:168), then stream Arrow
    batches grouping CONSECUTIVE same-tile runs — exactly
    FeatureGroup.groupIntoTiles:339-378 — with carry-over across batch
    boundaries. Orders of magnitude less per-group overhead than
    groupBy().applyInPandas at millions of small tiles."""
    p = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    shuffled = (df.repartition(int(p), "tile_id")
                .sortWithinPartitions("tile_id", *order_cols))

    def stream(batches):
        held: pd.DataFrame | None = None
        for pdf in batches:
            if held is not None and len(held):
                pdf = pd.concat([held, pdf], ignore_index=True)
                held = None
            if len(pdf) == 0:
                continue
            tids = pdf["tile_id"].to_numpy()
            # hold back the trailing tile: it may continue in the next batch
            last_start = int(np.searchsorted(tids, tids[-1], side="left"))
            held = pdf.iloc[last_start:]
            body = pdf.iloc[:last_start]
            if len(body):
                yield from reduce_fn(body)
        if held is not None and len(held):
            yield from reduce_fn(held)

    return shuffled, stream


def encode_vector_tiles(feats: DataFrame, partitions: int | None = None) -> DataFrame:
    """Sorted consecutive-tile grouping -> one MVT blob per tile."""
    import hashlib

    def reduce_tiles(pdf: pd.DataFrame):
        tids = pdf["tile_id"].to_numpy()
        starts = np.nonzero(np.diff(tids, prepend=tids[0] - 1))[0]
        ends = np.append(starts[1:], len(tids))
        ex_all = pdf["ex"].to_numpy()
        ey_all = pdf["ey"].to_numpy()
        sk_all = pdf["sort_key"].to_numpy()
        ids_all = pdf["image_id"].to_numpy()
        caps_all = pdf["caption"].to_numpy()
        xs, ys, zs = tm.tile_decode(tids[starts])
        out = {k: [] for k in ("tile_id", "zoom", "x", "y", "n_features",
                               "tile_bytes", "content_hash")}
        for g, (s, e) in enumerate(zip(starts, ends)):
            layer = mvt.LayerBuilder("images")
            add = layer.add_feature
            for i in range(s, e):
                cmds = [9, mvt.zigzag(int(ex_all[i])), mvt.zigzag(int(ey_all[i]))]
                add(None, mvt.GEOM_POINT, cmds,
                    {"image_id": ids_all[i], "caption": caps_all[i],
                     "sort_key": int(sk_all[i])})
            blob = mvt.encode_tile([layer])
            out["tile_id"].append(int(tids[s]))
            out["zoom"].append(int(zs[g]))
            out["x"].append(int(xs[g]))
            out["y"].append(int(ys[g]))
            out["n_features"].append(e - s)
            out["tile_bytes"].append(blob)
            out["content_hash"].append(hashlib.sha256(blob).hexdigest()[:16])
        yield pd.DataFrame(out)

    shuffled, stream = _grouped_by_tile(feats, partitions,
                                        ["key", "image_id"], reduce_tiles)
    return shuffled.mapInPandas(stream, TILE_SCHEMA)


def encode_raster_tiles(patches: DataFrame, partitions: int | None = None) -> DataFrame:
    """Paste per-image patches into a 256x256 canvas per tile (deterministic
    z-order: image_id asc, later wins) and PNG-encode — the raster<->vector
    graft operator (sorted consecutive-tile grouping, see _grouped_by_tile)."""

    def reduce_tiles(pdf: pd.DataFrame):
        tids = pdf["tile_id"].to_numpy()
        starts = np.nonzero(np.diff(tids, prepend=tids[0] - 1))[0]
        ends = np.append(starts[1:], len(tids))
        xs, ys, zs = tm.tile_decode(tids[starts])
        out = {k: [] for k in ("tile_id", "zoom", "x", "y", "n_images", "raster")}
        px0a, py0a = pdf["px0"].to_numpy(), pdf["py0"].to_numpy()
        pwa, pha = pdf["pw"].to_numpy(), pdf["ph"].to_numpy()
        patches_a = pdf["patch"].to_numpy()
        for g, (s, e) in enumerate(zip(starts, ends)):
            canvas = np.zeros((256, 256, 3), dtype=np.uint8)
            for i in range(s, e):
                patch = ik.decode_png(bytes(patches_a[i]))
                canvas[py0a[i]:py0a[i] + pha[i], px0a[i]:px0a[i] + pwa[i]] = patch
            out["tile_id"].append(int(tids[s]))
            out["zoom"].append(int(zs[g]))
            out["x"].append(int(xs[g]))
            out["y"].append(int(ys[g]))
            out["n_images"].append(e - s)
            out["raster"].append(ik.encode_png(canvas))
        yield pd.DataFrame(out)

    shuffled, stream = _grouped_by_tile(patches, partitions,
                                        ["image_id"], reduce_tiles)
    return shuffled.mapInPandas(stream, RASTER_SCHEMA)


def verify_patches(patches: DataFrame) -> DataFrame:
    """Per-row invariant (BASELINE.json input_hint): decoded patch pixels match
    the deterministic source exactly (png) / PSNR>=40dB (lossy), and the
    caption embeds the correct z14 anchor tile. Distributed verify job —
    the analog of the reference's `verify` CLI (mbtiles/Verify.java:111)."""

    def check(batches):
        for pdf in batches:
            out = {k: [] for k in ("image_id", "tile_id", "psnr", "pixels_ok", "caption_ok")}
            for r in pdf.itertuples(index=False):
                i = int(r.image_id[3:])
                got = ik.decode_png(bytes(r.patch))
                n = 1 << MAX_ZOOM
                ph = src.phash_of(np.array([i]))
                wx, wy = src.anchor_world(ph)
                gx0 = int(round(float(wx[0]) * 256 * n))
                gy0 = int(round(float(wy[0]) * 256 * n))
                w = h = src.BIG_SIZE if i % 10 == 9 else src.DEFAULT_SIZE
                full = src._pixels(i, w, h)
                x0, y0, z0 = tm.tile_decode(np.int64(r.tile_id))
                worldpx = 256 * n  # x wraps at the antimeridian (mod world pixels)
                cx0 = (int(r.px0) + int(x0) * 256 - (gx0 - w // 2)) % worldpx
                cy0 = int(r.py0) + int(y0) * 256 - (gy0 - h // 2)
                want = full[cy0:cy0 + int(r.ph), cx0:cx0 + int(r.pw)]
                if r.fmt == "jpeg":
                    want = ik.decode_fake_jpeg(ik.encode_fake_jpeg(want))
                p = ik.psnr(got, want) if want.shape == got.shape else 0.0
                tx, ty = tm.tile_of_world(wx, wy, MAX_ZOOM)
                cap_ok = r.caption == f"caption for img{i} at tile 14/{int(tx[0])}/{int(ty[0])}"
                out["image_id"].append(r.image_id)
                out["tile_id"].append(int(r.tile_id))
                out["psnr"].append(min(p, 1e9))
                out["pixels_ok"].append(p >= 40.0)
                out["caption_ok"].append(bool(cap_ok))
            yield pd.DataFrame(out)

    return patches.mapInPandas(check, VERIFY_SCHEMA)


# ---------------------------------------------------------------------------
# the full job
# ---------------------------------------------------------------------------

def tileset(spark: SparkSession, images: DataFrame, min_zoom: int = 0,
            max_zoom: int = MAX_ZOOM, shuffle_partitions: int | None = None,
            thin_limit: int | None = 64, ordered: bool = True) -> DataFrame:
    """images -> vector tiles table, zoom-major tile order (phase 1+2+3).
    thin_limit=None skips label-grid density thinning (and its two window
    shuffles) for profiles that keep every feature."""
    feats = render_features(images, min_zoom, max_zoom)
    if thin_limit is not None:
        feats = label_grid_thin(feats, limit=thin_limit)
    tiles = encode_vector_tiles(feats, partitions=shuffle_partitions)
    if ordered:
        # zoom-major spatially-clustered archive order (TileOrder TMS); tiny
        # output table, cheap range partition + in-partition sort
        tiles = tiles.repartitionByRange(16, "tile_id").sortWithinPartitions("tile_id")
    return tiles


def raster_tileset(spark: SparkSession, images: DataFrame,
                   zoom: int = MAX_ZOOM) -> DataFrame:
    return encode_raster_tiles(render_patches(images, zoom))
