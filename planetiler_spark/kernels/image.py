"""Image payload kernels: PNG codec, deterministic lossy codec (JPEG stand-in), PSNR.

The graft axis treats images as opaque `binary` columns with typed metadata
(image_id, bytes, w, h, fmt) — see BASELINE.json input_hint. Per-tile raster
slicing (operators/raster.py) decodes these inside Arrow-batched UDFs.

- PNG: minimal but real RGB8 encoder/decoder implemented on zlib + numpy
  (IHDR/IDAT/IEND, filter type 0). Lossless round-trip, deterministic bytes.
- JPEG: REAL baseline JFIF codec, implemented from the public T.81 spec in
  kernels/jpeg.py (rounds 1-2 used a documented quantize+zlib stand-in; the
  `FJPG` magic is still decoded for those legacy payloads). Default quality
  98 measures >=43dB on the worst-case synthetic sawtooth fixtures.
- PSNR: the per-row invariant from BASELINE.json (decoded-pixel allclose,
  PSNR>=40dB for lossy, exact for lossless).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FJPG_MAGIC = b"FJPG"
FAKE_JPEG_QUANT = 6  # PSNR ~= 10*log10(255^2/(q^2/12)) ~= 43.4 dB >= 40 dB


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """RGB8 (h, w, 3) uint8 -> PNG bytes (filter 0, zlib, deterministic).
    level 6 for STORED artifacts; intermediate pipeline artifacts (per-tile
    patch crops, pasted canvases) use level 1 — 2.4x faster for +~1KB on a
    mostly-empty canvas, the same CPU-vs-bytes call Spark's own lz4 shuffle
    compression makes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # bitdepth 8, colortype 2 (RGB)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _png_defilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the five PNG scanline filters (spec §6). Row layout: 1 filter-type
    byte + `stride` data bytes. Filters 0/1/2 vectorize (none / per-column
    cumsum / running row sum); Average and Paeth carry a left-dependency, so
    those (rare in our own output, common in libpng's) fall back to a per-byte
    loop on just the rows that use them."""
    rows = raw.reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    if (ftypes > 4).any():
        raise ValueError(f"bad PNG filter type {int(ftypes.max())}")
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = rows[y, 1:].astype(np.int64)
        f = int(ftypes[y])
        if f == 0:
            line = cur
        elif f == 1:      # Sub: + left
            line = cur.reshape(-1, bpp).cumsum(axis=0).reshape(stride) & 0xFF
        elif f == 2:      # Up: + above
            line = (cur + prev) & 0xFF
        elif f == 3:      # Average: + floor((left + up) / 2)
            line = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        else:             # Paeth predictor
            line = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (cur[i] + pred) & 0xFF
        out[y] = line
        prev = line
    return out.astype(np.uint8)


def _unpack_bits(row: np.ndarray, depth: int, w: int) -> np.ndarray:
    """Depth 1/2/4 sample unpacking (palette / grayscale), MSB first."""
    per = 8 // depth
    shifts = np.arange(per - 1, -1, -1) * depth
    vals = (row[:, None].astype(np.int64) >> shifts[None, :]) & ((1 << depth) - 1)
    return vals.reshape(-1)[:w]


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB. Real-world coverage: all five
    scanline filters; color types 0 (gray), 2 (RGB), 3 (palette, depths
    1/2/4/8), 4 (gray+alpha), 6 (RGBA); alpha composites over white
    deterministically. 16-bit and Adam7 interlace raise (rare; honest)."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = depth = ctype = None
    idat = []
    plte = None
    while off < len(buf):
        (ln,) = struct.unpack_from(">I", buf, off)
        tag = buf[off + 4:off + 8]
        payload = buf[off + 8:off + 8 + ln]
        off += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if interlace != 0:
                raise ValueError("Adam7-interlaced PNG unsupported")
            if depth == 16:
                raise ValueError("16-bit PNG unsupported")
            if ctype not in (0, 2, 3, 4, 6):
                raise ValueError(f"unsupported PNG color type {ctype}")
            if depth != 8 and not (ctype in (0, 3) and depth in (1, 2, 4)):
                raise ValueError(f"unsupported PNG depth {depth} for ctype {ctype}")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = (w * channels * depth + 7) // 8
    bpp = max(1, channels * depth // 8)
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    data = _png_defilter(raw, h, stride, bpp)
    if depth < 8:
        samples = np.stack([_unpack_bits(data[y], depth, w) for y in range(h)])
        if ctype == 3:
            px = plte[samples]
        else:  # low-depth grayscale: scale to full 8-bit range
            g = (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)
            px = np.repeat(g[:, :, None], 3, axis=2)
        return px.astype(np.uint8)
    data = data.reshape(h, w, channels)
    if ctype == 2:
        return data.copy()
    if ctype == 3:
        return plte[data[:, :, 0]].astype(np.uint8)
    if ctype == 0:
        return np.repeat(data, 3, axis=2).copy()
    # alpha (4: gray+alpha, 6: RGBA): composite over white, round-half-up
    color = data[:, :, :-1].astype(np.int64)
    if ctype == 4:
        color = np.repeat(color, 3, axis=2)
    a = data[:, :, -1:].astype(np.int64)
    return ((color * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)


def encode_fake_jpeg(pixels: np.ndarray) -> bytes:
    """Legacy round-1/2 lossy stand-in (quantize+zlib), superseded by the real
    baseline JPEG in kernels/jpeg.py; kept so old FJPG payloads still decode."""
    h, w, c = pixels.shape
    q = (pixels.astype(np.int32) + FAKE_JPEG_QUANT // 2) // FAKE_JPEG_QUANT
    q = np.clip(q * FAKE_JPEG_QUANT, 0, 255).astype(np.uint8)
    return _FJPG_MAGIC + struct.pack("<HH", w, h) + zlib.compress(q.tobytes(), 6)


def decode_fake_jpeg(buf: bytes) -> np.ndarray:
    if buf[:4] != _FJPG_MAGIC:
        raise ValueError("not a fake-jpeg payload")
    w, h = struct.unpack_from("<HH", buf, 4)
    return np.frombuffer(zlib.decompress(buf[8:]), dtype=np.uint8).reshape(h, w, 3).copy()


# Restart interval for engine-EMITTED jpegs: tiny intervals cost ~0.6% size
# (2 marker bytes + byte-align per interval) and make every segment an
# independent bitstream, which is what lets decode_images' lockstep batch
# decoder run ~3x faster than the serial symbol walk. Foreign jpegs without
# DRI still decode everywhere (one long stream each).
JPEG_RESTART_INTERVAL = 2


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        from . import jpeg as _jpeg
        return _jpeg.encode_jpeg(pixels,
                                 restart_interval=JPEG_RESTART_INTERVAL)
    raise NotImplementedError(f"image format {fmt!r} not supported (png/jpeg only)")


def decode_image(buf: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(buf)
    if fmt == "jpeg":
        if bytes(buf[:4]) == _FJPG_MAGIC:  # legacy round-1/2 stand-in payloads
            return decode_fake_jpeg(buf)
        from . import jpeg as _jpeg
        return _jpeg.decode_jpeg(buf)
    raise NotImplementedError(f"image format {fmt!r} not supported (png/jpeg only)")


def decode_images(bufs: list[bytes], fmts: list[str]) -> list[np.ndarray]:
    """Decode a batch of images, routing jpegs through the LOCKSTEP batch
    entropy decoder (kernels/jpeg.decode_jpeg_batch — one numpy iteration
    decodes one symbol in every live restart segment at once). Pixel output
    is identical to per-image decode_image; if the batch decoder rejects the
    group, each member falls back to the serial path so one malformed file
    cannot fail its neighbors."""
    from . import jpeg as _jpeg

    out: list = [None] * len(bufs)
    # lockstep wins only when streams are short: route DRI-carrying jpegs
    # (this engine's own output) to the batch decoder; a DRI-less foreign
    # jpeg is ONE long stream and decodes faster through the serial walk
    jpeg_idx = [i for i, f in enumerate(fmts)
                if f == "jpeg" and bytes(bufs[i][:4]) != _FJPG_MAGIC
                and b"\xff\xdd" in bytes(bufs[i][:4096])]
    # chunked: the lockstep decoder materializes ~16 int64 bytes per entropy
    # byte (flat windows) plus every decoded image of the call at once, so a
    # whole 65536-row Arrow batch in one call would spike task memory; a few
    # hundred images already saturate the lockstep's parallelism
    CHUNK = 256
    if len(jpeg_idx) > 1:
        for c0 in range(0, len(jpeg_idx), CHUNK):
            grp = jpeg_idx[c0:c0 + CHUNK]
            try:
                for i, d in zip(grp, _jpeg.decode_jpeg_batch(
                        [bytes(bufs[i]) for i in grp])):
                    out[i] = d
            except _jpeg._JpegError:
                pass  # isolate: decode this chunk serially below
    for i in range(len(bufs)):
        if out[i] is None:
            out[i] = decode_image(bytes(bufs[i]), fmts[i])
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images; inf if equal."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
