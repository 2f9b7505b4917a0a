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


def encode_png(pixels: np.ndarray) -> bytes:
    """RGB8 (h, w, 3) uint8 -> PNG bytes (filter 0, zlib level 6, deterministic)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # bitdepth 8, colortype 2 (RGB)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. Supports RGB8 with scanline filter 0
    (everything this engine emits); raises on other filters/color types."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = None
    idat = []
    while off < len(buf):
        (ln,) = struct.unpack_from(">I", buf, off)
        tag = buf[off + 4:off + 8]
        payload = buf[off + 8:off + 8 + ln]
        off += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError(f"unsupported PNG (depth={depth} ctype={ctype})")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8).reshape(h, 1 + w * 3)
    if not (raw[:, 0] == 0).all():
        raise ValueError("unsupported PNG scanline filter (only 0 emitted by this engine)")
    return raw[:, 1:].reshape(h, w, 3).copy()


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


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        from . import jpeg as _jpeg
        return _jpeg.encode_jpeg(pixels)
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


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images; inf if equal."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
