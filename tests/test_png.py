"""Real-world PNG decode coverage (kernels/image.py): all five scanline
filters and the common color types, verified against an independent forward
implementation of the spec's filter/packing math built right here."""

import struct
import zlib

import numpy as np
import pytest

from planetiler_spark.kernels import image as ik


def chunk(tag, payload):
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def build_png(scanlines: bytes, w, h, depth, ctype, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + extra
            + chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b""))


def forward_filter(data: np.ndarray, ftype: int, prev: np.ndarray, bpp: int):
    """Spec §6 filters in the ENCODE direction (independent of the decoder)."""
    cur = data.astype(int)
    out = np.empty_like(cur)
    for i in range(len(cur)):
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (cur[i] - pred) % 256
    return out.astype(np.uint8)


def encode_with_filters(px: np.ndarray, ftypes):
    h, w, c = px.shape
    rows = px.reshape(h, w * c)
    lines = bytearray()
    prev = np.zeros(w * c, dtype=int)
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        lines.append(f)
        lines += forward_filter(rows[y], f, prev, c).tobytes()
        prev = rows[y].astype(int)
    return build_png(bytes(lines), w, h, 8, 2 if c == 3 else {1: 0, 2: 4, 4: 6}[c])


@pytest.mark.parametrize("ftypes", [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)])
def test_all_filters_roundtrip(ftypes):
    rng = np.random.default_rng(sum(ftypes) + 1)
    px = rng.integers(0, 256, size=(13, 11, 3), dtype=np.uint8)
    assert np.array_equal(ik.decode_png(encode_with_filters(px, ftypes)), px)


def test_grayscale_and_alpha_types():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, size=(6, 7, 1), dtype=np.uint8)
    got = ik.decode_png(encode_with_filters(g, (0, 2)))
    assert np.array_equal(got, np.repeat(g, 3, axis=2))
    # RGBA composites over white
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    got = ik.decode_png(encode_with_filters(rgba, (1, 4)))
    a = rgba[:, :, 3:].astype(int)
    want = (rgba[:, :, :3].astype(int) * a + 255 * (255 - a) + 127) // 255
    assert np.array_equal(got, want.astype(np.uint8))
    # gray+alpha
    ga = rng.integers(0, 256, size=(5, 4, 2), dtype=np.uint8)
    got = ik.decode_png(encode_with_filters(ga, (3,)))
    ga_a = ga[:, :, 1:].astype(int)
    want = (np.repeat(ga[:, :, :1], 3, 2).astype(int) * ga_a
            + 255 * (255 - ga_a) + 127) // 255
    assert np.array_equal(got, want.astype(np.uint8))


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_palette_depths(depth):
    rng = np.random.default_rng(depth)
    n = 1 << depth
    plte = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    w, h = 10, 4
    idx = rng.integers(0, n, size=(h, w))
    per = 8 // depth
    lines = bytearray()
    for y in range(h):
        lines.append(0)
        row = idx[y]
        padded = np.zeros(((w + per - 1) // per) * per, dtype=int)
        padded[:w] = row
        packed = np.zeros(len(padded) // per, dtype=int)
        for j in range(per):
            packed |= padded[j::per] << ((per - 1 - j) * depth)
        lines += bytes(packed.tolist())
    png = build_png(bytes(lines), w, h, depth, 3,
                    extra=chunk(b"PLTE", plte.tobytes()))
    assert np.array_equal(ik.decode_png(png), plte[idx])


def test_own_encoder_still_roundtrips():
    from planetiler_spark.sources import images as src
    px = src._pixels(3, 33, 17)
    assert np.array_equal(ik.decode_png(ik.encode_png(px)), px)


def test_honest_rejections():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
           + chunk(b"IDAT", zlib.compress(b"\x00" * 100)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="16-bit"):
        ik.decode_png(bad)
    ihdr_i = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_i)
           + chunk(b"IDAT", zlib.compress(b"\x00" * 100)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlaced"):
        ik.decode_png(bad)
