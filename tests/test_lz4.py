"""From-scratch LZ4 block codec (kernels/lz4.py) — the decode side mirrors the
reference's PbfDecoder.java:80-95 contract (raw block format, known raw_size,
full input consumed)."""

import os
import random

import pytest

from planetiler_spark.kernels.lz4 import Lz4Error, compress_block, decompress_block

MONACO = "/root/reference/planetiler-core/src/test/resources/monaco-latest.osm.pbf"


def roundtrip(data: bytes) -> bytes:
    z = compress_block(data)
    out = decompress_block(z, len(data))
    assert out == data
    return z


def test_roundtrip_shapes():
    rng = random.Random(42)
    cases = [
        b"", b"a", b"abcd", b"x" * 5, b"x" * 15, b"x" * 300,
        bytes(range(256)) * 4,
        b"the quick brown fox jumps over the lazy dog " * 100,
        rng.randbytes(10_000),                      # incompressible
        rng.randbytes(64) * 200,                    # long-range repeats
        b"\x00" * 100_000,                          # extreme RLE (offset 1)
        rng.randbytes(50) + b"ab" * 40_000 + rng.randbytes(50),  # offset 2
    ]
    for c in cases:
        roundtrip(c)


def test_compression_actually_compresses():
    z = roundtrip(b"repetitive content block " * 1000)
    assert len(z) < 1000  # 25 KB of repeats must shrink drastically


def test_spec_hand_vectors():
    # token (4 literals | match len 8-4), literals, offset 4, last literals
    seq = bytes([(4 << 4) | 4]) + b"abcd" + bytes([4, 0]) + bytes([5 << 4]) + b"XYZWV"
    assert decompress_block(seq, 17) == b"abcdabcdabcdXYZWV"
    # extended literal length: 15 + 255 + 0 = 270
    lit = bytes(range(256)) + bytes(14)
    assert decompress_block(bytes([0xF0, 255, 0]) + lit, 270) == lit
    # overlapping match, offset 1 (classic RLE): 'a' then 19 copies
    seq = bytes([(1 << 4) | 15]) + b"a" + bytes([1, 0, 0]) + bytes([0])
    assert decompress_block(seq, 20) == b"a" * 20
    # canonical empty block
    assert decompress_block(b"\x00", 0) == b""


def test_malformed_blocks_raise():
    with pytest.raises(Lz4Error):
        decompress_block(b"", 5)                       # missing token
    with pytest.raises(Lz4Error):
        decompress_block(bytes([0x40]) + b"ab", 4)     # truncated literals
    with pytest.raises(Lz4Error):
        decompress_block(bytes([0x04]) + bytes([9, 0]), 10)  # offset > output
    with pytest.raises(Lz4Error):
        decompress_block(bytes([0x10]) + b"a", 5)      # wrong raw_size
    with pytest.raises(Lz4Error):
        z = compress_block(b"hello world")
        decompress_block(z, 12)                        # size mismatch


def test_fuzz_roundtrip():
    rng = random.Random(7)
    for trial in range(60):
        n = rng.randrange(0, 4000)
        # mix of random and self-similar content
        chunk = rng.randbytes(rng.randrange(1, 64))
        data = (chunk * (n // max(1, len(chunk)) + 1))[:n]
        if rng.random() < 0.5:
            data = bytes(rng.randrange(256) if rng.random() < 0.3 else b
                         for b in data)
        roundtrip(data)


@pytest.mark.skipif(not os.path.exists(MONACO), reason="reference checkout absent")
def test_real_pbf_blob_recompressed_as_lz4():
    """Take a real OSMData blob from the reference's monaco fixture, recompress
    its payload with our LZ4, and decode the same entities through the normal
    reader path (zlib blob vs lz4 blob must be byte-identical upstream)."""
    from planetiler_spark.sources import osm

    blobs = [b for b in osm.scan_blobs(MONACO) if b[3] == "OSMData"]
    bid, off, size, _ = blobs[0]
    with open(MONACO, "rb") as f:
        f.seek(off)
        raw = f.read(size)
    payload = osm._inflate_blob(raw)

    def varint(n):
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            out.append(b | 0x80 if n else b)
            if not n:
                return bytes(out)

    lz = compress_block(payload)
    lz4_blob = (bytes([2 << 3]) + varint(len(payload))
                + bytes([(6 << 3) | 2]) + varint(len(lz)) + lz)
    assert osm._inflate_blob(lz4_blob) == payload
