"""From-scratch LZ4 *block* codec (pure Python, stdlib only).

Closes the round-2 gap "lz4 OSM blobs import-guarded": the reference decodes
`Blob.lz4_data` with net.jpountz's LZ4FastDecompressor given the blob's
declared raw_size (PbfDecoder.java:80-95) — i.e. the raw LZ4 **block** format
(no frame header), destination length known up front. This module implements
that format from the public spec (lz4/doc/lz4_Block_format.md):

  sequence := token | [literal-length bytes] | literals
              | 2-byte LE match offset | [match-length bytes]
  token    := (literal_length:4 | match_length:4); nibble 15 extends with
              0xFF-run + terminator byte; match length is stored minus the
              4-byte minimum ("minmatch")
  last sequence is literals-only (no offset / match-length part)

Decode throughput matters little here (one call per ~8 MB OSM blob inside an
executor task, dwarfed by the entity decode that follows), so the loop favors
clarity + bulk `bytes` slicing: literal runs copy via one slice, and
overlapping matches (offset < length) expand via the repeating-pattern trick
`out[-offset:] * ceil(len/offset)` instead of a per-byte loop.

The compressor exists so the decoder can be round-trip tested without any
external lz4 library in the container (and to write lz4 test PBFs). It is the
classic greedy single-probe hash-chain matcher every LZ4 implementation
descends from: hash each 4-byte window into a 2^14-entry table, accept the
candidate if it's in the 65535-byte offset window and the 4 bytes match,
extend greedily. Spec end-of-block rules honored: the last 5 bytes are always
literals and no match starts within the final 12 bytes ("mflimit").
"""

from __future__ import annotations

__all__ = ["compress_block", "decompress_block", "Lz4Error"]

_MIN_MATCH = 4
_MF_LIMIT = 12   # no match may start closer than this to the end of the block
_LAST_LITERALS = 5
_MAX_OFFSET = 0xFFFF
_HASH_LOG = 14


class Lz4Error(ValueError):
    """Malformed LZ4 block (truncated stream, bad offset, size mismatch)."""


def decompress_block(src: bytes, raw_size: int) -> bytes:
    """Decode one LZ4 block into exactly `raw_size` bytes.

    Mirrors the reference's contract (PbfDecoder.java:85-92): the caller knows
    the decompressed length (Blob.raw_size) and the whole of `src` must be
    consumed — anything else raises Lz4Error.
    """
    out = bytearray()
    n = len(src)
    i = 0
    if raw_size == 0 and n == 0:
        return b""  # also accepts the canonical b"\x00" empty block below
    while True:
        if i >= n:
            raise Lz4Error("truncated block: missing token")
        token = src[i]
        i += 1
        # --- literals -----------------------------------------------------
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if i >= n:
                    raise Lz4Error("truncated literal length")
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if i + lit_len > n:
            raise Lz4Error("truncated literals")
        if lit_len:
            out += src[i:i + lit_len]
            i += lit_len
        if i == n:
            # last sequence: literals only
            break
        # --- match --------------------------------------------------------
        if i + 2 > n:
            raise Lz4Error("truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise Lz4Error(f"bad match offset {offset} at output {len(out)}")
        match_len = (token & 0xF) + _MIN_MATCH
        if (token & 0xF) == 15:
            while True:
                if i >= n:
                    raise Lz4Error("truncated match length")
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        if offset >= match_len:
            start = len(out) - offset
            out += out[start:start + match_len]
        else:
            # overlapping copy == repeat the trailing `offset` bytes
            pattern = bytes(out[-offset:])
            reps = -(-match_len // offset)
            out += (pattern * reps)[:match_len]
    if len(out) != raw_size:
        raise Lz4Error(f"decompressed {len(out)} bytes, expected {raw_size}")
    return bytes(out)


def _hash(v: int) -> int:
    # Fibonacci-style multiplicative hash of the 4-byte little-endian window —
    # the standard LZ4 dispersion constant (2654435761 = 2^32 / golden ratio).
    return ((v * 2654435761) & 0xFFFFFFFF) >> (32 - _HASH_LOG)


def compress_block(data: bytes) -> bytes:
    """Greedy LZ4 block compressor (always produces valid, decodable output;
    ratio comparable to lz4 "fast" mode on typical inputs)."""
    n = len(data)
    out = bytearray()
    if n == 0:
        return b"\x00"  # single empty-literals last sequence
    table: dict[int, int] = {}
    anchor = 0   # start of pending literals
    i = 0
    match_limit = n - _LAST_LITERALS
    mf_limit = n - _MF_LIMIT
    while i <= mf_limit and i + _MIN_MATCH <= n:
        window = int.from_bytes(data[i:i + 4], "little")
        h = _hash(window)
        cand = table.get(h, -1)
        table[h] = i
        if (cand >= 0 and i - cand <= _MAX_OFFSET
                and data[cand:cand + 4] == data[i:i + 4]):
            # extend the match forward (never past the last-5-literals zone)
            m = i + 4
            c = cand + 4
            while m < match_limit and data[m] == data[c]:
                m += 1
                c += 1
            _emit_sequence(out, data, anchor, i, i - cand, m - i)
            i = m
            anchor = m
        else:
            i += 1
    _emit_last_literals(out, data, anchor)
    return bytes(out)


def _emit_sequence(out: bytearray, data: bytes, anchor: int, lit_end: int,
                   offset: int, match_len: int) -> None:
    lit_len = lit_end - anchor
    ml = match_len - _MIN_MATCH
    token = (min(lit_len, 15) << 4) | min(ml, 15)
    out.append(token)
    if lit_len >= 15:
        _emit_len(out, lit_len - 15)
    out += data[anchor:lit_end]
    out.append(offset & 0xFF)
    out.append(offset >> 8)
    if ml >= 15:
        _emit_len(out, ml - 15)


def _emit_last_literals(out: bytearray, data: bytes, anchor: int) -> None:
    lit_len = len(data) - anchor
    out.append(min(lit_len, 15) << 4)
    if lit_len >= 15:
        _emit_len(out, lit_len - 15)
    out += data[anchor:]


def _emit_len(out: bytearray, extra: int) -> None:
    while extra >= 255:
        out.append(255)
        extra -= 255
    out.append(extra)
