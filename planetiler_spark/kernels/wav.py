"""From-scratch RIFF/WAVE PCM codec + waveform feature kernels.

The multimodal brief treats audio as an opaque binary column with typed
metadata; unlike image codecs, WAV needs no entropy coding — the RIFF
container (chunk id + little-endian size, word-aligned) and PCM sample
layout are a tiny public spec, so the codec here is REAL, not a stub:
every byte written is a valid .wav any player accepts, and the decoder
walks unknown chunks (LIST/INFO/fact) the way the spec requires.

Supported: audio format 1 (integer PCM), 16-bit signed and 8-bit unsigned
samples, any channel count (mono returned as 1-D), any sample rate.

Feature kernels:
  - pcm_features: integer-exact aggregates (peak / sum of squares / sum of
    |s| / zero crossings) — the DuckDB-oracle-matchable subset, computed in
    int64 so -32768 can't overflow.
  - spectral_features: rFFT-based centroid / bandwidth / 85% rolloff in Hz
    (float; pytest-verified on analytically-known tones, not oracle-gated).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav", "pcm_features", "spectral_features"]

_FMT_STRUCT = struct.Struct("<HHIIHH")  # audioFormat, ch, rate, byteRate, block, bits


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 samples, shape (n,) mono or (n, ch) interleaved -> WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    block = ch * 2
    fmt = _FMT_STRUCT.pack(1, ch, rate, rate * block, block, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    if len(data) & 1:
        body += b"\x00"  # chunks are word-aligned; pad byte not counted in size
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, samples). 16-bit PCM comes back bit-exact
    as int16; 8-bit unsigned PCM is centered and scaled to int16 ((v-128)<<8).
    Mono is returned 1-D, multi-channel as (n, ch). Unknown chunks (LIST,
    fact, ...) are skipped per the RIFF walk, including odd-size padding."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt = None
    data = None
    pos = 12
    end = min(len(buf), 8 + struct.unpack("<I", buf[4:8])[0])
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        chunk = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt / data chunk")
    audio_fmt, ch, rate, _byte_rate, _block, bits = _FMT_STRUCT.unpack(fmt[:16])
    if audio_fmt != 1:
        raise NotImplementedError(f"non-PCM WAV (format {audio_fmt})")
    if bits == 16:
        s = np.frombuffer(data[:len(data) // (2 * ch) * 2 * ch], dtype="<i2")
    elif bits == 8:
        s = ((np.frombuffer(data[:len(data) // ch * ch], dtype=np.uint8)
              .astype(np.int16) - 128) << 8)
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    s = s.reshape(-1, ch)
    return rate, (s[:, 0] if ch == 1 else s)


def pcm_features(s: np.ndarray) -> dict[str, int]:
    """Integer-exact waveform aggregates over a mono int16 stream. Zero
    crossings count sign changes with 0 grouped with the positives — the
    same `(prev < 0) != (s < 0)` predicate the SQL oracle uses."""
    v = np.asarray(s, dtype=np.int64)
    neg = v < 0
    return {
        "n_samples": int(v.size),
        "peak": int(np.abs(v).max()) if v.size else 0,
        "sum_sq": int((v * v).sum()),
        "sum_abs": int(np.abs(v).sum()),
        "zero_crossings": int(np.count_nonzero(neg[:-1] != neg[1:])),
    }


def spectral_features(s: np.ndarray, rate: int) -> dict[str, float]:
    """rFFT magnitude features of a mono stream: centroid (magnitude-weighted
    mean bin frequency), bandwidth (weighted std around the centroid), and
    the 85% energy rolloff frequency. DC is excluded so silence-with-offset
    reads as 0 Hz."""
    v = np.asarray(s, dtype=np.float64)
    if v.size == 0:
        return {"centroid_hz": 0.0, "bandwidth_hz": 0.0, "rolloff_hz": 0.0}
    mag = np.abs(np.fft.rfft(v))
    mag[0] = 0.0
    freqs = np.fft.rfftfreq(v.size, d=1.0 / rate)
    total = mag.sum()
    if total <= 0:
        return {"centroid_hz": 0.0, "bandwidth_hz": 0.0, "rolloff_hz": 0.0}
    centroid = float((freqs * mag).sum() / total)
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * mag).sum() / total))
    energy = np.cumsum(mag ** 2)
    rolloff = float(freqs[np.searchsorted(energy, 0.85 * energy[-1])])
    return {"centroid_hz": centroid, "bandwidth_hz": bandwidth,
            "rolloff_hz": rolloff}
