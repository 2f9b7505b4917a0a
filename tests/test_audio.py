"""Audio modality: from-scratch RIFF/WAVE PCM codec (kernels/wav.py) and the
Spark-side synthesis / feature-extraction plumbing (operators/audio_ops.py).

The gate row `audio_features` additionally proves the codec round-trip
against a DuckDB oracle that replays the sample arithmetic without the
container; these tests cover the codec surface the oracle can't reach
(stereo, 8-bit, foreign chunks, spectral features on known tones)."""

import struct

import numpy as np
import pytest

from planetiler_spark.kernels import wav as wk
from planetiler_spark.operators import audio_ops as ao


def test_roundtrip_mono_bit_exact():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=1001, dtype=np.int16)  # odd n -> pad byte
    buf = wk.encode_wav(s, 22050)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    assert len(buf) % 2 == 0          # word-aligned container
    rate, out = wk.decode_wav(buf)
    assert rate == 22050
    np.testing.assert_array_equal(out, s)


def test_roundtrip_stereo():
    rng = np.random.default_rng(8)
    s = rng.integers(-32768, 32768, size=(300, 2), dtype=np.int16)
    rate, out = wk.decode_wav(wk.encode_wav(s, 48000))
    assert rate == 48000 and out.shape == (300, 2)
    np.testing.assert_array_equal(out, s)


def test_decode_skips_foreign_chunks():
    """A LIST/INFO chunk (odd size, so padded) between fmt and data must be
    walked over — the RIFF rule real-world encoders rely on."""
    s = np.arange(-50, 50, dtype=np.int16)
    buf = wk.encode_wav(s, 8000)
    fmt_at = buf.index(b"fmt ")
    fmt_end = fmt_at + 8 + struct.unpack("<I", buf[fmt_at + 4:fmt_at + 8])[0]
    foreign = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded odd chunk
    patched = buf[:fmt_end] + foreign + buf[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, out = wk.decode_wav(patched)
    assert rate == 8000
    np.testing.assert_array_equal(out, s)


def test_decode_8bit_unsigned():
    raw = np.array([0, 128, 255], dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 3) + raw.tobytes() + b"\x00")
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, out = wk.decode_wav(buf)
    np.testing.assert_array_equal(out, np.array([-32768, 0, 32512], dtype=np.int16))


def test_decode_rejects_garbage_and_non_pcm():
    with pytest.raises(ValueError):
        wk.decode_wav(b"OggS" + b"\x00" * 40)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(NotImplementedError):
        wk.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_pcm_features_exact():
    s = np.array([-32768, 0, 5, -5, 7], dtype=np.int16)
    f = wk.pcm_features(s)
    assert f["n_samples"] == 5
    assert f["peak"] == 32768           # int64 math: |−32768| doesn't overflow
    assert f["sum_sq"] == 32768 ** 2 + 25 + 25 + 49
    assert f["sum_abs"] == 32768 + 5 + 5 + 7
    # sign runs: [-][+ +][-][+] -> 3 changes (0 counts as positive)
    assert f["zero_crossings"] == 3


def test_spectral_features_pure_tone():
    rate, f0 = 8000, 1000.0
    t = np.arange(4096) / rate
    s = np.rint(20000 * np.sin(2 * np.pi * f0 * t)).astype(np.int16)
    sp = wk.spectral_features(s, rate)
    assert abs(sp["centroid_hz"] - f0) < 15.0
    assert sp["bandwidth_hz"] < 120.0
    assert abs(sp["rolloff_hz"] - f0) < 15.0
    quiet = wk.spectral_features(np.full(512, 100, dtype=np.int16), rate)
    assert quiet["centroid_hz"] == 0.0  # DC excluded


def test_synth_matches_oracle_arithmetic():
    s, rate = ao.synth_samples(9)
    assert len(s) == 512 + (9 % 7) * 128 and rate == 8000
    i = np.arange(len(s), dtype=np.int64)
    np.testing.assert_array_equal(
        s.astype(np.int64), (9 * 1103515245 + i * 12345 + 6789) % 65536 - 32768)


def test_spark_audio_pipeline(spark):
    ids = spark.range(1, 33).withColumnRenamed("id", "audio_id")
    audio = ao.audio_df(spark, ids)
    rows = audio.limit(3).collect()
    for r in rows:                       # real .wav bytes on the column
        assert bytes(r.wav[:4]) == b"RIFF"
    feats = {r.audio_id: r for r in
             ao.extract_audio_features(audio, spectral=True).collect()}
    assert len(feats) == 32
    for aid in (1, 17, 32):
        s, rate = ao.synth_samples(aid)
        want = wk.pcm_features(s)
        got = feats[aid]
        assert got.n_samples == want["n_samples"]
        assert got.peak == want["peak"]
        assert got.sum_sq == want["sum_sq"]
        assert got.zero_crossings == want["zero_crossings"]
        assert got.rate == rate
        sp = wk.spectral_features(s, rate)
        assert got.centroid_hz == pytest.approx(sp["centroid_hz"])
