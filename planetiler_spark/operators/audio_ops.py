"""Audio as an opaque binary column: deterministic synthesis, real WAV
encode/decode (kernels/wav.py), and Arrow-batched feature extraction.

Mirrors operators/image_ops.py for the audio modality of the multimodal
brief: the decode step is NOT a stub here — WAV/PCM needs no external
codec lib, so the bytes flowing through the binary column are genuine
.wav files and the features are computed from a real container round-trip.

Scale shape: synthesis and feature extraction are both mapInPandas over
the id / bytes column — embarrassingly parallel, no shuffle, column-pruned
input (only `audio_id` / `wav` reach Python). At 100 TB the bytes live in
parquet binary columns and the same operators apply unchanged.

The sample generator is pure int64 arithmetic so a SQL oracle can replay
it exactly (see plans/queries.audio_features):

    s[i] = (id * 1103515245 + i * 12345 + 6789) % 65536 - 32768
    n(id) = 512 + (id % 7) * 128        rate(id) = 8000 + (id % 3) * 4000
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..kernels import wav as wk

__all__ = ["synth_samples", "audio_batch", "audio_df", "extract_audio_features"]

_FEATURE_SCHEMA = ("audio_id long, n_samples long, peak long, sum_sq long, "
                   "sum_abs long, zero_crossings long")
_FULL_SCHEMA = _FEATURE_SCHEMA + (", rate long, centroid_hz double, "
                                  "bandwidth_hz double, rolloff_hz double")


def synth_samples(audio_id: int) -> tuple[np.ndarray, int]:
    """Deterministic int16 waveform + sample rate for one id (the arithmetic
    the DuckDB oracle replays)."""
    n = 512 + (audio_id % 7) * 128
    i = np.arange(n, dtype=np.int64)
    s = (audio_id * 1103515245 + i * 12345 + 6789) % 65536 - 32768
    return s.astype(np.int16), 8000 + (audio_id % 3) * 4000


def audio_batch(ids: np.ndarray) -> pd.DataFrame:
    """ids -> DataFrame{audio_id, rate, wav(bytes)} with REAL WAV bytes."""
    rows = []
    for aid in np.asarray(ids, dtype=np.int64):
        s, rate = synth_samples(int(aid))
        rows.append((int(aid), rate, wk.encode_wav(s, rate)))
    return pd.DataFrame(rows, columns=["audio_id", "rate", "wav"])


def audio_df(spark, ids_df: DataFrame, id_col: str = "audio_id") -> DataFrame:
    """Distributed synthesis: one WAV blob per id row."""
    def gen(batches):
        for pdf in batches:
            yield audio_batch(pdf[id_col].to_numpy())
    return ids_df.select(ids_df[id_col].cast("long").alias(id_col)) \
                 .mapInPandas(gen, "audio_id long, rate long, wav binary")


def extract_audio_features(audio: DataFrame, spectral: bool = True) -> DataFrame:
    """wav binary column -> per-row features via a real container decode.

    Integer features (n_samples/peak/sum_sq/sum_abs/zero_crossings) are
    exact and oracle-matchable; spectral ones (centroid/bandwidth/rolloff,
    Hz) come from the rFFT kernel and are pytest-verified on known tones.
    """
    cols = ["audio_id", "wav"]

    def feats(batches):
        for pdf in batches:
            out = []
            for aid, buf in zip(pdf["audio_id"], pdf["wav"]):
                rate, s = wk.decode_wav(bytes(buf))
                if s.ndim > 1:          # fold multi-channel to the first channel
                    s = s[:, 0]
                row = {"audio_id": int(aid), **wk.pcm_features(s)}
                if spectral:
                    row["rate"] = rate
                    row.update(wk.spectral_features(s, rate))
                out.append(row)
            yield pd.DataFrame(out)

    schema = _FULL_SCHEMA if spectral else _FEATURE_SCHEMA
    return audio.select(*cols).mapInPandas(feats, schema)
