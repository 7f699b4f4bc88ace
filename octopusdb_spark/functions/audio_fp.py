"""Acoustic fingerprinting — the AUDIO leg of the near-dup trifecta
(text MinHash, image dHash/pHash, and this): re-encoded or re-mastered
copies of the same recording must pair while different recordings must
not. The fingerprint is a sequence of per-frame SPECTRAL-GRADIENT codes
in exact integer arithmetic (the Chromaprint idea — gradient bits over
a coarse spectrum — with the 8-point integer DCT standing in for the
FFT filterbank, so a DuckDB oracle replicates every bit):

- each 64-sample frame is reduced to 8 sub-block SUMS (no division —
  sums, not means, so negative PCM needs no floor-rounding rules);
- the shared integer DCT-II basis (``image_hash.DCT8``) maps the 8
  sums to 8 coarse spectral coefficients;
- the frame's 7-bit code records which neighboring coefficients
  dominate (t[i] > t[i+1]) — AMPLITUDE-INVARIANT by construction: a
  re-mastered copy scaled by any positive integer scales every
  coefficient equally and flips no comparison (the audio analog of the
  image hashes' brightness invariance, and exactly why gradient bits
  beat raw energies for matching).

Matching is the n-gram inverted-index shape shared with
``dedup_ngram_jaccard``: 4-frame shingles (28-bit ints), documents meet
only through equal shingle keys — never an all-pairs comparison — and
the containment verdict is integer cross-multiplied (5*shared >=
4*min(n_a, n_b)), so no float thresholds cross the engine boundary.

The reference engine (zach030/OctopusDB) has no media layer; this rides
the driver mandate's training-data-pipeline surface (audio crawl dedup:
podcasts/music re-uploads differ by container and gain, not content).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from octopusdb_spark.functions.image_hash import _DCT8_NP

FRAME = 64  # samples per fingerprint frame
SUB = 8  # sub-blocks per frame (the coarse spectrum's resolution)
SHINGLE = 4  # frames per matching shingle


def pcm_pattern(a1: int, a2: int, c: int, m: int, n_frames: int,
                scale: int = 1) -> list:
    """The gate rows' deterministic 16-bit PCM test signal:
    s(t) = (((a1*t + a2*((t*t) % m) + c) % 2048) - 1024) * scale,
    n_frames*64 samples. The per-recording modulus ``m`` makes signals
    structurally distinct across docs (a shared m left 60-doc corpora
    with wide accidental fingerprint overlap); |s| <= 1024*scale, so
    scale <= 31 never clips int16. One closed form for Spark rows,
    tests, and the DuckDB oracles."""
    t = np.arange(n_frames * FRAME, dtype=np.int64)
    s = ((a1 * t + a2 * ((t * t) % m) + c) % 2048 - 1024) * scale
    return [int(v) for v in s]


def frame_codes(samples: np.ndarray) -> list:
    """Per-frame 7-bit spectral-gradient codes for an int array of PCM
    samples; the trailing partial frame is dropped (a fingerprint is a
    sequence over COMPLETE frames, matching the oracle's t < 64*nf
    bound)."""
    s = np.asarray(samples, dtype=np.int64)
    nf = len(s) // FRAME
    if nf == 0:
        return []
    sums = s[: nf * FRAME].reshape(nf, SUB, FRAME // SUB).sum(axis=2)
    t = sums @ _DCT8_NP.T  # row f = DCT8 @ sums[f]
    bits = (t[:, : SUB - 1] > t[:, 1:]).astype(np.int64)
    weights = 1 << np.arange(SUB - 1, dtype=np.int64)
    return [int(v) for v in (bits * weights).sum(axis=1)]


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("codes", T.ArrayType(T.IntegerType()), True),
    ]
)


def audio_fingerprints(media_df: DataFrame) -> DataFrame:
    """Partition-parallel fingerprinting via mapInPandas — stateless
    Arrow batches over (media_id, payload) WAV rows, one output row per
    recording carrying its full code sequence (bounded: one int per 64
    samples). Malformed payloads record decoded=False (loud fallback,
    never a batch failure)."""
    from octopusdb_spark.functions.multimodal import _wav_chunks

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict = {f.name: [] for f in AUDIO_FP_SCHEMA.fields}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    (channels, _rate, bits), data = _wav_chunks(bytes(p))
                    if channels != 1 or bits != 16:
                        raise ValueError("fingerprint lane is mono 16-bit")
                    s = np.frombuffer(
                        data[: len(data) // 2 * 2], dtype="<i2"
                    ).astype(np.int64)
                    codes = frame_codes(s)
                except (ValueError, struct.error, IndexError):
                    codes = None
                out["media_id"].append(int(mid))
                out["decoded"].append(codes is not None)
                out["n_frames"].append(len(codes) if codes is not None else None)
                out["codes"].append(codes)
            yield pd.DataFrame(
                {
                    k: pd.array(v, dtype="Int64") if k == "n_frames" else v
                    for k, v in out.items()
                }
            )

    return media_df.mapInPandas(batches, AUDIO_FP_SCHEMA)
