"""Acoustic fingerprinting (r15): frame-code exactness, the amplitude
invariance lemma, shingle separation, and the Spark mapInPandas lane."""

from __future__ import annotations

import numpy as np
import pytest

from octopusdb_spark.functions.audio_fp import (
    FRAME,
    SHINGLE,
    SUB,
    audio_fingerprints,
    frame_codes,
    pcm_pattern,
)
from octopusdb_spark.functions.image_hash import _DCT8_NP
from octopusdb_spark.functions.multimodal import encode_wav

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


def test_frame_codes_match_naive():
    s = np.array(pcm_pattern(5, 3, 40, 19, 4), dtype=np.int64)
    codes = frame_codes(s)
    assert len(codes) == 4
    for f in range(4):
        sums = [
            int(s[f * FRAME + j * 8 : f * FRAME + (j + 1) * 8].sum())
            for j in range(SUB)
        ]
        t = [
            sum(_DCT8_NP[u][k] * sums[k] for k in range(SUB))
            for u in range(SUB)
        ]
        code = sum((1 << i) for i in range(SUB - 1) if t[i] > t[i + 1])
        assert codes[f] == code
    # trailing partial frames are dropped
    assert len(frame_codes(s[: 3 * FRAME + 17])) == 3
    assert frame_codes(np.array([], dtype=np.int64)) == []


if HAVE_HYPOTHESIS:

    @settings(deadline=None, max_examples=80)
    @given(
        st.integers(min_value=2, max_value=38),
        st.integers(min_value=1, max_value=5),
        st.integers(min_value=0, max_value=210),
        st.integers(min_value=17, max_value=39),
        st.integers(min_value=2, max_value=6),
        st.integers(min_value=2, max_value=31),
    )
    def test_amplitude_invariance_property(a1, a2, c, m, nf, scale):
        """Any positive integer gain leaves every frame code unchanged
        — the gradient bits compare linearly scaled coefficients."""
        base = np.array(pcm_pattern(a1, a2, c, m, nf, 1), dtype=np.int64)
        loud = np.array(pcm_pattern(a1, a2, c, m, nf, scale), dtype=np.int64)
        assert frame_codes(base) == frame_codes(loud)


def test_shingle_separation_and_spark_lane(spark):
    """Twins share every shingle; a structurally different signal does
    not reach the containment threshold; the Spark lane decodes WAVs
    and falls back loudly on corrupted magic."""
    def shingles(codes):
        return {
            (((codes[i] * 128 + codes[i + 1]) * 128 + codes[i + 2]) * 128
             + codes[i + 3])
            for i in range(len(codes) - SHINGLE + 1)
        }

    a = frame_codes(np.array(pcm_pattern(7, 2, 50, 19, 14, 1)))
    twin = frame_codes(np.array(pcm_pattern(7, 2, 50, 19, 14, 3)))
    other = frame_codes(np.array(pcm_pattern(11, 4, 90, 29, 14, 1)))
    assert a == twin
    sa, so = shingles(a), shingles(other)
    assert 5 * len(sa & so) < 4 * min(len(sa), len(so))

    wav = encode_wav(pcm_pattern(7, 2, 50, 19, 14, 1))
    rows = [
        (1, wav),
        (2, encode_wav(pcm_pattern(7, 2, 50, 19, 14, 3))),
        (3, b"XX" + wav[2:]),  # corrupted magic: loud fallback
        (4, encode_wav([0] * 32)),  # sub-frame audio: empty fingerprint
    ]
    out = {
        r["media_id"]: r
        for r in audio_fingerprints(
            spark.createDataFrame(rows, "media_id long, payload binary")
        ).collect()
    }
    assert out[1]["decoded"] and out[1]["codes"] == out[2]["codes"]
    assert out[1]["n_frames"] == 14
    assert not out[3]["decoded"] and out[3]["codes"] is None
    assert out[4]["decoded"] and out[4]["codes"] == []
