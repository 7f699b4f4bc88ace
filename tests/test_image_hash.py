"""Perceptual image hashing (r15): integer dHash/pHash exactness, the
brightness-invariance lemma, signed-64 packing, banding pigeonhole, and
the Spark mapInPandas lane."""

from __future__ import annotations

import random

import numpy as np
import pytest

from octopusdb_spark.functions.image_hash import (
    DCT8,
    dhash64,
    gray_grid,
    image_hashes,
    phash64,
)
from octopusdb_spark.functions.multimodal import encode_bmp, encode_ppm

W, H = 72, 64


def _pattern(ax, ay, k, c, delta=0):
    xs = np.arange(W, dtype=np.int64)[None, :]
    ys = np.arange(H, dtype=np.int64)[:, None]
    v = (ax * xs + ay * ys + ((xs * ys) % 7) * k + c) % 200 + delta
    return np.repeat(v.astype(np.uint8).reshape(-1), 3).tobytes()


def _ham(a, b):
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_dct_matrix_rows_sum_zero():
    """Every u>0 row of the integer DCT matrix sums to EXACTLY zero —
    the lemma that makes brightness move only the DC coefficient."""
    assert [sum(r) for r in DCT8][1:] == [0] * 7
    assert len(DCT8) == 8 and all(len(r) == 8 for r in DCT8)


def test_gray_grid_matches_naive():
    rgb = _pattern(3, 2, 2, 17)
    g = gray_grid(rgb, W, H, 9, 8)
    a = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64)
    gray = a.reshape(H, W, 3).sum(axis=2) // 3
    for r in range(8):
        for c in range(9):
            block = gray[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8]
            assert g[r, c] == int(block.sum()) // 64
    with pytest.raises(ValueError, match="does not tile"):
        gray_grid(rgb, W, H, 7, 8)
    with pytest.raises(ValueError, match="size mismatch"):
        gray_grid(rgb[:-3], W, H, 9, 8)


def test_brightness_invariance_and_separation():
    """A global +delta (no clamping) leaves dHash identical and moves at
    most the pHash DC bit; different patterns are far apart."""
    a = _pattern(3, 2, 2, 17)
    twin = _pattern(3, 2, 2, 17, delta=40)
    other = _pattern(4, 5, 1, 60)
    assert dhash64(a, W, H) == dhash64(twin, W, H)
    assert _ham(phash64(a, W, H), phash64(twin, W, H)) <= 1
    assert _ham(dhash64(a, W, H), dhash64(other, W, H)) > 10
    assert _ham(phash64(a, W, H), phash64(other, W, H)) > 10


def test_cross_container_identical():
    """PPM and BMP round-trips of the same pixels hash identically."""
    from octopusdb_spark.functions.image_hash import _decode_rgb

    rgb = _pattern(2, 3, 1, 5)
    for enc in (encode_ppm, encode_bmp):
        w, h, back = _decode_rgb(enc(rgb, W, H))
        assert (w, h) == (W, H) and back == rgb
    with pytest.raises(ValueError, match="unsupported image container"):
        _decode_rgb(b"\x00\x01rubbish")


def test_signed64_packing():
    """A hash whose bit 63 is set lands in negative BIGINT space and
    xor-hamming still works — the Spark/DuckDB shared representation."""
    rng = random.Random(7)
    found_negative = False
    for _ in range(64):
        ax, ay = rng.randint(1, 5), rng.randint(1, 5)
        h = dhash64(_pattern(ax, ay, rng.randint(1, 3), rng.randint(0, 96)),
                    W, H)
        assert -(2**63) <= h < 2**63
        found_negative = found_negative or h < 0
    assert found_negative  # bit 63 is genuinely exercised


def test_banding_pigeonhole():
    """hamming <= 3 over 64 bits cannot change all four 16-bit bands —
    the equivalence between the banded plan and the full cross join."""
    rng = random.Random(21)
    for _ in range(500):
        a = rng.getrandbits(64)
        b = a
        for bit in rng.sample(range(64), rng.randint(0, 3)):
            b ^= 1 << bit
        bands_a = [(a >> (16 * j)) & 0xFFFF for j in range(4)]
        bands_b = [(b >> (16 * j)) & 0xFFFF for j in range(4)]
        assert any(x == y for x, y in zip(bands_a, bands_b))


def test_image_hashes_spark_lane(spark):
    rgb = _pattern(1, 2, 3, 4)
    rows = [
        (1, encode_ppm(rgb, W, H)),
        (2, encode_bmp(rgb, W, H)),
        (3, encode_ppm(rgb, W, H)[:50]),  # truncated: loud fallback
    ]
    out = {
        r["media_id"]: r
        for r in image_hashes(
            spark.createDataFrame(rows, "media_id long, payload binary")
        ).collect()
    }
    assert out[1]["decoded"] and out[2]["decoded"] and not out[3]["decoded"]
    assert out[1]["dhash"] == out[2]["dhash"]  # cross-container
    assert out[1]["phash"] == out[2]["phash"]
    assert out[3]["dhash"] is None


def test_video_fingerprints_lane(spark):
    """r15: per-frame dHash over mono Y4M — brightness invariance
    carries frame-by-frame, frame ORDER is part of the fingerprint,
    and malformed streams fall back loudly."""
    from octopusdb_spark.functions.image_hash import (
        dhash64_gray,
        video_fingerprints,
    )
    from octopusdb_spark.functions.multimodal import encode_y4m

    xs = np.arange(W, dtype=np.int64)[None, :]
    ys = np.arange(H, dtype=np.int64)[:, None]

    def frame(i, delta=0):
        v = (3 * xs + 2 * ys + ((xs * ys) % 7) * ((1 + i) % 3 + 1)
             + 17 + 13 * i) % 200 + delta
        return v.astype(np.uint8)

    frames = [frame(i) for i in range(5)]
    clip = encode_y4m([f.tobytes() for f in frames], W, H, colorspace="mono")
    twin = encode_y4m([frame(i, 40).tobytes() for i in range(5)], W, H,
                      colorspace="mono")
    reversed_clip = encode_y4m([f.tobytes() for f in frames[::-1]], W, H,
                               colorspace="mono")
    color = encode_y4m([b"\x00" * (W * H * 3)], W, H, colorspace="444")
    rows = [
        (1, clip), (2, twin), (3, reversed_clip),
        (4, clip[:-5]),  # truncated frame: loud fallback
        (5, color),      # non-mono: loud fallback
    ]
    out = {
        r["media_id"]: r
        for r in video_fingerprints(
            spark.createDataFrame(rows, "media_id long, payload binary")
        ).collect()
    }
    assert out[1]["decoded"] and out[1]["n_frames"] == 5
    assert out[1]["hashes"] == out[2]["hashes"]  # brightness invariance
    assert out[1]["hashes"] == out[3]["hashes"][::-1]  # order matters
    assert out[1]["hashes"][0] == dhash64_gray(frames[0].astype(np.int64))
    assert not out[4]["decoded"] and not out[5]["decoded"]
