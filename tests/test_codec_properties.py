"""Property-based tests (hypothesis) for the pure-Python codec helpers —
no Spark session: these are the functions whose edge cases live in
arithmetic (lacing, LZW, chunk tiling, CRC linearity), exactly where
randomized inputs beat hand-picked vectors. Deadlines are disabled
because the first example compiles the strategy, not because any
example is slow."""

from __future__ import annotations

import struct

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover - baked into this container
    pytest.skip("hypothesis unavailable", allow_module_level=True)


@settings(deadline=None, max_examples=200)
@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=1,
             max_size=400),
    st.integers(min_value=2, max_value=8),
)
def test_gif_lzw_round_trip(indices, min_code):
    """Any index stream under the code width round-trips through the
    GIF-flavor LZW pair (CLEAR/END, KwKwK, width growth included)."""
    from octopusdb_spark.functions.multimodal import (
        _lzw_compress,
        _lzw_decompress,
    )

    data = bytes(i % (1 << min_code) for i in indices)
    packed = _lzw_compress(data, min_code)
    out = _lzw_decompress(packed, min_code, len(data))
    assert bytes(out) == data


@settings(deadline=None, max_examples=200)
@given(st.lists(st.integers(min_value=0, max_value=800), min_size=1,
                max_size=6))
def test_ogg_lacing_round_trip(sizes):
    """Packet sizes survive the 255-run lacing encode/decode, including
    zero-length packets and exact multiples of 255 (the zero
    terminator); oversized tables raise instead of mis-framing."""
    from octopusdb_spark.functions.ogg import _lacing

    try:
        segs = _lacing(sizes)
    except ValueError:
        assert sum(n // 255 + 1 for n in sizes) > 255
        return
    # decode: every value < 255 terminates a packet
    decoded, acc = [], 0
    for v in segs:
        acc += v
        if v < 255:
            decoded.append(acc)
            acc = 0
    assert decoded == sizes and acc == 0


@settings(deadline=None, max_examples=200)
@given(
    st.integers(min_value=1, max_value=500),
    st.lists(
        st.tuples(st.integers(min_value=2, max_value=20),
                  st.integers(min_value=1, max_value=9)),
        min_size=0, max_size=4,
    ),
    st.integers(min_value=1, max_value=9),
)
def test_mp4_chunk_tiling(n_samples, later_runs, first_spc):
    """For any stsc run table, the builder's chunk consumption and the
    parser's _chunk_sample_counts agree exactly: counts tile n_samples,
    only the last chunk may run short, and the parser rejects chunk
    counts that do not match."""
    from octopusdb_spark.functions.mp4 import _chunk_sample_counts

    runs = [(1, first_spc)]
    for gap, spc in later_runs:
        runs.append((runs[-1][0] + gap, spc))
    # builder-side consumption (the build_fmp4/_sample_tables loop)
    counts, remaining, ri, c = [], n_samples, 0, 1
    while remaining > 0:
        while ri + 1 < len(runs) and runs[ri + 1][0] <= c:
            ri += 1
        take = min(runs[ri][1], remaining)
        counts.append(take)
        remaining -= take
        c += 1
    got = _chunk_sample_counts(runs, len(counts), n_samples)
    assert got == counts and sum(got) == n_samples
    # a wrong chunk count must raise, never silently misattribute
    with pytest.raises(ValueError):
        _chunk_sample_counts(runs, len(counts) + 1, n_samples)
    if len(counts) > 1:
        with pytest.raises(ValueError):
            _chunk_sample_counts(runs, len(counts) - 1, n_samples)


@settings(deadline=None, max_examples=100)
@given(st.binary(min_size=0, max_size=300),
       st.binary(min_size=1, max_size=50))
def test_ogg_crc_detects_any_suffix_change(base, tail):
    """The OGG CRC distinguishes a message from any extension of it —
    the property the per-page verification relies on (pages are framed,
    so corruption manifests as changed bytes under a fixed length or a
    shifted frame; both change the checksum)."""
    from octopusdb_spark.functions.ogg import ogg_crc

    assert ogg_crc(base + tail) != ogg_crc(base) or not any(tail)


@settings(deadline=None, max_examples=150)
@given(
    st.lists(st.integers(min_value=-2000, max_value=2000), min_size=8,
             max_size=200),
    st.sampled_from([1, 2]),
)
def test_flac_round_trip_property(samples, channels):
    """Arbitrary PCM round-trips bit-exactly through the FLAC
    encode/decode pair across channel counts and the best-predictor
    search."""
    from octopusdb_spark.functions.flac import decode_flac, encode_flac

    if channels == 2 and len(samples) % 2:
        samples = samples[:-1]
    fl = encode_flac(samples, 8000, block_size=64, channels=channels,
                     stereo_mode="best", predictors=("fixed", "lpc"))
    out = decode_flac(fl)
    # decode_flac reduces to exact integer moments over the interleaved
    # stream — with random data any reconstruction bug moves them
    n = len(samples)
    assert out["n_samples"] == n // channels
    assert out["channels"] == channels
    assert abs(out["mean"] - sum(samples) / n) < 1e-9 * max(
        1.0, abs(sum(samples) / n)
    )
    rms = (sum(v * v for v in samples) / n) ** 0.5
    assert abs(out["rms"] - rms) < 1e-9 * max(1.0, rms)


@settings(deadline=None, max_examples=120)
@given(
    st.integers(min_value=0, max_value=31),
    st.integers(min_value=1, max_value=6),
    st.booleans(),
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=4),
                  st.integers(min_value=4, max_value=80)),
        min_size=1, max_size=4,
    ),
)
def test_opus_toc_round_trip(config, m, stereo, pages):
    """r15: any config/frame-count/stereo combination the builder can
    express round-trips through the TOC walk: frame totals multiply,
    mode counts partition the packets, and the TOC clock matches the
    granule clock exactly when the builder's frame_samples equals the
    config's frame duration."""
    from hypothesis import assume

    from octopusdb_spark.functions.ogg import (
        build_ogg_opus,
        opus_toc_config,
        parse_ogg_opus,
    )

    mode, _bw, dur = opus_toc_config(config)
    assume(m == 1 or m * dur <= 5760)  # the RFC 120 ms packet bound
    p = build_ogg_opus(
        0x55, toc_config=config, stereo_flag=stereo, frames_per_packet=m,
        frame_samples=dur, audio_pages=pages,
    )
    meta = parse_ogg_opus(p)
    n_pkt = sum(n for n, _ in pages)
    assert meta["n_packets"] == n_pkt
    assert meta["toc_frames"] == n_pkt * m
    assert meta["toc_granule_agree"]
    assert meta["toc_duration_ms"] == meta["duration_ms"]
    counts = {"silk": meta["n_silk"], "hybrid": meta["n_hybrid"],
              "celt": meta["n_celt"]}
    assert counts[mode] == n_pkt and sum(counts.values()) == n_pkt
    assert meta["n_stereo"] == (n_pkt if stereo else 0)


@settings(deadline=None, max_examples=80)
@given(
    st.integers(min_value=0, max_value=1),
    st.lists(
        st.integers(min_value=1, max_value=5), min_size=1, max_size=4
    ),
)
def test_fmp4_sidx_tiles_fragments(version, sample_counts):
    """r15: for any fragment layout, the builder's segment index tiles
    the fragment region exactly and the parser reports every reference
    aligned (offsets, spans, and durations all cross-check)."""
    from octopusdb_spark.functions.mp4 import build_fmp4, parse_fmp4_fragments

    frags = [{"n_samples": n} for n in sample_counts]
    p = build_fmp4(fragments=frags, sidx={"version": version})
    out = parse_fmp4_fragments(p)
    assert len(out) == len(frags)
    assert all(fr["sidx_aligned"] is True for fr in out)
    box_start = p.index(b"sidx") - 4
    box_size, = struct.unpack_from(">I", p, box_start)
    assert sum(fr["sidx_ref_size"] for fr in out) \
        == len(p) - (box_start + box_size)


@settings(deadline=None, max_examples=60)
@given(
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=96),
    st.integers(min_value=1, max_value=55),
)
def test_image_hash_brightness_invariance(ax, ay, k, c, delta):
    """r15: for any generator pattern and any non-clamping brightness
    shift, dHash is bit-identical and pHash moves at most the DC bit —
    the integer-DCT zero-row-sum lemma, exercised empirically."""
    import numpy as np

    from octopusdb_spark.functions.image_hash import dhash64, phash64

    W, H = 72, 64
    xs = np.arange(W, dtype=np.int64)[None, :]
    ys = np.arange(H, dtype=np.int64)[:, None]
    v = (ax * xs + ay * ys + ((xs * ys) % 7) * k + c) % 200
    a = np.repeat(v.astype(np.uint8).reshape(-1), 3).tobytes()
    b = np.repeat((v + delta).astype(np.uint8).reshape(-1), 3).tobytes()
    assert dhash64(a, W, H) == dhash64(b, W, H)
    pa, pb = phash64(a, W, H), phash64(b, W, H)
    assert bin((pa ^ pb) & (2**64 - 1)).count("1") <= 1
