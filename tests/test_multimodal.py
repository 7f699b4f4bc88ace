"""Multimodal plumbing tests: binary schema contract, mapInPandas batch
shape, stubbed codec behavior, frame-sample planning."""

from __future__ import annotations

import pytest

from octopusdb_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
    resize_stub,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, "image", b"\x89PNG\r\n" + b"x" * 500, 64, 64, None),
        (2, "audio", b"RIFF" + b"y" * 1000, None, None, 2500),
        (3, "video", b"\x00\x00\x01\xba" + b"z" * 2000, 320, 240, 1000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_batch_shape(media_df):
    out = extract_features(media_df).collect()
    assert len(out) == 3
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["byte_len"] == 506
    assert by_id[2]["byte_len"] == 1004
    assert all(r["feat_dim"] == 3 for r in out)
    # deterministic stub: same input → same features
    out2 = extract_features(media_df).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_unknown_media_type_raises(spark, media_df):
    bad = spark.createDataFrame([(9, "hologram", b"abc", None, None, None)], MEDIA_SCHEMA)
    with pytest.raises(Exception, match="hologram"):
        extract_features(bad).collect()


def test_resize_stub_metadata_only(media_df):
    out = resize_stub(media_df, 128, 128).collect()
    assert all(r["meta_width"] == 128 and r["meta_height"] == 128 for r in out)
    orig = {r["media_id"]: bytes(r["payload"]) for r in media_df.collect()}
    assert all(bytes(r["payload"]) == orig[r["media_id"]] for r in out)


def test_frame_sample_plan(media_df):
    frames = frame_sample_plan(media_df, every_ms=250).collect()
    # only the video row (id=3, 1000ms) → ts 0,250,500,750,1000
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 250, 500, 750, 1000]
    assert {r["media_id"] for r in frames} == {3}


def test_real_decoders_round_trip(spark):
    """r11: WAV/PPM/BMP are decoded FOR REAL — encode from known samples/
    pixels, parse back through extract_features, and check the recovered
    dimensions and exact integer-accumulated moments. BMP exercises the
    4-byte row-stride padding (width 7 -> 21-byte rows, 24-byte stride)."""
    import math

    from octopusdb_spark.functions.multimodal import (
        encode_bmp,
        encode_png,
        encode_ppm,
        encode_wav,
    )

    samples = [(b - 128) * 256 for b in b"hello pcm world" * 10]
    pixels = bytes(range(256)) * 3  # 768 bytes
    rows = [
        (1, "audio", encode_wav(samples, 8000), None, None, None),
        (2, "image", encode_ppm(pixels[: 16 * 16 * 3], 16, 16), None, None, None),
        (3, "image", encode_bmp(pixels[: 7 * 8 * 3], 7, 8), None, None, None),
        # truncated PNG signature (6 of 8 bytes): must hit the stub path
        (4, "image", b"\x89PNG\r\n" + b"x" * 100, None, None, None),
        (5, "image", encode_png(pixels[: 16 * 12 * 3], 16, 12), None, None, None),
    ]
    out = {r["media_id"]: r for r in extract_features(
        spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}
    wav = out[1]
    assert wav["decoded"] and wav["container"] == "wav"
    assert wav["n_samples"] == len(samples) and wav["sample_rate"] == 8000
    assert abs(wav["feat_mean"] - sum(samples) / len(samples)) < 1e-9
    assert abs(
        wav["feat_rms"] - math.sqrt(sum(s * s for s in samples) / len(samples))
    ) < 1e-6
    ppm = out[2]
    assert ppm["decoded"] and ppm["container"] == "ppm"
    assert (ppm["width"], ppm["height"]) == (16, 16)
    exp = pixels[: 16 * 16 * 3]
    assert abs(ppm["feat_mean"] - sum(exp) / len(exp)) < 1e-9
    bmp = out[3]
    assert bmp["decoded"] and bmp["container"] == "bmp"
    assert (bmp["width"], bmp["height"]) == (7, 8)
    exp = pixels[: 7 * 8 * 3]
    # stride padding correctly stripped: moments match the pixel bytes
    assert abs(bmp["feat_mean"] - sum(exp) / len(exp)) < 1e-9
    assert abs(
        bmp["feat_rms"] - math.sqrt(sum(b * b for b in exp) / len(exp))
    ) < 1e-6
    # unrecognized magic: falls to the documented stub, never crashes
    assert not out[4]["decoded"] and out[4]["container"] is None
    # PNG: REAL entropy-coded decode (zlib inflate + scanline unfilter)
    png = out[5]
    assert png["decoded"] and png["container"] == "png"
    assert (png["width"], png["height"]) == (16, 12)
    exp = pixels[: 16 * 12 * 3]
    assert abs(png["feat_mean"] - sum(exp) / len(exp)) < 1e-9


def test_malformed_containers_fall_back(spark):
    """A recognized-but-corrupt container (bad RIFF tag, truncated PPM,
    non-24bpp BMP) must fall back to stub features, not fail the batch."""
    rows = [
        (1, "audio", b"RIFF" + b"y" * 1000, None, None, None),  # no WAVE tag
        (2, "image", b"P6\n10 10\n255\nxx", None, None, None),  # truncated
        (3, "image", b"BM" + b"\x00" * 100, None, None, None),  # bad header
    ]
    out = extract_features(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    assert len(out) == 3 and all(not r["decoded"] for r in out)


def test_wav_8bit_stereo_decode(spark):
    """8-bit UNSIGNED PCM (centered at 128) and multi-channel interleave
    decode correctly; frames = samples / channels."""
    import math
    import struct

    u8 = bytes((i * 13) % 256 for i in range(200))
    hdr = b"RIFF" + struct.pack("<I", 36 + len(u8)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 32000, 2, 8)
    payload = hdr + b"data" + struct.pack("<I", len(u8)) + u8
    out = extract_features(
        spark.createDataFrame([(1, "audio", payload, None, None, None)], MEDIA_SCHEMA)
    ).collect()[0]
    centered = [v - 128 for v in u8]
    assert out["decoded"] and out["container"] == "wav"
    assert out["sample_rate"] == 16000 and out["n_samples"] == 100
    assert abs(out["feat_mean"] - sum(centered) / len(centered)) < 1e-9
    assert abs(
        out["feat_rms"] - math.sqrt(sum(s * s for s in centered) / len(centered))
    ) < 1e-6


def test_extract_features_runs_as_a_stream(spark, tmp_path):
    """The decode stage is a stateless mapInPandas, so the SAME
    extract_features runs unchanged under Structured Streaming — the
    decode-and-validate-at-ingest pipeline shape. A bounded file stream
    of real containers decodes to the same rows the batch path produces."""
    from octopusdb_spark.functions.multimodal import encode_png, encode_wav

    samples = [(b - 128) * 256 for b in b"stream pcm" * 8]
    pixels = bytes((i * 3) % 256 for i in range(16 * 4 * 3))
    rows = [
        (1, "audio", encode_wav(samples, 8000), None, None, None),
        (2, "image", encode_png(pixels, 16, 4), None, None, None),
        (3, "image", b"\xff\xd8\xff\xe0jpeg-ish" + b"q" * 50, None, None, None),
    ]
    src = str(tmp_path / "media_src")
    spark.createDataFrame(rows, MEDIA_SCHEMA).write.parquet(src)
    batch_rows = sorted(
        map(tuple, extract_features(spark.read.parquet(src)).collect())
    )
    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(src)
    q = (
        extract_features(stream)
        .writeStream.format("memory")
        .queryName("media_feats")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    stream_rows = sorted(
        map(tuple, spark.sql("select * from media_feats").collect())
    )
    assert stream_rows == batch_rows
    by_id = {r[0]: r for r in stream_rows}
    # containers decoded in-stream; the jpeg-ish row hit the stub
    assert by_id[1][6] == "wav" and by_id[2][6] == "png" and by_id[3][6] is None


def test_y4m_round_trip(spark):
    """Y4M video is decoded FOR REAL: whole-stream moments + frame count +
    fps via extract_features, and per-frame moments with exact 40 ms
    timestamps (25 fps) + every-Nth sampling via sample_frame_features."""
    import math

    from octopusdb_spark.functions.multimodal import (
        encode_y4m,
        sample_frame_features,
    )

    frames = [
        bytes(((i * 7 + f * 31) % 256) for i in range(4 * 4 * 3)) for f in range(5)
    ]
    df = spark.createDataFrame(
        [(1, "video", encode_y4m(frames, 4, 4, 25, 1), None, None, None)],
        MEDIA_SCHEMA,
    )
    feat = extract_features(df).collect()[0]
    assert feat["decoded"] and feat["container"] == "y4m"
    assert (feat["width"], feat["height"]) == (4, 4)
    assert feat["n_samples"] == 5 and feat["sample_rate"] == 25
    allb = b"".join(frames)
    assert abs(feat["feat_mean"] - sum(allb) / len(allb)) < 1e-9

    out = sorted(
        sample_frame_features(df, every_n=2).collect(), key=lambda r: r["frame_idx"]
    )
    assert [(r["frame_idx"], r["frame_ts_ms"]) for r in out] == [
        (0, 0), (2, 80), (4, 160),
    ]
    for r in out:
        fb = frames[r["frame_idx"]]
        assert abs(r["frame_mean"] - sum(fb) / len(fb)) < 1e-9
        assert abs(
            r["frame_rms"] - math.sqrt(sum(b * b for b in fb) / len(fb))
        ) < 1e-6


def test_y4m_colorspaces_and_malformed(spark):
    """C420 (half-res chroma planes) and mono frame sizes parse; NTSC
    30000:1001 reports no integral fps; a torn frame or a bad FRAME marker
    falls back to the stub (extract_features) or drops the whole video
    (sample_frame_features) without failing the batch."""
    from octopusdb_spark.functions.multimodal import (
        decode_media,
        encode_y4m,
        sample_frame_features,
    )

    f420 = bytes(range(4 * 4 + 2 * 2 * 2))  # Y 16 + U 4 + V 4
    d = decode_media(encode_y4m([f420], 4, 4, 30, 1, colorspace="420"))
    assert d["container"] == "y4m" and d["n_samples"] == 1 and d["sample_rate"] == 30
    d = decode_media(encode_y4m([bytes(range(12))], 4, 3, 30000, 1001, colorspace="mono"))
    assert d["channels"] == 1 and d["sample_rate"] is None

    good = encode_y4m([bytes(48), bytes(range(48))], 4, 4)
    torn = good[:-10]  # truncated second frame
    bad_marker = good.replace(b"FRAME\n", b"FRAMX\n")
    rows = [
        (1, "video", good, None, None, None),
        (2, "video", torn, None, None, None),
        (3, "video", bad_marker, None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in extract_features(df).collect()}
    assert feats[1]["decoded"]
    assert not feats[2]["decoded"] and not feats[3]["decoded"]
    sampled = sample_frame_features(df).collect()
    assert {r["media_id"] for r in sampled} == {1}
    assert len(sampled) == 2  # every_n=1: both frames of the good video


def test_png_zip_bomb_and_corrupt_deflate_fall_back(spark):
    """A zip-bomb IDAT (KBs inflating far past the IHDR-derived scanline
    size) is rejected by the bounded inflate, and a corrupt DEFLATE stream
    (zlib.error) falls back to the stub — neither fails the batch."""
    import struct
    import zlib

    from octopusdb_spark.functions.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_media,
    )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # 2x2 RGB: 14 raw bytes
    bomb = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
        + _png_chunk(b"IEND", b"")
    )
    corrupt = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", b"not-a-deflate-stream")
        + _png_chunk(b"IEND", b"")
    )
    assert decode_media(bomb) is None
    assert decode_media(corrupt) is None
    rows = [
        (1, "image", bomb, None, None, None),
        (2, "image", corrupt, None, None, None),
    ]
    out = extract_features(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    assert len(out) == 2 and all(not r["decoded"] for r in out)


def test_codec_round_trip_property():
    """Property test (no Spark needed): random pixels/samples round-trip
    through every encoder/decoder pair with exact integer moments, across
    widths that do and don't hit BMP stride padding."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from octopusdb_spark.functions.multimodal import (
        decode_media,
        encode_bmp,
        encode_png,
        encode_ppm,
        encode_wav,
        encode_y4m,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=9),
        h=st.integers(min_value=1, max_value=7),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(w, h, seed):
        import random

        rng = random.Random(seed)
        pixels = bytes(rng.randrange(256) for _ in range(w * h * 3))
        exp_mean = sum(pixels) / len(pixels)
        for enc in (encode_ppm, encode_bmp, encode_png):
            d = decode_media(enc(pixels, w, h))
            assert d is not None and (d["width"], d["height"]) == (w, h), enc
            assert abs(d["mean"] - exp_mean) < 1e-9, enc
        samples = [rng.randrange(-32768, 32768) for _ in range(w * h)]
        d = decode_media(encode_wav(samples, 8000))
        assert d["n_samples"] == len(samples)
        assert abs(d["mean"] - sum(samples) / len(samples)) < 1e-9
        n_frames = 1 + seed % 4
        frames = [
            bytes(rng.randrange(256) for _ in range(w * h * 3))
            for _ in range(n_frames)
        ]
        d = decode_media(encode_y4m(frames, w, h, 25, 1))
        assert (d["width"], d["height"], d["n_samples"]) == (w, h, n_frames)
        allb = b"".join(frames)
        assert abs(d["mean"] - sum(allb) / len(allb)) < 1e-9

    check()


def test_y4m_444alpha_frame_size():
    """C444alpha is a FOUR-plane format (Y,U,V,A full-res) — review fix:
    the 3-plane prefix match must not capture it."""
    from octopusdb_spark.functions.multimodal import decode_media, encode_y4m

    frame = bytes(range(4 * 3 * 4))  # 4x3, 4 planes
    d = decode_media(encode_y4m([frame, frame], 4, 3, colorspace="444alpha"))
    assert d is not None and d["channels"] == 4 and d["n_samples"] == 2
    assert abs(d["mean"] - sum(frame) / len(frame)) < 1e-9


def test_resize_media_real(spark):
    """resize_media resamples FOR REAL: decode -> nearest-neighbor ->
    re-encode in the same container, verified against a NumPy reference
    for PPM/BMP/PNG (down- and up-scale) and per-frame for C444 Y4M;
    RGBA PNG and unknown formats pass through unchanged."""
    import numpy as np

    from octopusdb_spark.functions.multimodal import (
        _bmp_pixels,
        _png_pixels,
        _ppm_pixels,
        _y4m_parse,
        encode_bmp,
        encode_png,
        encode_ppm,
        encode_y4m,
        resize_media,
    )

    rng = np.random.default_rng(11)
    sw, sh = 10, 6
    px = rng.integers(0, 256, sw * sh * 3, dtype=np.uint8).tobytes()

    def ref(dw, dh):
        a = np.frombuffer(px, dtype=np.uint8).reshape(sh, sw, 3)
        ri = (np.arange(dh) * sh) // dh
        ci = (np.arange(dw) * sw) // dw
        return a[ri][:, ci, :].tobytes()

    frames = [
        rng.integers(0, 256, sw * sh * 3, dtype=np.uint8).tobytes()
        for _ in range(2)
    ]
    rows = [
        (1, "image", encode_ppm(px, sw, sh), None, None, None),
        (2, "image", encode_bmp(px, sw, sh), None, None, None),
        (3, "image", encode_png(px, sw, sh), None, None, None),
        (4, "video", encode_y4m(frames, sw, sh, 25, 1), None, None, None),
        (5, "image", b"\xff\xd8\xff\xe0jpeg-ish" + b"q" * 50, None, None, None),
    ]
    out = {
        r["media_id"]: r
        for r in resize_media(
            spark.createDataFrame(rows, MEDIA_SCHEMA), 4, 3
        ).collect()
    }
    assert all(
        (r["meta_width"], r["meta_height"]) == (4, 3) for r in out.values()
    )
    assert _ppm_pixels(bytes(out[1]["payload"])) == (4, 3, ref(4, 3))
    assert _bmp_pixels(bytes(out[2]["payload"])) == (4, 3, ref(4, 3))
    assert _png_pixels(bytes(out[3]["payload"])) == (4, 3, 3, ref(4, 3))
    (w, h, num, den, ch, cs), fr = _y4m_parse(bytes(out[4]["payload"]))
    assert (w, h, num, den, cs) == (4, 3, 25, 1, "444")
    got_frames = list(fr)
    for src, got in zip(frames, got_frames):
        for k in range(3):  # each full-res plane resampled independently
            a = np.frombuffer(src, dtype=np.uint8)[
                k * sw * sh : (k + 1) * sw * sh
            ].reshape(sh, sw)
            ri = (np.arange(3) * sh) // 3
            ci = (np.arange(4) * sw) // 4
            assert got[k * 12 : (k + 1) * 12] == a[ri][:, ci].tobytes()
    assert bytes(out[5]["payload"]) == rows[4][2]  # unknown: passthrough

    # UPSCALE: 3x2 -> 9x4 repeats source pixels per the floor mapping
    small = bytes(range(3 * 2 * 3))
    up = {
        r["media_id"]: r
        for r in resize_media(
            spark.createDataFrame(
                [(1, "image", encode_ppm(small, 3, 2), None, None, None)],
                MEDIA_SCHEMA,
            ),
            9,
            4,
        ).collect()
    }
    a = np.frombuffer(small, dtype=np.uint8).reshape(2, 3, 3)
    ri = (np.arange(4) * 2) // 4
    ci = (np.arange(9) * 3) // 9
    assert _ppm_pixels(bytes(up[1]["payload"])) == (9, 4, a[ri][:, ci, :].tobytes())

    # RGBA PNG passes through (the encoder is RGB-only)
    rgba_raw = rng.integers(0, 256, 4 * 2 * 4, dtype=np.uint8).tobytes()
    import struct as _struct
    import zlib as _zlib

    from octopusdb_spark.functions.multimodal import PNG_SIG, _png_chunk

    ihdr = _struct.pack(">IIBBBBB", 4, 2, 8, 6, 0, 0, 0)  # color type 6 = RGBA
    scan = b"".join(b"\x00" + rgba_raw[r * 16 : (r + 1) * 16] for r in range(2))
    rgba_png = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )
    out2 = resize_media(
        spark.createDataFrame(
            [(9, "image", rgba_png, None, None, None)], MEDIA_SCHEMA
        ),
        2,
        1,
    ).collect()[0]
    assert bytes(out2["payload"]) == rgba_png


def test_resample_audio_real(spark):
    """resample_audio converts PCM WAV sample rates FOR REAL: mono down-
    and up-sampling match the NumPy floor-mapping reference; stereo frames
    move as units (no channel interleave drift); 8-bit and non-WAV
    payloads pass through unchanged."""
    import numpy as np
    import struct as _struct

    from octopusdb_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
        resample_audio,
    )

    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32768, 160, dtype=np.int64).tolist()
    stereo_frames = rng.integers(-32768, 32768, (50, 2), dtype=np.int64)
    u8 = bytes((i * 13) % 256 for i in range(64))
    hdr8 = b"RIFF" + _struct.pack("<I", 36 + len(u8)) + b"WAVE"
    hdr8 += b"fmt " + _struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
    wav8 = hdr8 + b"data" + _struct.pack("<I", len(u8)) + u8
    rows = [
        (1, "audio", encode_wav(mono, 8000), None, None, None),
        (2, "audio", encode_wav(stereo_frames.reshape(-1).tolist(), 8000, 2),
         None, None, None),
        (3, "audio", wav8, None, None, None),
        (4, "image", b"P6\n1 1\n255\nabc", None, None, None),
    ]
    out = {
        r["media_id"]: bytes(r["payload"])
        for r in resample_audio(
            spark.createDataFrame(rows, MEDIA_SCHEMA), 3000
        ).collect()
    }

    def ref(frames, dst, src):
        n_in = len(frames)
        n_out = max(1, (n_in * dst) // src)
        idx = (np.arange(n_out) * n_in) // n_out
        return frames[idx]

    d1 = decode_wav(out[1])
    exp1 = ref(np.array(mono), 3000, 8000)
    assert d1["sample_rate"] == 3000 and d1["n_samples"] == len(exp1)
    assert abs(d1["mean"] - exp1.mean()) < 1e-9
    d2 = decode_wav(out[2])
    exp2 = ref(stereo_frames, 3000, 8000)
    assert d2["sample_rate"] == 3000 and d2["channels"] == 2
    assert d2["n_samples"] == len(exp2)
    assert abs(d2["mean"] - exp2.reshape(-1).mean()) < 1e-9
    assert out[3] == wav8  # 8-bit: passthrough
    assert out[4] == b"P6\n1 1\n255\nabc"  # non-WAV: passthrough

    # upsample 8k -> 12k repeats frames per the floor mapping
    up = resample_audio(
        spark.createDataFrame([rows[0]], MEDIA_SCHEMA), 12000
    ).collect()[0]
    du = decode_wav(bytes(up["payload"]))
    expu = ref(np.array(mono), 12000, 8000)
    assert du["sample_rate"] == 12000 and du["n_samples"] == len(expu)
    assert abs(du["mean"] - expu.mean()) < 1e-9


def test_wav_zero_rate_falls_back(spark):
    """Review fix: a WAV declaring sample rate 0 must hit the stub path
    (extract_features) / pass through (resample_audio), not divide by
    zero in the task."""
    import struct as _struct

    from octopusdb_spark.functions.multimodal import resample_audio

    body = b"\x01\x00" * 10
    hdr = b"RIFF" + _struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + _struct.pack("<IHHIIHH", 16, 1, 1, 0, 0, 2, 16)  # rate 0
    wav0 = hdr + b"data" + _struct.pack("<I", len(body)) + body
    df = spark.createDataFrame([(1, "audio", wav0, None, None, None)], MEDIA_SCHEMA)
    feat = extract_features(df).collect()[0]
    assert not feat["decoded"]  # unsupported encoding -> stub
    out = resample_audio(df, 3000).collect()[0]
    assert bytes(out["payload"]) == wav0  # passthrough, no crash


def test_gif_lzw_decode_real(spark):
    """GIF (entropy codec #2 — LZW vs PNG's DEFLATE) decodes FOR REAL:
    encoder round trip through extract_features, a real-world GIF89a (the
    canonical 1x1 tracking pixel, which omits the END code and carries a
    graphic-control extension), and malformed fallbacks."""
    import base64

    from octopusdb_spark.functions.multimodal import encode_gif

    px = bytes((i * 31) % 256 for i in range(16 * 9))
    tiny = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    rows = [
        (1, "image", encode_gif(px, 16, 9), None, None, None),
        (2, "image", tiny, None, None, None),
        (3, "image", encode_gif(px, 16, 9)[:-12], None, None, None),  # torn
    ]
    out = {
        r["media_id"]: r
        for r in extract_features(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    g = out[1]
    assert g["decoded"] and g["container"] == "gif"
    assert (g["width"], g["height"]) == (16, 9)
    exp = [b for v in px for b in (v, v, v)]  # grayscale palette -> RGB
    assert abs(g["feat_mean"] - sum(exp) / len(exp)) < 1e-9
    t = out[2]
    assert t["decoded"] and (t["width"], t["height"]) == (1, 1)
    assert t["feat_mean"] == 0.0  # single black pixel
    assert not out[3]["decoded"]  # truncated LZW -> stub, not a crash


def test_gif_lzw_property():
    """Property test (no Spark): random index streams round-trip through
    the LZW pair across code sizes, including dictionary-reset lengths."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from octopusdb_spark.functions.multimodal import (
        _lzw_compress,
        _lzw_decompress,
    )

    @settings(max_examples=20, deadline=None)
    @given(
        min_code=st.integers(min_value=2, max_value=8),
        seed=st.integers(min_value=0, max_value=2**31),
        n=st.integers(min_value=1, max_value=3000),
    )
    def check(min_code, seed, n):
        import random

        rng = random.Random(seed)
        alphabet = 1 << min_code
        data = [rng.randrange(alphabet) for _ in range(n)]
        got = _lzw_decompress(_lzw_compress(data, min_code), min_code, n)
        assert got == data

    check()


def test_gif_out_of_range_code_falls_back(spark):
    """Review fix: an LZW code outside the table right after CLEAR must
    raise ValueError (stub fallback), not IndexError (task crash)."""
    import struct as _struct

    from octopusdb_spark.functions.multimodal import decode_media

    hdr = b"GIF87a" + _struct.pack("<HHBBB", 2, 2, 0xF7, 0, 0)
    palette = bytes(v for i in range(256) for v in (i, i, i))
    img = b"\x2c" + _struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    acc, nb, out = 0, 0, bytearray()
    for code in (256, 300):  # CLEAR, then an out-of-range code
        acc |= code << nb
        nb += 9
        while nb >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        out.append(acc & 0xFF)
    crafted = hdr + palette + img + bytes([8, len(out)]) + bytes(out) + b"\x00\x3b"
    assert decode_media(crafted) is None
    feats = extract_features(
        spark.createDataFrame([(1, "image", crafted, None, None, None)], MEDIA_SCHEMA)
    ).collect()
    assert len(feats) == 1 and not feats[0]["decoded"]


def test_jpeg_decode_real(spark):
    """JPEG (entropy codec #3 — Huffman + DCT vs DEFLATE/LZW) decodes FOR
    REAL through extract_features: a constant-block image has the exact
    arithmetic moments the gate oracle predicts, a torn payload and a
    progressive frame fall back to the stub."""
    import numpy as np

    from octopusdb_spark.functions.multimodal import encode_jpeg

    vals = np.array([[10, 200], [77, 140], [255, 0]], np.uint8)
    img = np.kron(vals, np.ones((8, 8), np.uint8))
    jp = encode_jpeg(img.tobytes(), 16, 24)
    progressive = jp.replace(b"\xff\xc0", b"\xff\xc2", 1)
    rows = [
        (1, "image", jp, None, None, None),
        (2, "image", jp[: len(jp) // 2], None, None, None),
        (3, "image", progressive, None, None, None),
    ]
    out = {
        r["media_id"]: r
        for r in extract_features(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    g = out[1]
    assert g["decoded"] and g["container"] == "jpeg"
    assert (g["width"], g["height"]) == (16, 24)
    # the oracle lane's contract: block value v -> clamp(2*floor((v-127)/2)+128)
    exp = np.clip(2 * ((vals.astype(np.int64) - 127) // 2) + 128, 0, 255)
    assert abs(g["feat_mean"] - exp.mean()) < 1e-9
    assert not out[2]["decoded"] and not out[3]["decoded"]


def test_jpeg_round_trip_property():
    """Property test (no Spark): random images of odd geometry round-trip
    through encode_jpeg/decode_jpeg with the right dims and a mean within
    the Annex-K quantization error envelope; constant-block images are
    EXACT (the correctness-gate contract)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from octopusdb_spark.functions.multimodal import decode_jpeg, encode_jpeg

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=21),
        h=st.integers(min_value=1, max_value=19),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(w, h, seed):
        import numpy as np

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        d = decode_jpeg(encode_jpeg(img.tobytes(), w, h))
        assert (d["width"], d["height"]) == (w, h)
        # noise is the quantizer's worst case; the mean still tracks the
        # source because DC error per block is bounded by q00/2 / 8 = 1
        assert abs(d["mean"] - img.mean()) < 8.0

        blocks = rng.integers(0, 256, size=(3, 2)).astype(np.uint8)
        cimg = np.kron(blocks, np.ones((8, 8), np.uint8))
        d2 = decode_jpeg(encode_jpeg(cimg.tobytes(), 16, 24))
        exp = np.clip(2 * ((blocks.astype(np.int64) - 127) // 2) + 128, 0, 255)
        assert abs(d2["mean"] - exp.mean()) < 1e-12
        assert abs(d2["rms"] - np.sqrt((exp.astype(np.float64) ** 2).mean())) < 1e-12

    check()


def test_jpeg_unsupported_corners_fall_back():
    """Unsupported/corrupt JPEG corners raise ValueError -> decode_media
    None (stub fallback), never a task crash: missing restart markers
    under a declared DRI, CMYK component counts, truncated SOF, 16-bit
    quant tables, dimensions past the decode bound, unexpected in-scan
    RST markers."""
    import struct as _struct

    from octopusdb_spark.functions.multimodal import (
        decode_jpeg,
        decode_media,
        encode_jpeg,
    )

    jp = encode_jpeg(bytes(64), 8, 8)

    def seg(marker, body):
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    # DRI is supported now: declaring interval 4 on a 1-MCU image never
    # reaches a boundary, so it decodes
    with_dri = jp[:2] + seg(0xDD, _struct.pack(">H", 4)) + jp[2:]
    assert decode_media(with_dri) is not None
    # but interval 1 on a 4-MCU image REQUIRES markers the stream lacks
    jp4 = encode_jpeg(bytes(256), 16, 16)
    dri_no_rst = jp4[:2] + seg(0xDD, _struct.pack(">H", 1)) + jp4[2:]
    assert decode_media(dri_no_rst) is None
    # DRI of zero is fine (no restarts declared)
    ok_dri = jp[:2] + seg(0xDD, _struct.pack(">H", 0)) + jp[2:]
    assert decode_media(ok_dri) is not None

    sof_at = jp.find(b"\xff\xc0")
    four_comp = bytearray(jp)
    four_comp[sof_at + 9] = 4  # CMYK-style component count: unsupported
    assert decode_media(bytes(four_comp)) is None
    # 3 components DECLARED but a 1-component-sized SOF: truncated, not
    # a crash (color is supported now, so this is the length guard)
    trunc3 = bytearray(jp)
    trunc3[sof_at + 9] = 3
    assert decode_media(bytes(trunc3)) is None

    dqt_at = jp.find(b"\xff\xdb")
    wide_q = bytearray(jp)
    wide_q[dqt_at + 4] = 0x10  # Pq=1: 16-bit table
    assert decode_media(bytes(wide_q)) is None

    big = bytearray(jp)
    _struct.pack_into(">HH", big, sof_at + 5, 60000, 60000)
    assert decode_media(bytes(big)) is None

    import pytest as _pytest

    scan_start = jp.find(b"\xff\xda")
    rst_in_scan = jp[: scan_start + 10] + b"\xff\xd0" + jp[scan_start + 10 :]
    with _pytest.raises(ValueError):
        decode_jpeg(rst_in_scan)


def test_jpeg_color_constant_mcu_exact():
    """Color JPEG (YCbCr + 4:2:0 + interleaved MCUs) decodes constant-MCU
    images to EXACTLY the per-byte arithmetic the gate oracle computes,
    via an independent reimplementation of the rounding chain."""
    import math

    import numpy as np

    from octopusdb_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg_color,
    )

    def predict(r, g, b):
        fl = math.floor
        cl = lambda x: min(max(x, 0), 255)
        y = cl(fl(0.299 * r + 0.587 * g + 0.114 * b + 0.5))
        cb = cl(fl(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5))
        cr = cl(fl(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5))
        dq = lambda c: cl(2 * fl((c - 127) / 2) + 128)
        y2, cb2, cr2 = dq(y), dq(cb), dq(cr)
        return (
            cl(fl(y2 + 1.402 * (cr2 - 128.0) + 0.5)),
            cl(fl(y2 - 0.344136 * (cb2 - 128.0) - 0.714136 * (cr2 - 128.0) + 0.5)),
            cl(fl(y2 + 1.772 * (cb2 - 128.0) + 0.5)),
        )

    rng = np.random.default_rng(23)
    mcu_vals = rng.integers(0, 256, size=(6, 1, 3)).astype(np.uint8)
    img = np.repeat(np.repeat(mcu_vals, 16, axis=0), 16, axis=1)
    d = decode_jpeg(encode_jpeg_color(img.tobytes(), 16, 96))
    assert (d["width"], d["height"], d["channels"]) == (16, 96, 3)
    exp = np.array(
        [predict(*map(float, v[0])) for v in mcu_vals], dtype=np.int64
    )
    exp = np.repeat(exp, 256, axis=0).reshape(-1)
    assert abs(d["mean"] - exp.mean()) < 1e-12
    assert abs(d["rms"] - np.sqrt((exp.astype(np.float64) ** 2).mean())) < 1e-12


def test_jpeg_color_general_and_444():
    """General color content round-trips at odd geometry with a bounded
    mean error; a hand-assembled 4:4:4 stream (all components 1x1)
    exercises the second supported sampling grid; a 4:2:2-style grid is
    rejected to the stub."""
    import numpy as np

    from octopusdb_spark.functions.multimodal import (
        _dct_mat,
        _jpeg_encode_block,
        _jpeg_headers,
        _seg,
        _JPEG_QTABLE,
        _JpegBitWriter,
        _ZIGZAG,
        decode_jpeg,
        decode_media,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(29)
    w, h = 37, 23
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg_color(img.tobytes(), w, h))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    assert abs(d["mean"] - img.mean()) < 12.0  # noise is the worst case

    # hand-build a one-MCU 4:4:4 stream: constant gray-ish color
    m = _dct_mat()
    q = np.array(_JPEG_QTABLE, np.float64).reshape(8, 8)
    zz = np.array(_ZIGZAG)
    bits = _JpegBitWriter()
    for plane_val in (120.0, 130.0, 140.0):  # Y, Cb, Cr constants
        _jpeg_encode_block(bits, np.full((8, 8), plane_val), m, q, zz, 0)
    payload = (
        _jpeg_headers(8, 8, b"\x01\x11\x00\x02\x11\x00\x03\x11\x00")
        + _seg(0xDA, b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00")
        + bits.flush()
        + b"\xff\xd9"
    )
    d444 = decode_jpeg(payload)
    assert (d444["width"], d444["height"], d444["channels"]) == (8, 8, 3)
    # Y=120 Cb=130 Cr=140 all decode to themselves (even values, q00=16
    # DC contract) -> one flat RGB triple
    exp_r = int(np.floor(120 + 1.402 * 12 + 0.5))
    assert abs(d444["mean"] * 3 - (exp_r + np.floor(120 - 0.344136 * 2 - 0.714136 * 12 + 0.5) + np.floor(120 + 1.772 * 2 + 0.5))) < 1e-9

    # unsupported sampling grid (2x1 luma = 4:2:2) -> stub fallback
    bad = bytearray(encode_jpeg_color(img.tobytes(), w, h))
    at = bytes(bad).find(b"\xff\xc0")
    bad[at + 12] = 0x21  # luma sampling 2x1
    assert decode_media(bytes(bad)) is None


def test_jpeg_restarts_and_sampling_grids():
    """Restart intervals and every supported sampling grid round-trip:
    RSTn markers re-sync the stream and reset DC prediction (a
    restart-coded stream must decode IDENTICALLY to the unrestarted
    one), 4:2:2 / 4:4:0 / 4:4:4 land the declared geometry, and an
    out-of-sequence restart marker is rejected."""
    import numpy as np
    import pytest as _pytest

    from octopusdb_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(31)
    w, h = 40, 36
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8).tobytes()

    base = decode_jpeg(encode_jpeg_color(img, w, h))
    with_rst = encode_jpeg_color(img, w, h, restart_interval=2)
    assert with_rst != encode_jpeg_color(img, w, h)  # markers present
    d = decode_jpeg(with_rst)
    assert (d["mean"], d["rms"]) == (base["mean"], base["rms"])

    for samp in ((1, 1), (2, 1), (1, 2)):
        ds = decode_jpeg(encode_jpeg_color(img, w, h, sampling=samp))
        assert (ds["width"], ds["height"], ds["channels"]) == (w, h, 3)
        assert abs(ds["mean"] - base["mean"]) < 8.0  # same image, other grid

    # corrupt the restart SEQUENCE: swap the first RST0 to RST5
    broken = with_rst.replace(b"\xff\xd0", b"\xff\xd5", 1)
    with _pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(broken)


def test_flac_round_trip_and_containers(spark):
    """FLAC (entropy codec #4 — Rice) decodes FOR REAL through
    extract_features: multi-frame encode round-trips exact sample
    moments; corrupt (CRC), truncated, and unsupported (stereo) streams
    fall back to the stub."""
    import struct as _struct

    from octopusdb_spark.functions.flac import decode_flac, encode_flac

    samples = [((i * 37) % 4001) - 2000 for i in range(700)]
    fl = encode_flac(samples, 8000, block_size=128)
    corrupt = bytearray(fl)
    corrupt[len(corrupt) - 20] ^= 0x10
    # stereo STREAMINFO: flip channels-1 field (bits 140..142 of the
    # 34-byte body at offset 8; byte 20 of the stream holds them)
    rows = [
        (1, "audio", fl, None, None, None),
        (2, "audio", bytes(corrupt), None, None, None),
        (3, "audio", fl[: len(fl) // 2], None, None, None),
    ]
    out = {
        r["media_id"]: r
        for r in extract_features(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    g = out[1]
    assert g["decoded"] and g["container"] == "flac"
    assert g["n_samples"] == 700 and g["sample_rate"] == 8000
    assert abs(g["feat_mean"] - sum(samples) / len(samples)) < 1e-9
    assert not out[2]["decoded"] and not out[3]["decoded"]

    # compression is REAL on smooth signals
    smooth = encode_flac([i % 500 for i in range(8000)])
    assert len(smooth) < 2 * 8000 * 0.35
    d = decode_flac(smooth)
    assert d["n_samples"] == 8000

    # >2 channels declared in STREAMINFO -> explicit unsupported error
    # (stereo itself is supported as of r13)
    st = bytearray(fl)
    # STREAMINFO body starts at byte 8; sample-rate(20)+channels(3) share
    # bytes 18-20 of the body: set channels-1 = 2 (bit pattern 010)
    body_at = 8
    b20 = st[body_at + 12]  # byte holding rate[low4] | channels(3) | bps[hi1]
    st[body_at + 12] = (b20 & 0b11110001) | 0b0100
    import pytest as _pytest

    with _pytest.raises(ValueError, match=">2-channel"):
        decode_flac(bytes(st))

    # stereo STREAMINFO over mono frames -> channel-assignment error
    st[body_at + 12] = (b20 & 0b11110001) | 0b0010
    with _pytest.raises(ValueError, match="channel assignment"):
        decode_flac(bytes(st))


def test_flac_lpc_stereo_round_trip(spark):
    """r13: LPC subframes (orders from `_LPC_ORDERS`, quantized
    coefficients + arithmetic shift) and all four stereo channel
    assignments round-trip EXACTLY, through extract_features like the
    mono lane; LPC actually wins on sinusoid-ish signals."""
    import math

    from octopusdb_spark.functions.flac import decode_flac, encode_flac

    left = [int(12000 * math.sin(i / 17)) for i in range(3000)]
    right = [int(9000 * math.sin(i / 29 + 0.7)) - 100 for i in range(3000)]
    inter = [v for pair in zip(left, right) for v in pair]
    m = len(inter)
    want_mean = sum(inter) / m
    want_rms = (sum(v * v for v in inter) / m) ** 0.5

    for mode in ("best", "independent", "left_side", "right_side", "mid_side"):
        fl = encode_flac(
            inter, 8000, block_size=256, channels=2,
            stereo_mode=mode, predictors=("fixed", "lpc"),
        )
        d = decode_flac(fl)
        assert d["channels"] == 2 and d["n_samples"] == 3000
        assert abs(d["mean"] - want_mean) < 1e-12
        assert abs(d["rms"] - want_rms) < 1e-9

    # LPC beats fixed on a slow sinusoid (compression is real)
    mono = [int(15000 * math.sin(i / 50)) for i in range(6000)]
    sz_fixed = len(encode_flac(mono, 8000, predictors=("fixed",)))
    sz_lpc = len(encode_flac(mono, 8000, predictors=("fixed", "lpc")))
    assert sz_lpc < sz_fixed

    # LPC-only streams decode (every non-constant subframe is LPC),
    # including a tail block shorter than 2*order (verbatim fallback)
    odd = inter[: 2 * (3000 - 250 * 11 - 3)]
    fl = encode_flac(
        odd, 8000, block_size=250, channels=2,
        stereo_mode="mid_side", predictors=("lpc",),
    )
    assert b"\xff\xf8" in fl  # frames present
    d = decode_flac(fl)
    n2 = len(odd)
    assert d["n_samples"] == n2 // 2
    assert abs(d["mean"] - sum(odd) / n2) < 1e-12

    # the gate path: extract_features decodes a stereo LPC stream
    rows = [(1, "audio", fl, None, None, None)]
    out = extract_features(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    assert out[0]["decoded"] and out[0]["feat_dim"] == 2


def test_flac_property_round_trip():
    """Property test (no Spark): random signals of every character —
    noise, ramps, constants, negative-heavy — round-trip losslessly
    through every block size, including frames smaller than the
    predictor order; r13 extends the grid with channels (mono/stereo),
    every stereo decorrelation mode, and every predictor-family mix
    (fixed / lpc / both) — losslessness must hold across the whole
    cross product, including LPC on signals where the analysis is
    degenerate (constants, spikes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from octopusdb_spark.functions.flac import decode_flac, encode_flac

    @settings(max_examples=25, deadline=None)
    @given(
        seed=st.integers(min_value=0, max_value=2**31),
        n=st.integers(min_value=1, max_value=1200),
        bs=st.sampled_from([16, 100, 192, 4096]),
        kind=st.sampled_from(["noise", "ramp", "const", "spiky", "sine"]),
        channels=st.sampled_from([1, 2]),
        mode=st.sampled_from(
            ["best", "independent", "left_side", "right_side", "mid_side"]
        ),
        preds=st.sampled_from([("fixed",), ("lpc",), ("fixed", "lpc")]),
    )
    def check(seed, n, bs, kind, channels, mode, preds):
        import math
        import random

        rng = random.Random(seed)
        m = n * channels
        if kind == "noise":
            samples = [rng.randrange(-32768, 32768) for _ in range(m)]
        elif kind == "ramp":
            samples = [(i * 3 - m) % 2000 for i in range(m)]
        elif kind == "const":
            samples = [rng.randrange(-32768, 32768)] * m
        elif kind == "sine":
            a = rng.randrange(1000, 30000)
            w = rng.uniform(0.01, 0.5)
            samples = [int(a * math.sin(i * w)) for i in range(m)]
        else:
            samples = [0] * m
            for _ in range(max(1, m // 10)):
                samples[rng.randrange(m)] = rng.randrange(-32768, 32768)
        d = decode_flac(
            encode_flac(
                samples, 8000, block_size=bs, channels=channels,
                stereo_mode=mode, predictors=preds,
            )
        )
        assert d["n_samples"] == n and d["channels"] == channels
        assert abs(d["mean"] - sum(samples) / m) < 1e-9
        exp_rms = (sum(s * s for s in samples) / m) ** 0.5
        assert abs(d["rms"] - exp_rms) < 1e-6

    check()


def test_review_fixes_flac_and_jpeg_guards():
    """Round-12 review pins: (a) FLAC frame numbers >= 2048 encode/decode
    correctly (the UTF-8-style coding's capacity bound was wrong, so any
    stream past ~2048 frames was undecodable); (b) a STREAMINFO declaring
    zero/unknown total samples rejects with ValueError, not
    ZeroDivisionError (which would escape the stub fallback and kill the
    task); (c) empty-body SOF/SOS JPEG markers reject with ValueError,
    not IndexError."""
    from octopusdb_spark.functions.flac import (
        _BitReader,
        _utf8_code,
        _utf8_decode,
        decode_flac,
        encode_flac,
    )
    from octopusdb_spark.functions.multimodal import decode_media

    for n in (127, 128, 2047, 2048, 65535, 65536, (1 << 31) - 1, (1 << 36) - 1):
        assert _utf8_decode(_BitReader(_utf8_code(n))) == n, n
    samples = [(i * 17) % 3001 - 1500 for i in range(33000)]
    d = decode_flac(encode_flac(samples, 8000, block_size=16))  # 2063 frames
    assert d["n_samples"] == 33000
    assert abs(d["mean"] - sum(samples) / 33000) < 1e-9

    z = bytearray(encode_flac([1, 2, 3]))
    z[8 + 13] &= 0xF0  # STREAMINFO total-samples = body bits 108..143
    for i in range(14, 18):
        z[8 + i] = 0
    assert decode_media(bytes(z)) is None

    assert decode_media(b"\xff\xd8\xff\xc0\x00\x02") is None  # empty SOF
    assert decode_media(b"\xff\xd8\xff\xda\x00\x02") is None  # empty SOS


def test_mp4_box_walk_metadata(spark):
    """r13: MP4/ISO-BMFF box-walk — brand, mvhd v0/v1 timescale+duration,
    track geometry (tkhd 16.16 dims), hdlr routing, stsd fourccs, 64-bit
    largesize mdat, unknown-box skip — and every malformed class raises
    ValueError (loud fallback), never a different exception."""
    from octopusdb_spark.functions.mp4 import (
        MP4_META_SCHEMA,
        build_mp4,
        mp4_metadata,
        parse_mp4,
    )

    f = build_mp4(b"isom", 1000, 12500, video=(b"avc1", 640, 360),
                  audio=(b"mp4a", 48000), version=0, mdat=b"x" * 16)
    m = parse_mp4(f)
    assert m == {
        "container": "mp4", "brand": "isom", "timescale": 1000,
        "duration_ms": 12500, "n_tracks": 2, "video_w": 640,
        "video_h": 360, "video_codec": "avc1", "audio_codec": "mp4a",
    }
    # v1 headers + 90 kHz timescale + video-only
    m1 = parse_mp4(build_mp4(b"mp42", 90000, 90000 * 7 + 450,
                             video=(b"hev1", 1920, 1080), version=1))
    assert m1["duration_ms"] == 7005 and m1["n_tracks"] == 1
    assert m1["video_codec"] == "hev1" and m1["audio_codec"] is None
    # audio-only
    m2 = parse_mp4(build_mp4(b"M4A ", 44100, 44100 * 3,
                             audio=(b"opus", 44100), version=1))
    assert m2["video_w"] is None and m2["audio_codec"] == "opus"

    # malformed classes all raise ValueError
    bad_cases = [f[:10], f[:40], f[: len(f) - 4], b"\x00" * 40]
    undersize = bytearray(f)
    undersize[0:4] = (3).to_bytes(4, "big")  # size < header
    bad_cases.append(bytes(undersize))
    zero_ts = build_mp4(b"isom", 1000, 0, video=(b"avc1", 16, 16))
    zts = bytearray(zero_ts)
    at = zero_ts.index(b"mvhd") + 4 + 12  # v0 timescale offset in body
    zts[at : at + 4] = b"\x00\x00\x00\x00"
    bad_cases.append(bytes(zts))
    for bad in bad_cases:
        with pytest.raises(ValueError):
            parse_mp4(bad)

    # Spark surface: decoded flag + nulls ride the loud fallback
    rows = [(1, "video", f, None, None, None),
            (2, "video", f[: len(f) - 6], None, None, None)]
    out = {
        r["media_id"]: r
        for r in mp4_metadata(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    assert out[1]["decoded"] and out[1]["video_w"] == 640
    assert not out[2]["decoded"] and out[2]["duration_ms"] is None
    assert [f.name for f in MP4_META_SCHEMA.fields][0] == "media_id"


def test_mp3_frame_walk_metadata(spark):
    """r13: MP3 frame-walk — ID3v2 syncsafe skip, per-frame header walk
    (ISO 11172-3 bitrate/rate tables, padding-aware sizing), exact
    duration arithmetic; malformed classes (truncation, lost sync, bad
    syncsafe, VBR parameter change, free bitrate) raise ValueError."""
    from octopusdb_spark.functions.mp3 import (
        MP3_META_SCHEMA,
        build_mp3,
        mp3_metadata,
        parse_mp3,
    )

    s = build_mp3(25, 128, 44100, channel_mode=3,
                  id3_payload=b"T" * 37, pad_every=3)
    m = parse_mp3(s)
    assert m["n_frames"] == 25 and m["bitrate_kbps"] == 128
    assert m["sample_rate"] == 44100 and m["channel_mode"] == "mono"
    assert m["duration_ms"] == 25 * 1152 * 1000 // 44100
    m2 = parse_mp3(build_mp3(7, 320, 32000, channel_mode=1))
    assert m2["n_frames"] == 7 and m2["channel_mode"] == "joint_stereo"

    bad_cases = [
        s[:-5],  # truncated final frame
        b"\x00" * 30,  # no sync
        b"ID3" + bytes([3, 0, 0, 0x80, 0, 0, 0]) + b"x" * 20,  # bad syncsafe
        build_mp3(2, 128, 44100) + build_mp3(2, 192, 44100),  # VBR change
    ]
    # free bitrate (index 0): frame length undefined
    fb = bytearray(build_mp3(2, 128, 44100))
    fb[2] = (0 << 4) | (fb[2] & 0x0F)
    bad_cases.append(bytes(fb))
    for bad in bad_cases:
        with pytest.raises(ValueError):
            parse_mp3(bad)

    rows = [(1, "audio", s, None, None, None),
            (2, "audio", s[:-5], None, None, None)]
    out = {
        r["media_id"]: r
        for r in mp3_metadata(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    assert out[1]["decoded"] and out[1]["n_frames"] == 25
    assert not out[2]["decoded"] and out[2]["duration_ms"] is None
    assert [f.name for f in MP3_META_SCHEMA.fields][0] == "media_id"


def test_media_parser_exception_contract_fuzz():
    """Seeded corruption fuzz (no Spark): FLAC decode and the MP4/MP3
    metadata walks may only raise the exception classes their callers
    catch (ValueError / struct.error) — anything else would escape the
    loud-fallback boundary and kill an executor batch. Byte flips,
    truncations, scrambles, and insertions, 800 trials per format."""
    import math
    import random
    import struct

    from octopusdb_spark.functions.flac import decode_flac, encode_flac
    from octopusdb_spark.functions.mp3 import build_mp3, build_mp3_vbr, parse_mp3
    from octopusdb_spark.functions.mp4 import (
        build_fmp4,
        build_mp4,
        parse_fmp4_fragments,
        parse_mp4,
        parse_mp4_tracks,
    )
    from octopusdb_spark.functions.multimodal import (
        decode_gif_frames,
        encode_gif_animation,
    )
    from octopusdb_spark.functions.ogg import build_ogg_opus, parse_ogg_opus

    rng = random.Random(1234)
    inter = [
        v
        for i in range(800)
        for v in (int(9000 * math.sin(i / 21)), int(7000 * math.sin(i / 13 + 2)))
    ]
    targets = [
        (
            encode_flac(inter, 8000, block_size=128, channels=2,
                        stereo_mode="best", predictors=("fixed", "lpc")),
            decode_flac,
        ),
        (
            build_mp4(b"isom", 1000, 50000, video=(b"avc1", 640, 360),
                      audio=(b"mp4a", 48000), version=1, mdat=b"z" * 64),
            parse_mp4,
        ),
        (
            build_mp3(40, 192, 48000, channel_mode=0,
                      id3_payload=b"x" * 20, pad_every=4),
            parse_mp3,
        ),
        (
            build_mp3_vbr([96, 192, 128, 320, 64, 128, 256, 112], 44100,
                          channel_mode=1, id3_payload=b"y" * 11),
            parse_mp3,
        ),
        (
            build_mp4(
                b"isom", 1000, 0, video=(b"avc1", 320, 240),
                audio=(b"mp4a", 48000),
                video_samples={"stts_runs": [(4, 100), (3, 50)],
                               "sizes": [90, 91, 92, 93, 94, 95, 96],
                               "samples_per_chunk": 3, "stss_every": 2},
                audio_samples={"stts_runs": [(6, 1024)], "sizes": 128,
                               "samples_per_chunk": 4, "co64": True},
            ),
            parse_mp4_tracks,
        ),
        (
            encode_gif_animation(
                16, 10, 30,
                [dict(left=0, top=0, w=16, h=10, pixels=bytes([100]) * 160,
                      delay_cs=4, disposal=1),
                 dict(left=2, top=2, w=4, h=4, pixels=bytes([50]) * 16,
                      delay_cs=5, disposal=2,
                      palette=bytes(v for i in range(256)
                                    for v in (i, 255 - i, i // 2)))],
            ),
            decode_gif_frames,
        ),
        (
            build_fmp4(
                1000, 1, 100, 200,
                [{"n_samples": 3, "durations": [100, 110, 120],
                  "sizes": [50, 60, 70]},
                 {"n_samples": 4, "default_duration": 90,
                  "default_size": 40},
                 {"n_samples": 2}],
            ),
            parse_fmp4_fragments,
        ),
        (
            build_ogg_opus(0x77, channels=2, preskip=312,
                           input_rate=48000,
                           audio_pages=[(3, 100), (4, 120), (2, 80)]),
            parse_ogg_opus,
        ),
        # r15 surfaces under the same fuzz contract: a sidx-bearing
        # fragmented MP4 and a code-3 TOC OGG stream
        (
            build_fmp4(
                1000, 1, 100, 200,
                [{"n_samples": 3, "durations": [100, 110, 120],
                  "sizes": [50, 60, 70]},
                 {"n_samples": 2}],
                sidx={"version": 1},
            ),
            parse_fmp4_fragments,
        ),
        (
            build_ogg_opus(0x31, toc_config=27, stereo_flag=True,
                           frames_per_packet=3,
                           audio_pages=[(2, 40), (3, 60)]),
            parse_ogg_opus,
        ),
    ]
    for base, parse in targets:
        for trial in range(800):
            s = bytearray(base)
            mode = trial % 4
            if mode == 0:
                s[rng.randrange(len(s))] ^= 1 << rng.randrange(8)
            elif mode == 1:
                s = s[: rng.randrange(1, len(s))]
            elif mode == 2:
                for _ in range(8):
                    s[rng.randrange(len(s))] = rng.randrange(256)
            else:
                i = rng.randrange(len(s))
                ins = bytes([rng.randrange(256)] * rng.randrange(1, 9))
                s = s[:i] + ins + s[i:]
            try:
                parse(bytes(s))
            except (ValueError, struct.error):
                pass


def test_media_parser_advice_r13_edge_cases():
    """ADVICE r13 regressions (no Spark): (1) a header-only size-8
    mvhd/tkhd whose empty body lands at end-of-payload must raise
    ValueError, not IndexError; (2) a 128-byte ID3v1 'TAG' trailer after
    the last MP3 frame is metadata, not sync loss."""
    import struct

    from octopusdb_spark.functions.mp3 import build_mp3, parse_mp3
    from octopusdb_spark.functions.mp4 import parse_mp4

    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0))
    # moov whose only child is a header-only mvhd (empty body at EOF)
    with pytest.raises(ValueError):
        parse_mp4(ftyp + box(b"moov", box(b"mvhd", b"")))
    # valid mvhd, then a trak with a header-only tkhd at EOF
    mvhd = box(b"mvhd", bytes(4) + struct.pack(">IIII", 0, 0, 1000, 5000))
    trak = box(b"trak", box(b"mdia", b"") + box(b"tkhd", b""))
    with pytest.raises(ValueError):
        parse_mp4(ftyp + box(b"moov", mvhd + trak))

    base = build_mp3(9, 128, 44100)
    tagged = base + b"TAG" + bytes(125)
    m = parse_mp3(tagged)
    assert m["n_frames"] == 9
    # a short 'TAG' blob that is NOT a 128-byte ID3v1 block is still a
    # sync loss
    with pytest.raises(ValueError):
        parse_mp3(base + b"TAGx")


def test_mp4_sample_tables(spark):
    """r14: per-track sample-table walk — two-run stts, stsz table vs
    constant modes, stsc chunk runs, stco/co64 ABSOLUTE offsets from the
    two-pass builder, stss sync cadence; consistency violations (count
    mismatch, non-monotonic offsets, bad chunk count) raise ValueError."""
    import struct as _struct

    from octopusdb_spark.functions.mp4 import (
        MP4_TRACKS_SCHEMA,
        build_mp4,
        mp4_track_samples,
        parse_mp4_tracks,
    )

    vs = {"stts_runs": [(3, 100), (4, 50)],
          "sizes": [100, 110, 120, 130, 140, 150, 160],
          "samples_per_chunk": 3, "stss_every": 4}
    aus = {"stts_runs": [(10, 1024)], "sizes": 200,
           "samples_per_chunk": 4, "co64": True}
    p = build_mp4(b"isom", 1000, 500, video=(b"avc1", 640, 360),
                  audio=(b"mp4a", 48000), video_samples=vs,
                  audio_samples=aus)
    trs = parse_mp4_tracks(p)
    v, a = trs
    assert v["n_samples"] == 7 and v["duration_ms"] == 500
    assert v["total_bytes"] == 910 and v["max_sample_bytes"] == 160
    assert v["n_chunks"] == 3 and v["n_sync"] == 2
    assert a["n_samples"] == 10 and a["duration_ms"] == 213
    assert a["total_bytes"] == 2000 and a["n_chunks"] == 3
    assert a["n_sync"] is None and a["codec"] == "mp4a"

    # the stco offsets are REAL: the video track's first chunk offset is
    # the mdat body start, and chunks tile the body contiguously
    base = len(p) - (910 + 2000)
    s = p.find(b"stco") + 4
    first = _struct.unpack_from(">I", p, s + 8)[0]
    assert first == base
    # audio co64 starts right after the video samples
    s = p.find(b"co64") + 4
    assert _struct.unpack_from(">Q", p, s + 8)[0] == base + 910

    # metadata-only track (empty stts) still reports zeros
    p2 = build_mp4(b"mp42", 90000, 9000, video=(b"hev1", 320, 240),
                   version=1, mdat=b"\x00" * 16)
    assert parse_mp4_tracks(p2)[0]["n_samples"] == 0

    # consistency violations raise (the muxer-bug classes)
    broken = bytearray(p)
    z = p.find(b"stsz") + 4
    broken[z + 8 : z + 12] = _struct.pack(">I", 6)  # count mismatch
    with pytest.raises(ValueError):
        parse_mp4_tracks(bytes(broken))
    broken = bytearray(p)
    s = p.find(b"stco") + 4
    broken[s + 12 : s + 16] = _struct.pack(">I", 1)  # offsets not increasing
    with pytest.raises(ValueError):
        parse_mp4_tracks(bytes(broken))

    # Spark surface: per-track explode inside the batch + loud fallback
    rows = [(1, "video", p, None, None, None),
            (2, "video", p[:-20], None, None, None)]
    out = mp4_track_samples(
        spark.createDataFrame(rows, MEDIA_SCHEMA)
    ).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media[1]) == 2 and all(r["decoded"] for r in by_media[1])
    assert len(by_media[2]) == 1 and not by_media[2][0]["decoded"]
    assert [f.name for f in MP4_TRACKS_SCHEMA.fields][0] == "media_id"


def test_gif_animation_frames(spark):
    """r14: animated GIF — GCE delays/disposal, local palettes, sub-rect
    composition over the canvas, NETSCAPE loop skip; unsupported corners
    (disposal 3, transparency, frame outside canvas) raise ValueError."""
    import struct as _struct

    from octopusdb_spark.functions.multimodal import (
        GIF_FRAMES_SCHEMA,
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
        gif_frames,
    )

    local = bytes(v for i in range(256) for v in (i, 255 - i, i // 2))
    frames = [
        dict(left=0, top=0, w=16, h=10, pixels=bytes([100]) * 160,
             delay_cs=4, disposal=1),
        dict(left=2, top=2, w=4, h=4, pixels=bytes([50]) * 16,
             delay_cs=5, disposal=2, palette=local),
        dict(left=8, top=2, w=4, h=4, pixels=bytes([7]) * 16,
             delay_cs=6, disposal=1),
    ]
    p = encode_gif_animation(16, 10, 30, frames, loop=2)
    out = decode_gif_frames(p)
    assert [f["frame_idx"] for f in out] == [0, 1, 2]
    assert out[0]["canvas_sum"] == 3 * 100 * 160
    # frame 1: 16 px through the LOCAL palette (50, 205, 25)
    assert out[1]["canvas_sum"] == 3 * 100 * 144 + 16 * (50 + 205 + 25)
    assert out[1]["local_palette"] and out[1]["delay_cs"] == 5
    # frame 2: frame 1's rect RESTORED to bg gray 30, new rect gray 7
    assert out[2]["canvas_sum"] == 3 * 100 * 128 + 16 * 90 + 16 * 21
    assert out[2]["disposal"] == 1 and not out[2]["local_palette"]
    # single-frame decode_gif still reads frame 0 of the same payload
    assert decode_gif(p)["width"] == 16

    bad_d3 = dict(frames[1]);  bad_d3["disposal"] = 3
    with pytest.raises(ValueError):
        decode_gif_frames(encode_gif_animation(16, 10, 30, [frames[0], bad_d3]))
    oob = dict(frames[2]); oob["left"] = 14
    with pytest.raises(ValueError):
        decode_gif_frames(encode_gif_animation(16, 10, 30, [frames[0], oob]))
    # transparency flag set -> unsupported
    t = bytearray(encode_gif_animation(16, 10, 30, frames))
    i = t.find(b"\x21\xf9\x04")
    t[i + 3] |= 0x01
    with pytest.raises(ValueError):
        decode_gif_frames(bytes(t))

    rows = [(1, "image", p, None, None, None),
            (2, "image", p[:-8], None, None, None)]
    out = gif_frames(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    by = {}
    for r in out:
        by.setdefault(r["media_id"], []).append(r)
    assert len(by[1]) == 3 and all(r["decoded"] for r in by[1])
    assert len(by[2]) == 1 and not by[2][0]["decoded"]
    assert [f.name for f in GIF_FRAMES_SCHEMA.fields][0] == "media_id"


def test_mp4_slice_planning(spark):
    """r14: time-slice seek planning — window filtering over stts times,
    chunk-arithmetic absolute offsets, stss sync flags, empty windows,
    and the closed-form builder-base pin the oracle depends on
    (base = 590 + 8*runs + 4*nv + 4*nc + 4*ns for the video-only
    stsz-table/stco/stss-every-4/spc-3 layout)."""
    from octopusdb_spark.functions.mp4 import (
        MP4_SLICE_SCHEMA,
        build_mp4,
        mp4_sample_ranges,
        mp4_slice_plan,
    )

    def vspec(n_v, b0=37):
        return {
            "stts_runs": ([(n_v // 2, 100), (n_v - n_v // 2, 50)]
                          if n_v >= 4 else [(n_v, 100)]),
            "sizes": [100 + ((i * 7 + b0) % 50) for i in range(n_v)],
            "samples_per_chunk": 3, "stss_every": 4,
        }

    # the closed-form base the multimodal_mp4_slice oracle hard-codes
    for n_v in (2, 3, 4, 7, 8):
        vs = vspec(n_v)
        p = build_mp4(b"isom", 1000, 0, video=(b"avc1", 320, 240),
                      video_samples=vs)
        base = len(p) - sum(vs["sizes"])
        runs = 1 if n_v < 4 else 2
        assert base == (590 + 8 * runs + 4 * n_v
                        + 4 * ((n_v + 2) // 3) + 4 * ((n_v + 3) // 4))
        plan = mp4_sample_ranges(p, 0, 10**9)
        assert [s["sample_idx"] for s in plan] == list(range(n_v))
        assert plan[0]["offset"] == base
        # contiguity: each offset = base + prefix sum of sizes
        acc = base
        for s, sz in zip(plan, vs["sizes"]):
            assert s["offset"] == acc and s["size"] == sz
            acc += sz
        assert [s["sync"] for s in plan] == [i % 4 == 0 for i in range(n_v)]

    p = build_mp4(b"isom", 1000, 0, video=(b"avc1", 320, 240),
                  video_samples=vspec(8))
    # times 0,100,200,300,400,450,500,550: window [150, 460) -> idx 2..5
    assert [s["sample_idx"] for s in mp4_sample_ranges(p, 150, 460)] == [2, 3, 4, 5]
    assert mp4_sample_ranges(p, 600, 700) == []  # past the clip: no reads
    with pytest.raises(ValueError):
        mp4_sample_ranges(p, 300, 300)  # empty window
    with pytest.raises(ValueError):
        mp4_sample_ranges(p, 0, 100, handler="soun")  # no such track

    rows = [(1, "video", p, None, None, None),
            (2, "video", p[:-20], None, None, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).selectExpr(
        "*", "CAST(150 AS LONG) AS t0_ms", "CAST(460 AS LONG) AS t1_ms"
    )
    out = mp4_slice_plan(df).collect()
    by = {}
    for r in out:
        by.setdefault(r["media_id"], []).append(r)
    assert [r["sample_idx"] for r in sorted(by[1], key=lambda r: r["sample_idx"])] == [2, 3, 4, 5]
    assert len(by[2]) == 1 and not by[2][0]["decoded"]
    assert [f.name for f in MP4_SLICE_SCHEMA.fields][0] == "media_id"


def test_mp3_vbr_xing(spark):
    """r14: real-world VBR — the Xing/Info header frame (magic after the
    zeroed side info) switches the walk from CBR homogeneity to
    per-frame bitrates with declared-count cross-checks; the header
    frame carries no audio; VBR without Xing still rejects."""
    from octopusdb_spark.functions.mp3 import (
        MP3_META_SCHEMA,
        build_mp3,
        build_mp3_vbr,
        mp3_metadata,
        parse_mp3,
    )

    brs = [96, 192, 128, 320, 64, 128]
    v = parse_mp3(build_mp3_vbr(brs, 48000, channel_mode=1,
                                id3_payload=b"x" * 9))
    assert v["vbr"] and v["n_frames"] == 6
    assert v["bitrate_kbps"] == sum(brs) // 6
    assert v["n_samples"] == 6 * 1152
    assert v["duration_ms"] == 6 * 1152 * 1000 // 48000
    # CBR output unchanged (incl. the new vbr flag defaulting False)
    c = parse_mp3(build_mp3(25, 128, 44100))
    assert not c["vbr"] and c["n_frames"] == 25 and c["bitrate_kbps"] == 128

    p = build_mp3_vbr(brs, 44100, channel_mode=3)
    last = 144 * 128 * 1000 // 44100
    with pytest.raises(ValueError, match="frame count mismatch"):
        parse_mp3(p[:-last])  # walked fewer frames than declared
    with pytest.raises(ValueError, match="without a Xing header"):
        parse_mp3(build_mp3(2, 128, 44100) + build_mp3(2, 192, 44100))
    # byte-count tamper: inflate the declared bytes field
    import struct as _struct

    t = bytearray(p)
    si = 17
    at = 4 + si + 12
    t[at : at + 4] = _struct.pack(">I", len(p) + 5)
    with pytest.raises(ValueError, match="byte count mismatch"):
        parse_mp3(bytes(t))

    # Spark surface: VBR rows decode with mean bitrate
    rows = [(1, "audio", p, None, None, None)]
    out = mp3_metadata(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    assert out[0]["decoded"] and out[0]["bitrate_kbps"] == sum(brs) // 6
    assert [f.name for f in MP3_META_SCHEMA.fields][0] == "media_id"


def test_exploding_media_surfaces_run_as_streams(spark, tmp_path):
    """The r14 per-track/per-frame/per-sample EXPLODING surfaces are the
    same stateless mapInPandas shape as extract_features, so they run
    unchanged under Structured Streaming — a continuous crawl-ingest can
    plan video slices and walk sample tables in-stream. Batch and stream
    produce identical rows."""
    from octopusdb_spark.functions.mp4 import (
        build_mp4,
        mp4_track_samples,
    )
    from octopusdb_spark.functions.multimodal import (
        decode_gif_frames,  # noqa: F401 (import sanity)
        encode_gif_animation,
        gif_frames,
    )

    p_mp4 = build_mp4(
        b"isom", 1000, 0, video=(b"avc1", 320, 240),
        video_samples={"stts_runs": [(5, 100)], "sizes": [100] * 5,
                       "samples_per_chunk": 2, "stss_every": 2},
    )
    p_gif = encode_gif_animation(
        16, 10, 30,
        [dict(left=0, top=0, w=16, h=10, pixels=bytes([100]) * 160,
              delay_cs=4, disposal=1),
         dict(left=2, top=2, w=4, h=4, pixels=bytes([50]) * 16,
              delay_cs=5, disposal=2)],
    )
    rows = [(1, "video", p_mp4, None, None, None),
            (2, "image", p_gif, None, None, None),
            (3, "video", p_mp4[:-10], None, None, None)]
    src = str(tmp_path / "explode_src")
    spark.createDataFrame(rows, MEDIA_SCHEMA).write.parquet(src)

    for i, (surface, qname) in enumerate(
        [(mp4_track_samples, "mp4_tracks_stream"),
         (gif_frames, "gif_frames_stream")]
    ):
        batch_rows = sorted(
            map(tuple, surface(spark.read.parquet(src)).collect())
        )
        stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(src)
        q = (
            surface(stream)
            .writeStream.format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ckpt{i}"))
            .start()
        )
        q.awaitTermination(120)
        stream_rows = sorted(
            map(tuple, spark.sql(f"select * from {qname}").collect())
        )
        assert stream_rows == batch_rows and len(stream_rows) >= 3


def test_mp4_ctts_presentation_times(spark):
    """r14: ctts composition offsets — presentation time = decode time +
    offset (the B-frame reordering table); absent ctts -> pt == decode;
    count mismatches raise; the with-ctts builder base is
    606 + 8*stts_runs + 8*ctts_runs + 4*nv + 4*nc + 4*ns (the slice
    oracle's closed form)."""
    from octopusdb_spark.functions.mp4 import build_mp4, mp4_sample_ranges

    vs = {"stts_runs": [(6, 100)], "sizes": [100] * 6,
          "samples_per_chunk": 3, "stss_every": 4,
          "ctts_runs": [(2, 50), (2, 0), (2, 50)]}
    p = build_mp4(b"isom", 1000, 0, video=(b"avc1", 320, 240),
                  video_samples=vs)
    plan = mp4_sample_ranges(p, 0, 10**9)
    assert [s["pt_ms"] for s in plan] == [50, 150, 200, 300, 450, 550]
    assert [s["time_ms"] for s in plan] == [0, 100, 200, 300, 400, 500]
    base = len(p) - 600
    assert base == 606 + 8 * 1 + 8 * 3 + 4 * 6 + 4 * 2 + 4 * 2

    no_ctts = dict(vs)
    no_ctts.pop("ctts_runs")
    p2 = build_mp4(b"isom", 1000, 0, video=(b"avc1", 320, 240),
                   video_samples=no_ctts)
    assert all(
        s["pt_ms"] == s["time_ms"] for s in mp4_sample_ranges(p2, 0, 10**9)
    )
    with pytest.raises(ValueError, match="ctts/stts"):
        bad = dict(vs); bad["ctts_runs"] = [(2, 50)]
        build_mp4(b"isom", 1000, 0, video=(b"avc1", 320, 240),
                  video_samples=bad)
    # parser-side mismatch: shrink the declared ctts entry count's runs
    import struct as _struct
    t = bytearray(p)
    at = p.find(b"ctts") + 4 + 4  # entry_count after version/flags
    t[at : at + 4] = _struct.pack(">I", 2)
    with pytest.raises(ValueError, match="ctts/stts sample count mismatch"):
        mp4_sample_ranges(bytes(t), 0, 10**9)


def test_mp3_toc_seek(spark):
    """r14: Xing TOC seek — O(1) time->byte estimation + bounded sync
    snap lands within one frame of the target across the stream,
    including the end-of-stream backward snap; non-TOC streams refuse."""
    import bisect

    from octopusdb_spark.functions.mp3 import (
        _frame_len,
        build_mp3,
        build_mp3_vbr,
        mp3_seek,
        parse_mp3,
    )

    brs = [96, 192, 128, 320, 64, 128, 256, 112, 160, 80] * 3
    p = build_mp3_vbr(brs, 44100, channel_mode=3, toc=True,
                      id3_payload=b"t" * 7)
    m = parse_mp3(p)
    assert m["vbr"] and m["n_frames"] == 30

    # ground-truth audio frame offsets from the builder arithmetic
    id3 = 10 + 7
    offs = [id3 + _frame_len(64, 44100, 0)]
    for br in brs[:-1]:
        offs.append(offs[-1] + _frame_len(br, 44100, 0))

    for t in (0, 100, 300, 500, 700, m["duration_ms"] - 1):
        s = mp3_seek(p, t)
        assert s["frame_offset"] in offs or s["frame_offset"] == id3
        landed = bisect.bisect_right(offs, s["frame_offset"]) - 1
        target = min(len(brs) - 1, t * 44100 // (1152 * 1000))
        assert abs(landed - target) <= 1, (t, landed, target)

    with pytest.raises(ValueError, match="outside"):
        mp3_seek(p, m["duration_ms"] + 1)
    with pytest.raises(ValueError, match="frames\\|bytes\\|TOC"):
        mp3_seek(build_mp3_vbr(brs[:5], 44100), 10)  # no TOC flag
    with pytest.raises(ValueError, match="Xing VBR"):
        mp3_seek(build_mp3(10, 128, 44100), 10)  # CBR


def test_mp4_multirun_stsc(spark):
    """r14: full multi-run stsc — a 2-sample head chunk then 4-sample
    chunks (the layout real muxers emit); offsets stay exact through
    the run-aware chunk expansion; malformed run tables (non-increasing
    first_chunk, zero spc, short middle chunk) raise."""
    import struct as _struct

    from octopusdb_spark.functions.mp4 import (
        build_mp4,
        mp4_sample_ranges,
        parse_mp4_tracks,
    )

    vs = {"stts_runs": [(10, 100)], "sizes": [100 + i for i in range(10)],
          "samples_per_chunk": [(1, 2), (2, 4)], "stss_every": 4}
    p = build_mp4(b"isom", 1000, 0, video=(b"avc1", 320, 240),
                  video_samples=vs)
    tr = parse_mp4_tracks(p)[0]
    assert tr["n_chunks"] == 3 and tr["n_samples"] == 10  # 2 + 4 + 4
    assert tr["chunk_span"] == tr["total_bytes"] == sum(vs["sizes"])
    base = len(p) - sum(vs["sizes"])
    acc = base
    for s, sz in zip(mp4_sample_ranges(p, 0, 10**9), vs["sizes"]):
        assert s["offset"] == acc and s["size"] == sz
        acc += sz

    # corrupt run table: second run's first_chunk <= first's
    t = bytearray(p)
    at = p.find(b"stsc") + 4 + 4  # entry_count; entries start at +4
    t[at + 4 + 12 : at + 8 + 12] = _struct.pack(">I", 1)
    with pytest.raises(ValueError, match="strictly increasing"):
        parse_mp4_tracks(bytes(t))
    # zero samples-per-chunk (first run's spc)
    t = bytearray(p)
    t[at + 8 : at + 12] = _struct.pack(">I", 0)
    with pytest.raises(ValueError, match="zero samples-per-chunk"):
        parse_mp4_tracks(bytes(t))


def test_mp4_elst_edit_list(spark):
    """r14: elst edit lists — a single normal edit subtracts media_time
    from presentation (the standard ctts-lead compensation); splices /
    rate changes / empty edits raise; tracks without elst unchanged."""
    from octopusdb_spark.functions.mp4 import (
        build_mp4,
        mp4_sample_ranges,
        parse_mp4_tracks,
    )

    vs = {"stts_runs": [(6, 100)], "sizes": [100] * 6,
          "samples_per_chunk": 3, "ctts_runs": [(6, 50)],
          "elst_media_time": 50}
    p = build_mp4(b"isom", 1000, 600, video=(b"avc1", 320, 240),
                  video_samples=vs)
    plan = mp4_sample_ranges(p, 0, 10**9)
    # ctts lead (+50) exactly compensated: pt == decode time
    assert [s["pt_ms"] for s in plan] == [0, 100, 200, 300, 400, 500]
    assert parse_mp4_tracks(p)[0]["n_samples"] == 6  # edts box skipped

    no_elst = dict(vs)
    no_elst.pop("elst_media_time")
    p2 = build_mp4(b"isom", 1000, 600, video=(b"avc1", 320, 240),
                   video_samples=no_elst)
    assert [s["pt_ms"] for s in mp4_sample_ranges(p2, 0, 10**9)][0] == 50

    # a LARGER media_time trims the first sample: negative pt marks it
    vs3 = dict(vs); vs3["elst_media_time"] = 120
    p3 = build_mp4(b"isom", 1000, 600, video=(b"avc1", 320, 240),
                   video_samples=vs3)
    assert mp4_sample_ranges(p3, 0, 10**9)[0]["pt_ms"] == -70

    # multi-entry splice: hand-build by doubling the entry count
    import struct as _struct
    t = bytearray(p)
    at = p.find(b"elst") + 4 + 4  # entry_count
    t[at : at + 4] = _struct.pack(">I", 2)
    with pytest.raises(ValueError):
        mp4_sample_ranges(bytes(t), 0, 10**9)


def test_fmp4_fragment_walk(spark):
    """r14: fragmented MP4 — the trun > tfhd > trex precedence chain,
    cumulative tfdt base times, default-base-is-moof data offsets, mdat
    bounds checks, contiguity reporting, and the closed-form layout
    constants the gate oracle hard-codes (HEAD 519; moof spans 96 /
    104 / 96+8n / 96+4n per tier)."""
    import struct as _struct

    from octopusdb_spark.functions.mp4 import (
        FMP4_FRAGS_SCHEMA,
        build_fmp4,
        fmp4_fragments,
        parse_fmp4_fragments,
    )

    frags = [
        {"n_samples": 3, "durations": [100, 110, 120],
         "sizes": [50, 60, 70]},
        {"n_samples": 4, "default_duration": 90, "default_size": 40},
        {"n_samples": 2},
        {"n_samples": 3, "sizes": [30, 35, 40]},
    ]
    p = build_fmp4(1000, 1, trex_duration=100, trex_size=200,
                   fragments=frags)
    out = parse_fmp4_fragments(p)
    assert [f["n_samples"] for f in out] == [3, 4, 2, 3]
    assert [f["duration_ms"] for f in out] == [330, 360, 200, 300]
    assert [f["total_bytes"] for f in out] == [180, 160, 400, 105]
    assert [f["base_time_ms"] for f in out] == [0, 330, 690, 890]
    assert all(f["contiguous"] for f in out)
    # the closed-form layout the oracle hard-codes
    assert len(build_fmp4(1000, 1, 100, 200, [])) == 519
    pos = 519
    for f, span in zip(out, (96 + 8 * 3, 104, 96, 96 + 4 * 3)):
        assert f["data_start"] == pos + span
        pos = f["data_start"] + f["total_bytes"]

    # truncation breaks the last mdat bound -> whole parse refuses
    with pytest.raises(ValueError):
        parse_fmp4_fragments(p[:-10])
    # a gapped tfdt reports contiguous=False instead of raising
    t = bytearray(p)
    # second fragment's tfdt (version 1, u64 after hdr): bump base time
    second_tfdt = p.find(b"tfdt", p.find(b"tfdt") + 4) + 4
    t[second_tfdt + 4 : second_tfdt + 12] = _struct.pack(">Q", 999)
    gapped = parse_fmp4_fragments(bytes(t))
    assert not gapped[1]["contiguous"] and gapped[1]["base_time_ms"] == 999

    rows = [(1, "video", p, None, None, None),
            (2, "video", p[:-10], None, None, None)]
    got = fmp4_fragments(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    by = {}
    for r in got:
        by.setdefault(r["media_id"], []).append(r)
    assert len(by[1]) == 4 and all(r["decoded"] for r in by[1])
    assert len(by[2]) == 1 and not by[2][0]["decoded"]
    assert [f.name for f in FMP4_FRAGS_SCHEMA.fields][0] == "media_id"


def test_ogg_opus_walk(spark):
    """r14: OGG/Opus — page CRC verification (any flipped bit fails),
    lacing packet reassembly incl. the exact-255 zero terminator,
    sequence/BOS/EOS/continuation consistency, OpusHead fields, and
    granule-clock duration; malformed classes raise ValueError."""
    import struct as _struct

    from octopusdb_spark.functions.ogg import (
        OGG_META_SCHEMA,
        build_ogg_opus,
        ogg_crc,
        ogg_metadata,
        parse_ogg_opus,
    )

    p = build_ogg_opus(0x77, channels=2, preskip=312, input_rate=48000,
                       audio_pages=[(3, 100), (4, 120), (2, 80)])
    m = parse_ogg_opus(p)
    assert m["n_pages"] == 5 and m["n_packets"] == 9
    assert m["channels"] == 2 and m["pre_skip"] == 312
    assert m["duration_ms"] == 9 * 960 * 1000 // 48000
    # spec vector: the CRC of 'OggS' under the OGG polynomial is stable
    assert ogg_crc(b"") == 0 and ogg_crc(b"\x00") == 0

    # integrity: a single flipped bit ANYWHERE fails a page CRC
    for flip_at in (30, 100, len(p) // 2, len(p) - 3):
        t = bytearray(p)
        t[flip_at] ^= 0x10
        with pytest.raises(ValueError):
            parse_ogg_opus(bytes(t))

    # exact-255 packets need the zero lacing terminator
    assert parse_ogg_opus(
        build_ogg_opus(1, audio_pages=[(2, 255)])
    )["n_packets"] == 2

    bad_cases = [
        p[:-5],                      # truncated page body
        p[40:],                      # no BOS capture at start
        p + p[:60],                  # page after EOS / bad sequence
    ]
    for bad in bad_cases:
        with pytest.raises(ValueError):
            parse_ogg_opus(bad)
    # sequence gap: bump a page's seq field (CRC recomputed to isolate
    # the continuity check)
    t = bytearray(p)
    second = p.find(b"OggS", 4)
    t[second + 18 : second + 22] = _struct.pack("<I", 9)
    t[second + 22 : second + 26] = b"\x00" * 4
    nsegs = t[second + 26]
    body_len = sum(t[second + 27 : second + 27 + nsegs])
    page = bytes(t[second : second + 27 + nsegs + body_len])
    t[second + 22 : second + 26] = _struct.pack("<I", ogg_crc(page))
    with pytest.raises(ValueError, match="sequence gap"):
        parse_ogg_opus(bytes(t))

    rows = [(1, "audio", p, None, None, None),
            (2, "audio", p[:-5], None, None, None)]
    out = {
        r["media_id"]: r
        for r in ogg_metadata(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    assert out[1]["decoded"] and out[1]["n_packets"] == 9
    assert not out[2]["decoded"] and out[2]["duration_ms"] is None
    assert [f.name for f in OGG_META_SCHEMA.fields][0] == "media_id"


def test_ogg_multiplexed_stream_selection(spark):
    """r14: multiplexed OGG — the Opus stream is SELECTED among
    interleaved bitstreams (every stream's pages still CRC/sequence
    verified per serial); two Opus streams raise; a new serial without
    BOS raises."""
    from octopusdb_spark.functions.ogg import (
        _page,
        build_ogg_opus,
        parse_ogg_opus,
    )

    p = build_ogg_opus(0x77, channels=2, preskip=312, input_rate=48000,
                       audio_pages=[(3, 100), (4, 120), (2, 80)])
    pages, pos = [], 0
    while pos < len(p):
        nsegs = p[pos + 26]
        end = pos + 27 + nsegs + sum(p[pos + 27 : pos + 27 + nsegs])
        pages.append(p[pos:end])
        pos = end
    other_bos = _page(0x99, 0, 0, 0x02, [b"\x80theora-ish-header"])
    other_eos = _page(0x99, 1, 1000, 0x04, [b"x" * 50])
    mux = pages[0] + other_bos + pages[1] + other_eos + b"".join(pages[2:])
    m = parse_ogg_opus(mux)
    assert m["n_streams"] == 2 and m["serial"] == 0x77
    assert m["n_pages"] == 5 and m["n_packets"] == 9
    assert m["duration_ms"] == 9 * 960 * 1000 // 48000

    with pytest.raises(ValueError, match="multiple Opus"):
        parse_ogg_opus(pages[0] + build_ogg_opus(0x88,
                                                 audio_pages=[(1, 50)]))
    with pytest.raises(ValueError, match="without a BOS"):
        parse_ogg_opus(pages[0] + other_eos)  # 0x99 starts mid-stream
    with pytest.raises(ValueError, match="without an Opus stream"):
        parse_ogg_opus(other_bos + other_eos)


def test_ogg_opus_toc_layer():
    """r15: the Opus TOC-byte layer (RFC 6716 §3.1) — per-packet
    config/mode/stereo/frame-count decode, the TOC clock vs granule
    clock agreement signal, and the malformed-TOC classes."""
    from octopusdb_spark.functions.ogg import (
        _page,
        build_ogg_opus,
        opus_toc_config,
        parse_ogg_opus,
    )

    # code 0, SILK WB 20 ms (config 9), stereo bit set
    m = parse_ogg_opus(build_ogg_opus(
        7, toc_config=9, stereo_flag=True, audio_pages=[(3, 40), (2, 50)]))
    assert (m["n_silk"], m["n_hybrid"], m["n_celt"]) == (5, 0, 0)
    assert m["n_stereo"] == 5 and m["toc_frames"] == 5
    assert m["toc_granule_agree"] and m["toc_duration_ms"] == m["duration_ms"]

    # code 3 with M=2, CELT FB 20 ms: frames double, clocks still agree
    m = parse_ogg_opus(build_ogg_opus(
        7, toc_config=31, frames_per_packet=2, audio_pages=[(4, 30)]))
    assert m["n_celt"] == 4 and m["toc_frames"] == 8
    assert m["toc_granule_agree"] and m["toc_duration_ms"] == 8 * 20

    # granule disagreement is REPORTED, not raised: config 0 is a 10 ms
    # frame but the builder's granule clock advances 960/packet
    m = parse_ogg_opus(build_ogg_opus(
        7, toc_config=0, audio_pages=[(2, 30)]))
    assert not m["toc_granule_agree"]
    assert m["toc_duration_ms"] == 2 * 10 and m["duration_ms"] == 2 * 20

    # the full config table decodes and is internally consistent
    assert opus_toc_config(1) == ("silk", "nb", 960)
    assert opus_toc_config(14) == ("hybrid", "fb", 480)
    assert opus_toc_config(16) == ("celt", "nb", 120)
    with pytest.raises(ValueError):
        opus_toc_config(32)

    # malformed TOC classes raise (loud-fallback contract). Each case
    # replaces the single audio page of a valid file with a hand-built
    # one so the container framing stays intact.
    base = build_ogg_opus(5, preskip=312, audio_pages=[(1, 10)])
    pages, pos = [], 0
    while pos < len(base):
        nsegs = base[pos + 26]
        end = pos + 27 + nsegs + sum(base[pos + 27 : pos + 27 + nsegs])
        pages.append(base[pos:end])
        pos = end
    head2 = pages[0] + pages[1]

    def with_audio(pkt):
        return head2 + _page(5, 2, 312 + 960, 0x04, [pkt])

    cases = [
        (bytes([(11 << 3) | 3, 0]) + b"x" * 5, "zero frames"),
        (bytes([(11 << 3) | 3]), "truncated code-3"),
        (bytes([(11 << 3) | 3, 3]) + b"x" * 9, "exceeds 120 ms"),
        (bytes([(1 << 3) | 1]) + b"x", "odd payload"),
        (b"", "zero-length"),
    ]
    for pkt, msg in cases:
        with pytest.raises(ValueError, match=msg):
            parse_ogg_opus(with_audio(pkt))


def test_fmp4_sidx_walk():
    """r15: the CMAF segment index — v0/v1 field widths, per-reference
    cross-checks against the real moof/mdat layout (prefix-summed
    offsets, exact spans, cross-timescale durations), REPORTED
    misalignment, and the malformed classes that raise."""
    import struct as _struct

    from octopusdb_spark.functions.mp4 import build_fmp4, parse_fmp4_fragments

    frags = [
        {"n_samples": 3, "durations": [100, 110, 120],
         "sizes": [50, 51, 52]},
        {"n_samples": 2, "default_duration": 90, "default_size": 40},
        {"n_samples": 4},
    ]
    # no sidx -> nulls
    for fr in parse_fmp4_fragments(build_fmp4(fragments=frags)):
        assert fr["sidx_ref_size"] is None and fr["sidx_aligned"] is None

    for ver in (0, 1):
        out = parse_fmp4_fragments(
            build_fmp4(fragments=frags, sidx={"version": ver}))
        assert all(fr["sidx_aligned"] is True for fr in out)
        assert all(fr["sidx_dur_ms"] == fr["duration_ms"] for fr in out)
        # declared spans tile the fragment region exactly: everything
        # after the sidx box end is covered by the references
        spans = [fr["sidx_ref_size"] for fr in out]
        p = build_fmp4(fragments=frags, sidx={"version": ver})
        box_start = p.index(b"sidx") - 4
        box_size, = _struct.unpack_from(">I", p, box_start)
        assert sum(spans) == len(p) - (box_start + box_size)

    # a corrupted reference SIZE shifts every later prefix sum: all
    # fragments report misaligned, nothing raises
    p = bytearray(build_fmp4(fragments=frags, sidx={"version": 0}))
    ref0 = p.find(b"sidx") + 28
    w1, = _struct.unpack_from(">I", p, ref0)
    _struct.pack_into(">I", p, ref0, w1 + 5)
    assert [f["sidx_aligned"] for f in parse_fmp4_fragments(bytes(p))] \
        == [False, False, False]

    # a corrupted reference DURATION flags only its own fragment
    p = bytearray(build_fmp4(fragments=frags, sidx={"version": 0}))
    d1 = p.find(b"sidx") + 28 + 12 + 4
    v, = _struct.unpack_from(">I", p, d1)
    _struct.pack_into(">I", p, d1, v + 1)
    assert [f["sidx_aligned"] for f in parse_fmp4_fragments(bytes(p))] \
        == [True, False, True]

    # malformed sidx raises: reference count past the box end
    p = bytearray(build_fmp4(fragments=frags, sidx={"version": 0}))
    cnt_at = p.find(b"sidx") + 24
    _struct.pack_into(">HH", p, cnt_at, 0, 4000)
    with pytest.raises(ValueError, match="past box end"):
        parse_fmp4_fragments(bytes(p))
    # zero timescale raises
    p = bytearray(build_fmp4(fragments=frags, sidx={"version": 0}))
    _struct.pack_into(">I", p, p.find(b"sidx") + 12, 0)
    with pytest.raises(ValueError, match="timescale zero"):
        parse_fmp4_fragments(bytes(p))
