"""Multimodal-column operators — images/audio/video as opaque binary columns
with typed metadata (driver mandate; no reference analog).

The driver testdata has no binary columns, so the payloads are derived
deterministically (utf-8 bytes of `documents.text`). The decode step is
REAL for eight honest containers — WAV PCM, PPM, BMP, PNG (DEFLATE), GIF
(LZW), baseline JPEG (Huffman + DCT), FLAC (Rice), and Y4M video are encoded from the
text bytes and parsed back by the pure-Python decoders in
`functions/multimodal.py` (`multimodal_decode` hash-checks the recovered
sample/pixel moments, `multimodal_video_frames` the per-sampled-frame
moments and timestamps, against DuckDB arithmetic oracles).
Codec-library formats (MP3/MP4/H.264) stay behind the documented stub.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from octopusdb_spark.queries.common import t


def q_multimodal_bytes(spark, sf_dir):
    """Binary-column metadata extraction: byte length, head bytes (the
    "magic number" sniff), and a content digest — all JVM-side byte ops."""
    docs = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("byte_len"),
        F.lower(F.substring(F.hex(payload), 1, 8)).alias("head_hex"),  # first 4 bytes as hex
        F.md5(payload).alias("digest"),
        (F.length(payload) >= 256).alias("exceeds_inline_threshold"),
    ).orderBy("doc_id")


def q_multimodal_chunking(spark, sf_dir):
    """Fixed-size byte chunking: how many 64-byte chunks each payload splits
    into and the size of the tail chunk — the partitioning arithmetic of a
    blob-chunk store (vlog record framing, `kv/file/vlog.go:150-191`)."""
    docs = t(spark, sf_dir, "documents")
    blen = F.length(F.encode(F.col("text"), "utf-8"))
    return docs.select(
        "doc_id",
        blen.alias("byte_len"),
        F.ceil(blen / F.lit(64)).cast("bigint").alias("n_chunks"),
        F.when(blen % 64 == 0, 64).otherwise(blen % 64).alias("tail_chunk_bytes"),
    ).orderBy("doc_id")


def q_multimodal_frame_sample(spark, sf_dir):
    """Video frame-sampling plan run under the gate: documents stand in as
    typed media rows (doc_id % 3 == 2 -> video, duration = n_chars * 10 ms),
    `functions/multimodal.py::frame_sample_plan` explodes each video's
    sample timeline (every 250 ms, metadata only — no decode), and the
    checked output is the per-media frame manifest (count, first/last ts).
    The decode of each sampled frame rides the same mapInPandas path as
    `extract_features`; at 100 TB the plan stage is a pure metadata
    projection + explode, embarrassingly parallel."""
    from octopusdb_spark.functions.multimodal import frame_sample_plan

    docs = t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        (F.col("n_chars") * 10).cast("long").alias("meta_duration_ms"),
    )
    frames = frame_sample_plan(media, every_ms=250)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.min("frame_ts_ms").cast("long").alias("first_ts"),
            F.max("frame_ts_ms").cast("long").alias("last_ts"),
        )
        .orderBy("media_id")
    )


def _doc_media(spark, sf_dir, payload_fn, partitions: int | None = None):
    """Shared builder for every media gate row: the guarded doc set
    (doc_id < 60, 48..599 text bytes — the byte-length guard is mirrored
    EXACTLY in each oracle's WHERE clause: < 48 bytes would make image
    heights zero and the oracles' byte-index ranges are finite, so the
    guard keeps both engines on the same doc set under any testdata
    regeneration) packed into containers executor-side by
    ``payload_fn(doc_id, utf8_bytes) -> (payload, media_type)``. Defining
    the selection predicate and the MEDIA_SCHEMA row assembly ONCE keeps
    the four rows' oracles tied to a single doc-set definition.

    ``partitions``: the documents parquet reads as ONE split at test
    scale, so compute-heavy codecs (the color JPEG lane: ~80 ms per doc)
    would run single-task; a tiny keyed repartition of the 60-row doc
    set fans the encode/decode across workers. At corpus scale the
    source is already many splits and the default (None) applies."""
    from octopusdb_spark.functions.multimodal import MEDIA_SCHEMA

    docs = (
        t(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") < 60)
            & F.octet_length(F.col("text")).between(48, 599)
        )
        .select("doc_id", "text")
    )
    if partitions:
        docs = docs.repartition(partitions, "doc_id")

    def make_media(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict = {f.name: [] for f in MEDIA_SCHEMA.fields}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                payload, mt = payload_fn(int(did), text.encode("utf-8"))
                rows["media_id"].append(int(did))
                rows["media_type"].append(mt)
                rows["payload"].append(payload)
                rows["meta_width"].append(None)
                rows["meta_height"].append(None)
                rows["meta_duration_ms"].append(None)
            yield pd.DataFrame(
                {
                    k: pd.array(v, dtype="Int64")
                    if k in ("meta_width", "meta_height", "meta_duration_ms")
                    else v
                    for k, v in rows.items()
                }
            )

    return docs.mapInPandas(make_media, MEDIA_SCHEMA)


def q_multimodal_decode(spark, sf_dir):
    """REAL media decode round-trip under the correctness gate (VERDICT
    r10 #4): each document's text bytes are packed into an honest
    container — WAV 16-bit PCM (doc_id%6=0: one sample per byte,
    s=(b-128)*256, 8 kHz mono), binary PPM (doc_id%6=1: 16-wide RGB),
    24-bpp BMP (doc_id%6=2: 7-wide RGB, exercising the 4-byte row-stride
    padding), 8-bit RGB PNG (doc_id%6=3: zlib DEFLATE + scanline
    filters — REAL entropy-coded decode via the std lib), GIF87a
    (doc_id%6=4: 8-wide indexed grayscale through the REAL variable-width
    LZW decoder — the second entropy codec), or baseline JPEG
    (doc_id%6=5: one constant 8x8 block per text byte, 2 blocks per row,
    through the REAL Huffman + DCT decoder — the third entropy codec;
    constant blocks make the lossy pipeline's output EXACT arithmetic:
    block value v decodes to clamp(2*floor((v-127)/2) + 128), see
    `decode_jpeg`) — then `extract_features` PARSES the container back
    (header walk, chunk/stride/inflate+unfilter/entropy handling) and
    emits exact integer-accumulated sample/pixel moments. The oracle
    recomputes the same moments from the text bytes arithmetically, so a
    decoder that misreads a header, loses padding bytes, drifts DC
    prediction, or truncates samples hash-mismatches. Both encode and
    decode run executor-side over Arrow batches (mapInPandas) — zero
    driver involvement, the 100 TB shape."""
    from octopusdb_spark.functions.multimodal import (
        encode_bmp,
        encode_gif,
        encode_jpeg,
        encode_png,
        encode_ppm,
        encode_wav,
        extract_features,
    )

    def payload_fn(did, b):
        import numpy as np

        kind = did % 6
        if kind == 0:
            return encode_wav((x - 128) * 256 for x in b), "audio"
        if kind == 1:
            w, h = 16, len(b) // 48
            return encode_ppm(b[: w * h * 3], w, h), "image"
        if kind == 2:
            w, h = 7, len(b) // 21
            return encode_bmp(b[: w * h * 3], w, h), "image"
        if kind == 3:
            w, h = 16, len(b) // 48
            return encode_png(b[: w * h * 3], w, h), "image"
        if kind == 4:
            # GIF is indexed: one GRAY byte per pixel, real LZW path
            w, h = 8, len(b) // 8
            return encode_gif(b[: w * h], w, h), "image"
        # JPEG: one constant 8x8 block per byte — the one geometry where
        # the lossy DCT round-trip stays exact-value checkable
        rows = len(b) // 2
        blocks = np.frombuffer(b[: rows * 2], np.uint8).reshape(rows, 2)
        img = np.kron(blocks, np.ones((8, 8), np.uint8))
        return encode_jpeg(img.tobytes(), 16, rows * 8), "image"

    feats = extract_features(_doc_media(spark, sf_dir, payload_fn))
    return feats.select(
        "media_id",
        "container",
        "decoded",
        "width",
        "height",
        "n_samples",
        "sample_rate",
        F.round("feat_mean", 6).alias("mean_r6"),
        F.round("feat_rms", 6).alias("rms_r6"),
    ).orderBy("media_id")


def q_multimodal_flac(spark, sf_dir):
    """COMPRESSED audio decode under the gate — FLAC, the fourth entropy
    codec family (Rice coding) and the first compressed audio container
    (the WAV lanes are raw PCM). r13: the stream is STEREO with forced
    mid/side decorrelation and LPC-only predictors, so every non-flat
    subframe the gate decodes is an LPC subframe (quantized coefficients
    + arithmetic shift) and every frame exercises the side channel's
    bps+1 path — the subset real-world encoders actually emit. Each
    document byte b becomes one stereo frame: left=(b-128)*256,
    right=((b*3)%256-128)*256, encoded at block_size=128 so every doc
    spans MULTIPLE frames (framing + CRC-8/CRC-16 + Rice residuals all
    exercised per row); `extract_features` parses the stream back
    through `functions/flac.py::decode_flac`. FLAC is LOSSLESS, so the
    oracle is pure sample arithmetic over both channels — no
    constant-block geometry needed (contrast the lossy JPEG lanes): a
    decoder that drops a frame, mis-reconstructs the mid/side inverse,
    mis-shifts an LPC prediction, or mis-reads a Rice partition
    hash-mismatches."""
    from octopusdb_spark.functions.flac import encode_flac
    from octopusdb_spark.functions.multimodal import extract_features

    def payload_fn(did, b):
        inter = []
        for x in b:
            inter.append((x - 128) * 256)
            inter.append(((x * 3) % 256 - 128) * 256)
        return (
            encode_flac(
                inter, 8000, block_size=128, channels=2,
                stereo_mode="mid_side", predictors=("lpc",),
            ),
            "audio",
        )

    # partitions=16 (r16, guide §2.5): FLAC encode+decode is the other
    # per-doc-expensive lane (~35 ms/doc; measured 2.1 s serial, 1.1 s at
    # 8/16-way — wider fan-outs lose to Python-worker startup on the
    # <= 60-row set: 1.6 s at 32). Re-confirmed by an r17 4/8/16/32 sweep
    # on the driver box (warm medians 1.41 / 1.10 / 1.02 / 1.57 s —
    # VERDICT r16 #8).
    feats = extract_features(_doc_media(spark, sf_dir, payload_fn, partitions=16))
    return feats.select(
        "media_id",
        "container",
        "decoded",
        "n_samples",
        "sample_rate",
        F.col("feat_dim").alias("channels"),
        F.round("feat_mean", 6).alias("mean_r6"),
        F.round("feat_rms", 6).alias("rms_r6"),
    ).orderBy("media_id")


def q_multimodal_mp4_meta(spark, sf_dir):
    """MP4/ISO-BMFF box-walk metadata under the gate (VERDICT r12 #5) —
    the container a multimodal crawl actually ships video in. Each doc
    parameterizes a structurally real file via `functions/mp4.py::
    build_mp4` (ftyp + skippable free box + full moov hierarchy + a
    64-bit-largesize mdat): brand alternates isom/mp42 by doc_id parity,
    mvhd version AND timescale ride n's parity (v0@1000 vs v1@90000,
    with duration scaled so duration_ms = n*250 either way — both
    versioned-header layouts are under the hash), track mix cycles by
    doc_id%3 (both / video-only / audio-only), video geometry and codec
    fourccs derive arithmetically from the first text bytes, and
    doc_id%9==4 rows are truncated mid-mdat so the malformed lane's
    loud fallback (decoded=false, null metadata) is ALSO hash-checked.
    r16 adds the udta/meta/ilst TAG layer (VERDICT r15 #5): doc_id%4!=1
    rows carry iTunes-style title/artist/album/date items (pure box
    arithmetic, no entropy decode), doc_id%9==0 rows get their 'data'
    box size corrupted so the tag layer's INDEPENDENT loud lane
    (tag_ok=false, container fields intact) is hash-checked too.
    `parse_mp4`/`parse_mp4_tags` walk the boxes back executor-side
    (mapInPandas) — NO bitstream decode, the documented codec-library
    boundary; the oracle recomputes every field from the text bytes
    arithmetically."""
    import struct as _struct

    from octopusdb_spark.functions.mp4 import build_mp4, mp4_metadata

    def payload_fn(did, b):
        n = len(b)
        version = n % 2  # v0 even, v1 odd — duration_ms identical
        timescale = 1000 if version == 0 else 90000
        duration = n * 250 if version == 0 else n * 250 * 90
        video = None
        if did % 3 != 2:
            video = (
                (b"avc1", b"hev1", b"vp09")[b[2] % 3],
                (b[0] % 64 + 1) * 16,
                (b[1] % 64 + 1) * 16,
            )
        audio = None
        if did % 3 != 1:
            audio = ((b"mp4a", b"opus")[b[2] % 2], 48000)
        tags = None
        if did % 4 != 1 or did % 9 == 0:
            tags = {
                "title": f"title-{did}",
                "artist": f"artist-{b[0] % 7}",
                "album": f"album-{b[1] % 5}",
                "date": str(1980 + did % 40),
            }
        payload = build_mp4(
            b"isom" if did % 2 == 0 else b"mp42",
            timescale, duration, video=video, audio=audio,
            version=version, mdat=b"\x00" * 16, tags=tags,
        )
        if did % 9 == 0:
            # corrupt the ilst 'data' box size: the tag walk raises, the
            # container walk (which never descends there) stays green
            buf = bytearray(payload)
            at = payload.index(b"data") - 4
            _struct.pack_into(
                ">I", buf, at,
                _struct.unpack_from(">I", payload, at)[0] + 7,
            )
            payload = bytes(buf)
        if did % 9 == 4:
            payload = payload[:-6]  # truncate mid-mdat: loud fallback lane
        return payload, "video"

    meta = mp4_metadata(_doc_media(spark, sf_dir, payload_fn))
    return meta.select(
        "media_id", "container", "decoded", "brand", "timescale",
        "duration_ms", "n_tracks", "video_w", "video_h",
        "video_codec", "audio_codec", "tag_ok", "n_tag_items",
        "tag_title", "tag_artist", "tag_album", "tag_date",
    ).orderBy("media_id")


def q_multimodal_mp4_samples(spark, sf_dir):
    """MP4 SAMPLE TABLES under the gate (VERDICT r13 #3) — the per-sample
    timeline half of ISO-BMFF that `multimodal_mp4_meta` stopped short
    of: stts decoding deltas (two-run tables when the track is long
    enough), stsz v0 per-sample size tables (video) and constant-size
    mode (audio), stsc chunk runs, stco (video) AND co64 (audio)
    absolute chunk offsets laid contiguously in mdat by the two-pass
    builder, stss sync-sample cadence (video only — absent stss on
    audio means all-sync, reported NULL). Still pure metadata, no
    entropy decode — this is exactly the walk a crawl pipeline slices
    video with (seek by delta arithmetic, read by chunk offsets).

    One output row PER TRACK, exploded inside the Arrow batch
    (`functions/mp4.py::mp4_track_samples`). Every field is a pure
    function of (doc_id, n, first text bytes); doc_id%9==4 rows are
    truncated so the loud-fallback single-row lane (decoded=false, null
    track fields) is hash-checked too. The parser cross-checks stts vs
    stsz counts, stsc/stco chunk coverage, and offset monotonicity —
    the real muxer-bug classes — so a hash match certifies the whole
    chain, not just the happy path."""
    from octopusdb_spark.functions.mp4 import build_mp4, mp4_track_samples

    def payload_fn(did, b):
        n = len(b)
        n_v = n % 7 + 2
        vs = {
            "stts_runs": (
                [(n_v // 2, 100), (n_v - n_v // 2, 50)] if n_v >= 4
                else [(n_v, 100)]
            ),
            "sizes": [100 + ((i * 7 + b[0]) % 50) for i in range(n_v)],
            "samples_per_chunk": 3,
            "stss_every": 4,
        }
        aus = None
        if did % 2 == 0:
            n_a = n % 5 + 4
            aus = {
                "stts_runs": [(n_a, 1024)],
                "sizes": 192 + b[1] % 64,
                # MULTI-RUN stsc (r14): a short 2-sample head chunk, then
                # 4-sample chunks — the layout real muxers emit; the
                # single-run video track covers the simple path
                "samples_per_chunk": [(1, 2), (2, 4)],
                "co64": True,
            }
        payload = build_mp4(
            b"isom", 1000, 0,
            video=((b"avc1", b"hev1", b"vp09")[b[2] % 3],
                   (b[0] % 64 + 1) * 16, (b[1] % 64 + 1) * 16),
            audio=(b"mp4a", 48000) if aus is not None else None,
            video_samples=vs, audio_samples=aus,
        )
        if did % 9 == 4:
            payload = payload[:-20]  # mdat largesize now overruns: loud lane
        return payload, "video"

    rows = mp4_track_samples(_doc_media(spark, sf_dir, payload_fn))
    return rows.select(
        "media_id", "decoded", "track_id", "handler", "codec", "n_samples",
        "media_timescale", "duration_ms", "total_bytes", "max_sample_bytes",
        "n_chunks", "n_sync", "chunk_span",
    ).orderBy("media_id", F.col("track_id").asc_nulls_first())


GIF_SW, GIF_SH = 32, 20  # animation canvas; 4 non-overlapping 8x8 rects fit


def q_multimodal_gif_frames(spark, sf_dir):
    """ANIMATED GIF multi-frame decode under the gate (VERDICT r13 #7) —
    real frame sampling over a COMPRESSED video-like container (Y4M is
    the uncompressed one; the LZW machinery is r11's). Each doc builds a
    GIF89a animation via `functions/multimodal.py::encode_gif_animation`:
    frame 0 paints the full canvas gray, frames 1..K-1 (K = 3 + n%3, so
    every animation is >= 3 frames) paint NON-OVERLAPPING 8x8 sub-rects;
    odd frames carry LOCAL color tables (i -> (i, 255-i, i//2)) and
    disposal 1 (keep), even frames use the global gray table and
    disposal 2 (restore background) — so the hash covers GCE parsing,
    per-frame palettes, sub-rect painting, AND disposal composition:
    each row's canvas_sum/sumsq are exact integer moments of the
    COMPOSED canvas at that frame, which the oracle replicates in closed
    form (non-overlap makes each prior rect's visible state independent:
    kept rects show their palette color, restored rects show the
    background). doc_id%9==4 rows are truncated so the loud-fallback
    lane is hash-checked. Per-frame explode inside the Arrow batch
    (`gif_frames`), the mp4_track_samples shape."""
    from octopusdb_spark.functions.multimodal import (
        encode_gif_animation,
        gif_frames,
    )

    local_pal = bytes(v for i in range(256) for v in (i, 255 - i, i // 2))

    def payload_fn(did, b):
        n = len(b)
        c0, bg = b[0], b[1]
        frames = [dict(left=0, top=0, w=GIF_SW, h=GIF_SH,
                       pixels=bytes([c0]) * (GIF_SW * GIF_SH),
                       delay_cs=4, disposal=1)]
        for k in range(1, 3 + n % 3):
            ck = (b[0] + 40 * k) % 256
            frames.append(dict(
                left=8 * (k - 1), top=6, w=8, h=8,
                pixels=bytes([ck]) * 64, delay_cs=4 + k,
                disposal=1 if k % 2 == 1 else 2,
                palette=local_pal if k % 2 == 1 else None,
            ))
        payload = encode_gif_animation(GIF_SW, GIF_SH, bg, frames)
        if did % 9 == 4:
            payload = payload[:-8]  # truncate the last sub-blocks: loud lane
        return payload, "image"

    rows = gif_frames(_doc_media(spark, sf_dir, payload_fn))
    return rows.select(
        "media_id", "decoded", "frame_idx", "left", "top", "w", "h",
        "delay_cs", "disposal", "local_palette", "canvas_sum",
        "canvas_sumsq",
    ).orderBy("media_id", F.col("frame_idx").asc_nulls_first())


def q_multimodal_mp4_slice(spark, sf_dir):
    """MP4 time-slice SEEK PLANNING under the gate — the operation the
    sample tables exist FOR (the 'next want' named in VERDICT r13 #3's
    rationale): given a media-time window per clip, emit the video
    samples inside it with their ABSOLUTE byte ranges
    (`functions/mp4.py::mp4_sample_ranges` — stts time walk + stsc/stco
    chunk arithmetic, no bitstream), the plan a training pipeline hands
    to ranged blob reads so the fetch stage touches O(slice bytes).

    Each doc builds a video-only MP4 (two-run stts when long enough,
    stsz size table, stss every 4th sample, and a ctts composition-
    offset table — pairs of samples alternate +50/+0, the B-frame
    reordering shape, so pt_ms = decode time + offset is under the
    hash too); the window rides the text bytes (t0 = (b1%4)*100, span
    150/250/350 ms) and selects by DECODE time (the fetchable unit).
    The oracle replicates ABSOLUTE offsets in closed form: the
    builder's mdat body start is 606 + 8*stts_runs + 8*ctts_runs +
    4*n_v + 4*n_chunks + 4*n_sync (box-size arithmetic, verified
    constant across n_v in pytest), and the single-track contiguous
    layout collapses chunk arithmetic to base + prefix-sum(sizes) —
    while the parser still computes it the chunked way, so a chunk-math
    bug breaks the hash. Truncation lane (doc_id%9==4) hash-checks the
    loud fallback; windows past the clip legitimately plan zero
    reads."""
    from octopusdb_spark.functions.mp4 import build_mp4, mp4_slice_plan

    def payload_fn(did, b):
        n = len(b)
        n_v = n % 7 + 2
        ctts = []
        for k in range((n_v + 1) // 2):
            cnt = min(2, n_v - 2 * k)
            ctts.append((cnt, 50 if k % 2 == 0 else 0))
        vs = {
            "stts_runs": (
                [(n_v // 2, 100), (n_v - n_v // 2, 50)] if n_v >= 4
                else [(n_v, 100)]
            ),
            "sizes": [100 + ((i * 7 + b[0]) % 50) for i in range(n_v)],
            "samples_per_chunk": 3,
            "stss_every": 4,
            "ctts_runs": ctts,
        }
        payload = build_mp4(b"isom", 1000, 0, video=(b"avc1", 320, 240),
                            video_samples=vs)
        if did % 9 == 4:
            payload = payload[:-20]
        return payload, "video"

    # the window derives from the same doc bytes the payload used — join
    # them back under _doc_media's EXACT doc-set guard (<= 60 rows, so
    # the broadcast is a bounded dimension, never an SF-scaled side)
    windows = (
        t(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") < 60)
            & F.octet_length(F.col("text")).between(48, 599)
        )
        .select(
            F.col("doc_id").alias("media_id"),
            (F.ascii(F.substring("text", 2, 1)) % 4 * 100)
            .cast("long").alias("t0_ms"),
            (F.ascii(F.substring("text", 2, 1)) % 4 * 100
             + 150 + F.octet_length("text") % 3 * 100)
            .cast("long").alias("t1_ms"),
        )
    )
    media = _doc_media(spark, sf_dir, payload_fn).join(
        F.broadcast(windows), "media_id"
    )
    rows = mp4_slice_plan(media)
    return rows.select(
        "media_id", "decoded", "sample_idx", "time_ms", "dur_ms", "pt_ms",
        "byte_offset", "size", "sync",
    ).orderBy("media_id", F.col("sample_idx").asc_nulls_first())


def q_multimodal_fmp4_frags(spark, sf_dir):
    """FRAGMENTED MP4 under the gate — the CMAF/DASH layout modern video
    actually ships in (a crawl's media is increasingly fmp4, not
    flat-moov): `functions/mp4.py::parse_fmp4_fragments` walks
    moov/mvex trex defaults then each moof's traf chain (tfhd fragment
    defaults + default-base-is-moof, tfdt base decode time, trun
    per-sample tables), resolving the full trun > tfhd > trex
    precedence. Each doc's file carries one fragment per tier — trun
    (per-sample durations AND sizes), tfhd (fragment defaults), trex
    (track defaults), and a mixed trun-sizes/trex-durations fragment —
    so the precedence chain itself is under the hash, along with
    cumulative tfdt base times, per-fragment byte totals, and the
    ABSOLUTE first-sample offset (closed-form layout: HEAD=519 bytes,
    per-tier moof spans 96/104/96+8n/96+4n — fitted and pinned in
    pytest; the parser additionally bounds-checks every fragment's
    samples inside its mdat). r15 adds the CMAF `sidx` segment index
    (VERDICT r14 #4 — the box DASH players seek with WITHOUT reading
    moofs): even doc_ids carry one (version v0/v1 rides b2, shifting
    the head by 32+12k/40+12k bytes — the data_start arithmetic is
    itself under the hash), and the parser's cross-check of each
    type-0 reference's prefix-summed offset/size/duration against the
    real moof/mdat layout lands in three more hashed columns.
    doc_id%9==4 rows are truncated so the loud-fallback lane is
    hash-checked. Per-fragment explode inside the Arrow batch."""
    from octopusdb_spark.functions.mp4 import build_fmp4, fmp4_fragments

    def payload_fn(did, b):
        n = len(b)
        kf = 2 + n % 3
        n0, n1 = b[0] % 3 + 2, b[1] % 3 + 2
        frags = [
            {"n_samples": n0,
             "durations": [100 + 10 * i for i in range(n0)],
             "sizes": [50 + ((i * 7 + b[0]) % 40) for i in range(n0)]},
            {"n_samples": n1, "default_duration": 90,
             "default_size": 40 + b[1] % 32},
        ]
        if kf >= 3:
            frags.append({"n_samples": 3})
        if kf >= 4:
            n3 = b[2] % 2 + 2
            frags.append({"n_samples": n3,
                          "sizes": [30 + 5 * i for i in range(n3)]})
        payload = build_fmp4(
            1000, 1, trex_duration=100, trex_size=150 + b[2] % 50,
            fragments=frags,
            sidx={"version": b[2] % 2} if did % 2 == 0 else None,
        )
        if did % 9 == 4:
            payload = payload[:-10]  # last mdat bound breaks: loud lane
        return payload, "video"

    rows = fmp4_fragments(_doc_media(spark, sf_dir, payload_fn))
    return rows.select(
        "media_id", "decoded", "frag_idx", "seq", "track_id",
        "base_time_ms", "n_samples", "duration_ms", "total_bytes",
        "data_start", "contiguous", "sidx_ref_size", "sidx_dur_ms",
        "sidx_aligned",
    ).orderBy("media_id", F.col("frag_idx").asc_nulls_first())


def q_multimodal_ogg_meta(spark, sf_dir):
    """OGG/Opus container walk under the gate — the THIRD real-world
    audio format (after MP3 frame headers and real FLAC decode), the one
    modern voice/podcast crawls ship. Each doc builds a structurally
    real file via `functions/ogg.py::build_ogg_opus` (BOS OpusHead +
    OpusTags + K audio pages with lacing-framed packets, every page
    carrying its REAL RFC 3533 CRC32), parameterized from the text
    bytes: channels/pre-skip/input-rate ride b0/b1/b2, page and packet
    counts ride n. `parse_ogg_opus` walks back executor-side VERIFYING
    every page's CRC (a flipped bit anywhere fails the page — integrity
    is part of the hash contract), checks sequence continuity, BOS/EOS
    flags and continuation consistency, reassembles packet counts from
    lacing, and computes exact duration from the final granule minus
    pre-skip at the 48 kHz Opus clock. r15 adds the TOC-byte layer
    (RFC 6716 §3.1): each audio packet's first byte rides a per-doc
    config from the 20 ms family (b3 picks mode/bandwidth), the stereo
    bit follows the channel count, and b1 selects one-frame code-0 vs
    two-frame code-3 packets (with the M-count second byte) — the
    parser's per-packet TOC clock, frame totals, mode distribution and
    TOC-vs-granule agreement are all under the hash. Still no audio
    decode (Opus packets stay behind the codec boundary, like MP3/MP4
    bitstreams); the oracle replicates every field arithmetically;
    doc_id%9==4 rows are truncated so the loud fallback is
    hash-checked."""
    from octopusdb_spark.functions.ogg import (
        OPUS_20MS_CONFIGS,
        build_ogg_opus,
        ogg_metadata,
    )

    def payload_fn(did, b):
        n = len(b)
        kp = n % 3 + 1
        npk = b[0] % 3 + 2
        payload = build_ogg_opus(
            serial=did + 100,
            channels=b[0] % 2 + 1,
            preskip=200 + b[1] % 200,
            input_rate=(8000, 16000, 24000, 48000)[b[2] % 4],
            audio_pages=[(npk, 60 + (b[1] + i * 13) % 60)
                         for i in range(kp)],
            toc_config=OPUS_20MS_CONFIGS[b[3] % 9],
            stereo_flag=b[0] % 2 == 1,
            frames_per_packet=b[1] % 2 + 1,
        )
        if did % 9 == 4:
            payload = payload[:-5]  # truncate the last page: loud lane
        return payload, "audio"

    meta = ogg_metadata(_doc_media(spark, sf_dir, payload_fn))
    return meta.select(
        "media_id", "container", "decoded", "serial", "channels",
        "pre_skip", "input_rate", "n_pages", "n_packets", "duration_ms",
        "toc_frames", "toc_duration_ms", "n_silk", "n_hybrid", "n_celt",
        "n_stereo", "toc_granule_agree",
    ).orderBy("media_id")


def q_multimodal_mp3_meta(spark, sf_dir):
    """MP3 frame-walk metadata under the gate — the audio counterpart of
    `multimodal_mp4_meta`, completing the crawl-media metadata triad
    (video container, audio container, WARC transport). Each doc
    parameterizes a structurally real MPEG-1 Layer III stream via
    `functions/mp3.py::build_mp3`: bitrate/samplerate/channel-mode ride
    the first text bytes through the public ISO 11172-3 tables, frame
    count rides the length, odd doc_ids prepend a syncsafe-sized ID3v2
    tag (the skip path is under the hash because a mis-skip desyncs the
    walk), every third frame sets the padding bit (mis-sizing padding
    desyncs too), and doc_id%9==7 rows are truncated mid-frame so the
    loud fallback is hash-checked. r16 upgrades the tag to REAL ID3v2.3
    text frames (VERDICT r15 #5): odd docs carry title/artist/album/
    year (TIT2 in UTF-16-with-BOM when doc_id%4==1, latin-1 otherwise —
    both encodings under the hash), and doc_id%9==2 rows carry a frame
    whose declared size overruns the tag, so the tag layer's
    INDEPENDENT loud lane (tag_ok=false, audio fields intact) is
    hash-checked too. `parse_mp3` walks EVERY frame header and
    `parse_id3v2_frames` every tag frame, executor-side (mapInPandas) —
    NO entropy decode, the documented codec-library boundary; duration
    is exact header arithmetic the oracle replicates."""
    import struct as _struct

    from octopusdb_spark.functions.mp3 import (
        build_id3v2_frames,
        build_mp3,
        mp3_metadata,
    )

    def payload_fn(did, b):
        n = len(b)
        if did % 9 == 2:
            # declared frame size overruns the tag: the tag walk raises,
            # the syncsafe skip (which reads only the header) stays green
            id3 = b"TIT2" + _struct.pack(">I", 9999) + b"\x00\x00\x00hi"
        elif did % 2 == 1:
            id3 = build_id3v2_frames([
                ("TIT2", f"title-{did}", 1 if did % 4 == 1 else 0),
                ("TPE1", f"artist-{b[0] % 7}"),
                ("TALB", f"album-{b[1] % 5}"),
                ("TYER", str(1980 + did % 40)),
            ])
        else:
            id3 = b""
        payload = build_mp3(
            n_frames=n // 4 + 2,
            bitrate_kbps=(96, 128, 192, 256, 320)[b[0] % 5],
            sample_rate=(44100, 48000, 32000)[b[1] % 3],
            channel_mode=b[2] % 4,
            id3_payload=id3,
            pad_every=3,
        )
        if did % 9 == 7:
            payload = payload[:-5]  # truncate mid-frame: loud fallback lane
        return payload, "audio"

    meta = mp3_metadata(_doc_media(spark, sf_dir, payload_fn))
    return meta.select(
        "media_id", "container", "decoded", "bitrate_kbps", "sample_rate",
        "channel_mode", "n_frames", "n_samples", "duration_ms",
        "tag_ok", "n_tag_frames", "tag_title", "tag_artist",
        "tag_album", "tag_year",
    ).orderBy("media_id")


def q_multimodal_jpeg_color(spark, sf_dir):
    """COLOR JPEG decode under the gate — the full production pipeline
    (JFIF YCbCr transform, 4:2:0 chroma subsampling, interleaved MCU
    scan, per-component DC prediction, nearest upsample, RGB
    reconstruction), made exact-value checkable by the constant-MCU
    geometry: each text byte v becomes one 16x16 MCU of constant RGB
    (v, 255-v, (v*7)%256), so every stage's rounding is pure per-byte
    arithmetic the oracle replicates in SQL — forward YCbCr with
    floor(x+0.5), the q00=16 DC quantization contract per channel, and
    the floor(x+0.5) RGB reconstruction. A decoder that mis-orders the
    MCU interleave, drifts a component's DC prediction, upsamples off
    the grid, or rounds with a different convention hash-mismatches.
    Executor-side mapInPandas both ways, like every media row."""
    from octopusdb_spark.functions.multimodal import (
        encode_jpeg_color,
        extract_features,
    )

    def payload_fn(did, b):
        import numpy as np

        v = np.frombuffer(b, np.uint8).astype(np.int64)
        rgb = np.stack([v, 255 - v, (v * 7) % 256], axis=-1).astype(np.uint8)
        img = np.repeat(np.repeat(rgb[:, None, :], 16, axis=0), 16, axis=1)
        return encode_jpeg_color(img.tobytes(), 16, 16 * len(b)), "image"

    # partitions=16 re-confirmed by an r17 4/8/16/32 sweep on the driver
    # box (warm medians 2.26 / 1.70 / 1.47 / 2.04 s — VERDICT r16 #8)
    feats = extract_features(_doc_media(spark, sf_dir, payload_fn, partitions=16))
    return feats.select(
        "media_id",
        "container",
        "decoded",
        "width",
        "height",
        F.col("feat_dim").alias("channels"),
        F.round("feat_mean", 6).alias("mean_r6"),
        F.round("feat_rms", 6).alias("rms_r6"),
    ).orderBy("media_id")


def q_multimodal_video_frames(spark, sf_dir):
    """REAL video decode + frame sampling under the gate (extends the r11
    decode story to the video class): each document's text bytes are packed
    into a YUV4MPEG2 stream — 4x4 C444 at 25 fps, so every 48 bytes become
    one raw planar frame — then `sample_frame_features` PARSES the stream
    back executor-side (header tokens, FRAME walk) and emits every 2nd
    frame's exact integer-accumulated pixel moments with its timestamp
    (idx * 40 ms at 25 fps). The oracle recomputes the same per-frame
    moments from the text bytes arithmetically, so a decoder that misreads
    the header, loses a FRAME marker, drifts a frame boundary, or
    mis-times a sample hash-mismatches. Both encode and decode run
    executor-side over Arrow batches (mapInPandas); the per-frame explode
    happens INSIDE the batch — the 100 TB shape for video pipelines."""
    from octopusdb_spark.functions.multimodal import (
        encode_y4m,
        sample_frame_features,
    )

    # shared doc-set guard (see _doc_media): >= 48 bytes guarantees at
    # least one complete 4x4 C444 frame
    def payload_fn(did, b):
        frames = [b[f * 48 : (f + 1) * 48] for f in range(len(b) // 48)]
        return encode_y4m(frames, 4, 4, 25, 1), "video"

    frames = sample_frame_features(
        _doc_media(spark, sf_dir, payload_fn), every_n=2
    )
    return frames.select(
        "media_id",
        "frame_idx",
        "frame_ts_ms",
        F.round("frame_mean", 6).alias("mean_r6"),
        F.round("frame_rms", 6).alias("rms_r6"),
    ).orderBy("media_id", "frame_idx")


def q_multimodal_resize(spark, sf_dir):
    """REAL resize under the gate (closes the last stubbed multimodal
    verb): each document's text bytes become a PPM (doc_id%3=0, 16-wide),
    BMP (doc_id%3=1, 7-wide — stride padding in play on BOTH encode
    passes) or PNG (doc_id%3=2, 16-wide, entropy-coded) image;
    `resize_media` decodes the container, nearest-neighbor-resamples to
    6x4, and RE-ENCODES into the same container; `extract_features` then
    parses the resized container back. The oracle replicates the floor
    index mapping arithmetically — destination pixel (r, c) channel k is
    source byte (r*h_src//4 * w_src + c*w_src//6)*3 + k — so a resampler
    that flips rows (BMP bottom-up!), drifts an index, or re-encodes with
    wrong framing hash-mismatches. Decode -> resample -> encode ->
    re-decode all run executor-side over Arrow batches."""
    from octopusdb_spark.functions.multimodal import (
        encode_bmp,
        encode_png,
        encode_ppm,
        extract_features,
        resize_media,
    )

    def payload_fn(did, b):
        kind = did % 3
        if kind == 0:
            w, h = 16, len(b) // 48
            return encode_ppm(b[: w * h * 3], w, h), "image"
        if kind == 1:
            w, h = 7, len(b) // 21
            return encode_bmp(b[: w * h * 3], w, h), "image"
        w, h = 16, len(b) // 48
        return encode_png(b[: w * h * 3], w, h), "image"

    media = _doc_media(spark, sf_dir, payload_fn)
    feats = extract_features(resize_media(media, 6, 4))
    return feats.select(
        "media_id",
        "container",
        "decoded",
        "width",
        "height",
        F.round("feat_mean", 6).alias("mean_r6"),
        F.round("feat_rms", 6).alias("rms_r6"),
    ).orderBy("media_id")


def q_multimodal_resample(spark, sf_dir):
    """REAL audio resample under the gate (the audio analog of
    `multimodal_resize`): each document's text bytes become a mono 16-bit
    PCM WAV at 8 kHz (one sample per byte, s=(b-128)*256);
    `resample_audio` downsamples to 3 kHz with the nearest-neighbor frame
    pick (n_out = 3n/8 frames, output frame i copies input frame
    i*n_in//n_out) and RE-ENCODES as PCM WAV at the new rate;
    `extract_features` parses the resampled container back. The oracle
    replicates the index mapping arithmetically, so a resampler that
    drifts an index, mis-frames the new data chunk, or writes the wrong
    rate hash-mismatches. All executor-side over Arrow batches."""
    from octopusdb_spark.functions.multimodal import (
        encode_wav,
        extract_features,
        resample_audio,
    )

    def payload_fn(did, b):
        return encode_wav(((x - 128) * 256 for x in b), 8000), "audio"

    media = _doc_media(spark, sf_dir, payload_fn)
    feats = extract_features(resample_audio(media, 3000))
    return feats.select(
        "media_id",
        "container",
        "decoded",
        "n_samples",
        "sample_rate",
        F.round("feat_mean", 6).alias("mean_r6"),
        F.round("feat_rms", 6).alias("rms_r6"),
    ).orderBy("media_id")


def warc_document_segments(spark, sf_dir):
    """Shared WARC segment builder for the batch row (`source_warc_ingest`)
    and its stream twin (`stream_warc_ingest`): documents (doc_id < 120)
    packed 16 records per segment via applyInPandas, odd segments written
    in the per-record-gzip .warc.gz layout crawl archives ship. The two
    rows share ONE oracle, and that 'stream and batch agree by
    construction' guarantee rests on them packing IDENTICAL segments —
    defining the builder once makes the invariant structural instead of
    copy-paste discipline."""
    from octopusdb_spark.sources.warc import encode_warc

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 120)
        .select(
            "doc_id", "text", F.floor(F.col("doc_id") / 16).alias("segment")
        )
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        seg = int(pdf["segment"].iloc[0])
        recs = [
            (
                {
                    "WARC-Type": "response",
                    "WARC-Target-URI": f"doc:{int(did)}",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                },
                text.encode("utf-8"),
            )
            for did, text in zip(pdf["doc_id"], pdf["text"])
        ]
        return pd.DataFrame(
            {
                "source_id": [seg],
                "payload": [encode_warc(recs, gzip_per_record=bool(seg % 2))],
            }
        )

    return docs.groupBy("segment").applyInPandas(
        build, "source_id long, payload binary"
    )


def warc_cdx_segments(spark, sf_dir):
    """Shared CDX-indexed segment builder for the batch row
    (`source_warc_cdx`) and its stream twin (`stream_warc_cdx`):
    documents (doc_id < 120) packed 16 per plain-framed segment via
    `encode_warc_indexed`, which MEASURES each record's (offset, length)
    while writing; the per-segment CDX rides as an array column. One
    builder, one checkpoint (8 segments) — the two rows' shared oracle
    rests on them indexing IDENTICAL segments, so the invariant is
    structural (the warc_document_segments discipline)."""
    from octopusdb_spark.sources.warc import encode_warc_indexed

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 120)
        .select(
            "doc_id", "text", F.floor(F.col("doc_id") / 16).alias("segment")
        )
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        seg = int(pdf["segment"].iloc[0])
        recs = [
            (
                {
                    "WARC-Type": "response",
                    "WARC-Target-URI": f"doc:{int(did)}",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                },
                text.encode("utf-8"),
            )
            for did, text in zip(pdf["doc_id"], pdf["text"])
        ]
        payload, idx = encode_warc_indexed(recs)
        cdx = [
            {"uri": f"doc:{int(did)}", "offset": off, "length": ln}
            for did, (off, ln) in zip(pdf["doc_id"], idx)
        ]
        return pd.DataFrame(
            {"source_id": [seg], "payload": [payload], "cdx": [cdx]}
        )

    return (
        docs.groupBy("segment")
        .applyInPandas(
            build,
            "source_id long, payload binary, "
            "cdx array<struct<uri string, offset long, length long>>",
        )
        .localCheckpoint(eager=True)
    )


def warc_cdx_selection(seg):
    """The shared targeted-re-crawl selection (doc_id % 4 == 1) pulled
    from the segment frame's CDX column — defined once so batch and
    stream read the same index rows."""
    return (
        seg.select("source_id", F.explode("cdx").alias("e"))
        .select("source_id", "e.uri", "e.offset", "e.length")
        .filter(F.split("uri", ":").getItem(1).cast("long") % 4 == 1)
    )


def q_source_warc_cdx(spark, sf_dir):
    """CDX-indexed WARC random access under the gate (VERDICT r11 #7):
    real crawl archives ship a CDX offset index, and a targeted re-crawl
    reads (segment, offset, length) triples instead of scanning whole
    segments. Documents (doc_id < 120, 16 per segment, plain framing)
    are packed with `encode_warc_indexed`, which MEASURES each record's
    byte position while writing; the query selects doc_id % 4 == 1
    through the index and `read_warc_cdx` prunes to segments with hits,
    slices exactly the addressed ranges, and parses one record per
    range. The checked output includes the raw offset/length, which the
    oracle recomputes ARITHMETICALLY from the framing (record size =
    107 + len(uri) + len(digits(clen)) + clen, prefix-summed per
    segment in doc order) — so a framing drift, an off-by-one slice, or
    a stale index hash-mismatches, not just the recovered content.
    Plain framing keeps the offsets SQL-computable; gzip-member
    addressing rides the same API and is pytest-pinned instead."""
    from octopusdb_spark.sources.warc import read_warc_cdx

    seg = warc_cdx_segments(spark, sf_dir)
    sel = warc_cdx_selection(seg)
    recs = read_warc_cdx(seg.select("source_id", "payload"), sel)
    return recs.select(
        F.split("target_uri", ":").getItem(1).cast("long").alias("doc_id"),
        "offset",
        "length",
        F.length("content").cast("long").alias("content_len"),
        F.md5("content").alias("digest"),
    ).orderBy("doc_id")


def warc_record_report(records):
    """Shared checked-output projection for both WARC rows: URI-embedded
    doc_id, Content-Length framing, content digest."""
    return records.select(
        F.split(F.col("target_uri"), ":").getItem(1).cast("long").alias("doc_id"),
        "warc_type",
        F.length("content").cast("long").alias("content_len"),
        F.md5("content").alias("digest"),
    )


def q_source_warc_ingest(spark, sf_dir):
    """WARC crawl-archive ingest round trip under the gate (Part-B source
    surface, `sources/warc.py`): documents are packed into WARC/1.0
    segments executor-side (`warc_document_segments` — 16 records per
    segment, odd segments per-record-gzip), then `read_warc` parses the
    segments back in parallel (mapInPandas record walk; gzip members
    chained with std-lib zlib) and the checked output recovers each
    record's URI-embedded doc_id, its Content-Length framing, and a
    content digest. A parser that drifts a record boundary, mis-frames a
    body, drops a gzip member, or mangles content bytes hash-mismatches.
    At 100 TB the segments come from binaryFile (one crawl file per row)
    and this exact plan shape holds: per-segment parallelism, per-record
    explode inside the Arrow batch."""
    from octopusdb_spark.sources.warc import read_warc

    blobs = warc_document_segments(spark, sf_dir)
    return warc_record_report(read_warc(blobs)).orderBy("doc_id")


ORACLES = {
    # arithmetic replication of decode -> nearest-neighbor resample ->
    # re-encode -> re-decode: destination pixel (r,c) channel k reads the
    # source byte at (r*hs//4 * ws + c*ws//6)*3 + k (0-based), exact
    # integer sums over the 72 resampled bytes per image
    "multimodal_resize": """
    WITH src AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    dims AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 3 = 1 THEN 7 ELSE 16 END AS ws,
             CASE WHEN doc_id % 3 = 1 THEN n // 21 ELSE n // 48 END AS hs,
             CASE doc_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp'
                  ELSE 'png' END AS container
      FROM src
    ),
    px AS (
      SELECT d.doc_id, d.container,
             ascii(substr(d.text,
               CAST(((r.r * d.hs) // 4) * d.ws * 3
                    + ((c.c * d.ws) // 6) * 3 + ch.ch + 1 AS INT), 1)) AS v
      FROM dims d
      CROSS JOIN range(0, 4) r(r)
      CROSS JOIN range(0, 6) c(c)
      CROSS JOIN range(0, 3) ch(ch)
    )
    SELECT doc_id AS media_id, container, TRUE AS decoded,
           CAST(6 AS INT) AS width, CAST(4 AS INT) AS height,
           round(sum(v) / 72.0, 6) AS mean_r6,
           round(sqrt(sum(v * v) / 72.0), 6) AS rms_r6
    FROM px GROUP BY doc_id, container ORDER BY media_id""",
    # arithmetic replication of the audio resample: n_out = 3n/8 output
    # samples, output sample i reads source byte (i*n)//n_out + 1 and
    # scales (v-128)*256 — exact integer sums, one division + sqrt
    "multimodal_resample": """
    WITH src AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             (octet_length(encode(text)) * 3) // 8 AS n_out
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    smp AS (
      SELECT s.doc_id, s.n_out,
             (ascii(substr(s.text,
                CAST((t.i * s.n) // s.n_out + 1 AS INT), 1)) - 128) * 256 AS v
      FROM src s CROSS JOIN range(0, 250) t(i)
      WHERE t.i < s.n_out
    )
    SELECT doc_id AS media_id, 'wav' AS container, TRUE AS decoded,
           CAST(n_out AS BIGINT) AS n_samples, CAST(3000 AS INT) AS sample_rate,
           round(sum(v) / CAST(n_out AS DOUBLE), 6) AS mean_r6,
           round(sqrt(sum(CAST(v AS BIGINT) * v) / CAST(n_out AS DOUBLE)), 6)
             AS rms_r6
    FROM smp GROUP BY doc_id, n_out ORDER BY media_id""",
    # FLAC is lossless (stereo mid/side + LPC included), so the oracle is
    # pure sample arithmetic over BOTH channels (no per-codec geometry):
    # per byte v, left=(v-128)*256 and right=((v*3)%256-128)*256, moments
    # over the 2n interleaved samples
    "multimodal_flac": """
    WITH src AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    b AS (
      SELECT s.doc_id, s.n,
             (ascii(substr(s.text, CAST(t.i AS INT), 1)) - 128) * 256 AS l,
             ((ascii(substr(s.text, CAST(t.i AS INT), 1)) * 3) % 256 - 128)
               * 256 AS r
      FROM src s CROSS JOIN range(1, 600) t(i)
      WHERE t.i <= s.n
    )
    SELECT doc_id AS media_id, 'flac' AS container, TRUE AS decoded,
           CAST(n AS BIGINT) AS n_samples, CAST(8000 AS INT) AS sample_rate,
           CAST(2 AS INT) AS channels,
           round(sum(l + r) / CAST(2 * n AS DOUBLE), 6) AS mean_r6,
           round(sqrt(sum(CAST(l AS BIGINT) * l + CAST(r AS BIGINT) * r)
                      / CAST(2 * n AS DOUBLE)), 6) AS rms_r6
    FROM b GROUP BY doc_id, n ORDER BY media_id""",
    # arithmetic replication of the color JPEG pipeline: per byte v the
    # constant MCU (v, 255-v, v*7%256) goes forward-YCbCr (floor(x+0.5)),
    # per-channel q00=16 DC quantize/decode (clamp(2*floor((c-127)/2)+128)),
    # then floor(x+0.5) RGB reconstruction — identical double expressions
    # in both engines, so the compare is bit-exact
    "multimodal_jpeg_color": """
    WITH src AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    b AS (
      SELECT s.doc_id, s.n,
             ascii(substr(s.text, CAST(t.i AS INT), 1)) AS v
      FROM src s CROSS JOIN range(1, 600) t(i)
      WHERE t.i <= s.n
    ),
    fwd AS (
      SELECT doc_id, n,
             v AS r, 255 - v AS g, (v * 7) % 256 AS bb
      FROM b
    ),
    ycc AS (
      SELECT doc_id, n,
             least(greatest(CAST(floor(0.299*r + 0.587*g + 0.114*bb + 0.5)
                                 AS BIGINT), 0), 255) AS y,
             least(greatest(CAST(floor(128.0 - 0.168736*r - 0.331264*g
                                       + 0.5*bb + 0.5) AS BIGINT), 0), 255) AS cb,
             least(greatest(CAST(floor(128.0 + 0.5*r - 0.418688*g
                                       - 0.081312*bb + 0.5) AS BIGINT), 0), 255) AS cr
      FROM fwd
    ),
    dec AS (
      SELECT doc_id, n,
             least(greatest(CAST(floor((y - 127) / 2.0) AS BIGINT) * 2 + 128,
                            0), 255) AS y2,
             least(greatest(CAST(floor((cb - 127) / 2.0) AS BIGINT) * 2 + 128,
                            0), 255) AS cb2,
             least(greatest(CAST(floor((cr - 127) / 2.0) AS BIGINT) * 2 + 128,
                            0), 255) AS cr2
      FROM ycc
    ),
    rgb AS (
      SELECT doc_id, n,
             least(greatest(CAST(floor(y2 + 1.402*(cr2 - 128.0) + 0.5)
                                 AS BIGINT), 0), 255) AS r2,
             least(greatest(CAST(floor(y2 - 0.344136*(cb2 - 128.0)
                                       - 0.714136*(cr2 - 128.0) + 0.5)
                                 AS BIGINT), 0), 255) AS g2,
             least(greatest(CAST(floor(y2 + 1.772*(cb2 - 128.0) + 0.5)
                                 AS BIGINT), 0), 255) AS b2
      FROM dec
    )
    SELECT doc_id AS media_id, 'jpeg' AS container, TRUE AS decoded,
           CAST(16 AS INT) AS width, CAST(16 * n AS INT) AS height,
           CAST(3 AS INT) AS channels,
           round(sum(r2 + g2 + b2) / CAST(3 * n AS DOUBLE), 6) AS mean_r6,
           round(sqrt(sum(r2*r2 + g2*g2 + b2*b2) / CAST(3 * n AS DOUBLE)), 6)
             AS rms_r6
    FROM rgb GROUP BY doc_id, n ORDER BY media_id""",
    # arithmetic replication of the CDX index: encode_warc_record frames
    # a record as 107 + len(uri) + len(digits(content_len)) + content_len
    # bytes (version line + 3 named headers + Content-Length + CRLF
    # separators), and offsets are that size prefix-summed per segment in
    # doc order — measured bytes (Spark) vs computed bytes (oracle)
    "source_warc_cdx": """
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS clen,
             doc_id // 16 AS segment
      FROM documents WHERE doc_id < 120
    ),
    sized AS (
      SELECT doc_id, text, segment, clen,
             107 + length('doc:' || CAST(doc_id AS VARCHAR))
                 + length(CAST(clen AS VARCHAR)) + clen AS rec_len
      FROM d
    ),
    pos AS (
      SELECT doc_id, text, clen, rec_len,
             CAST(coalesce(sum(rec_len) OVER (
               PARTITION BY segment ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS record_offset
      FROM sized
    )
    SELECT doc_id, record_offset AS offset,
           CAST(rec_len AS BIGINT) AS length,
           CAST(clen AS BIGINT) AS content_len,
           md5(text) AS digest
    FROM pos WHERE doc_id % 4 = 1 ORDER BY doc_id""",
    # the WARC framing is deterministic, so the oracle is the source rows
    # themselves: URI-embedded id, byte length, content digest
    "source_warc_ingest": """
        SELECT doc_id, 'response' AS warc_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS content_len,
               md5(text) AS digest
        FROM documents WHERE doc_id < 120 ORDER BY doc_id""",
    # arithmetic replication of encode+decode: byte values via ascii() on
    # the (all-ASCII) text, exact integer sums, one double division + sqrt
    "multimodal_decode": """
    WITH src AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    b AS (
      SELECT s.doc_id, s.n, t.i,
             ascii(substr(s.text, CAST(t.i AS INT), 1)) AS v
      FROM src s CROSS JOIN range(1, 600) t(i)
      WHERE t.i <= s.n
    ),
    aud AS (
      SELECT doc_id, n AS n_samples,
             sum((v - 128) * 256) AS s1,
             sum(CAST((v - 128) * 256 AS BIGINT) * ((v - 128) * 256)) AS s2
      FROM b WHERE doc_id % 6 = 0 GROUP BY doc_id, n
    ),
    img AS (
      SELECT doc_id,
             CASE WHEN doc_id % 6 = 2 THEN 7 ELSE 16 END AS w,
             CASE WHEN doc_id % 6 = 2 THEN n // 21 ELSE n // 48 END AS h
      FROM src WHERE doc_id % 6 IN (1, 2, 3)
    ),
    imgstats AS (
      SELECT i2.doc_id, i2.w, i2.h, i2.w * i2.h * 3 AS need,
             sum(b.v) AS s1, sum(b.v * b.v) AS s2
      FROM img i2 JOIN b ON b.doc_id = i2.doc_id AND b.i <= i2.w * i2.h * 3
      GROUP BY i2.doc_id, i2.w, i2.h
    ),
    -- GIF: 8-wide indexed grayscale — each text byte is one pixel index
    -- mapped to (v,v,v), so the RGB moments equal the byte moments
    gifstats AS (
      SELECT s.doc_id, s.n // 8 AS h, (s.n // 8) * 8 AS need,
             sum(b.v) AS s1, sum(b.v * b.v) AS s2
      FROM src s JOIN b ON b.doc_id = s.doc_id AND b.i <= (s.n // 8) * 8
      WHERE s.doc_id % 6 = 4
      GROUP BY s.doc_id, s.n
    ),
    -- JPEG: one constant 8x8 block per byte (2 blocks per 16-wide row);
    -- under the Annex-K table (q00=16) block value v decodes to exactly
    -- clamp(2*floor((v-127)/2) + 128, 0, 255), every pixel of the block
    -- equal, so pixel moments = block-value moments
    jpg AS (
      SELECT s.doc_id, (s.n // 2) * 8 AS h, s.n // 2 * 2 AS nblk,
             least(greatest(
               CAST(floor((b.v - 127) / 2.0) AS BIGINT) * 2 + 128,
               0), 255) AS p
      FROM src s JOIN b ON b.doc_id = s.doc_id AND b.i <= s.n // 2 * 2
      WHERE s.doc_id % 6 = 5
    ),
    jpgstats AS (
      SELECT doc_id, h, nblk, sum(p) AS s1, sum(p * p) AS s2
      FROM jpg GROUP BY doc_id, h, nblk
    )
    SELECT doc_id AS media_id, 'wav' AS container, TRUE AS decoded,
           CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST(8000 AS INT) AS sample_rate,
           round(s1 / CAST(n_samples AS DOUBLE), 6) AS mean_r6,
           round(sqrt(s2 / CAST(n_samples AS DOUBLE)), 6) AS rms_r6
    FROM aud
    UNION ALL
    SELECT doc_id AS media_id,
           CASE doc_id % 6 WHEN 1 THEN 'ppm' WHEN 2 THEN 'bmp'
                ELSE 'png' END AS container,
           TRUE AS decoded,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(NULL AS BIGINT) AS n_samples, CAST(NULL AS INT) AS sample_rate,
           round(s1 / CAST(need AS DOUBLE), 6) AS mean_r6,
           round(sqrt(s2 / CAST(need AS DOUBLE)), 6) AS rms_r6
    FROM imgstats
    UNION ALL
    SELECT doc_id AS media_id, 'gif' AS container, TRUE AS decoded,
           CAST(8 AS INT) AS width, CAST(h AS INT) AS height,
           CAST(NULL AS BIGINT) AS n_samples, CAST(NULL AS INT) AS sample_rate,
           round(s1 / CAST(need AS DOUBLE), 6) AS mean_r6,
           round(sqrt(s2 / CAST(need AS DOUBLE)), 6) AS rms_r6
    FROM gifstats
    UNION ALL
    SELECT doc_id AS media_id, 'jpeg' AS container, TRUE AS decoded,
           CAST(16 AS INT) AS width, CAST(h AS INT) AS height,
           CAST(NULL AS BIGINT) AS n_samples, CAST(NULL AS INT) AS sample_rate,
           round(s1 / CAST(nblk AS DOUBLE), 6) AS mean_r6,
           round(sqrt(s2 / CAST(nblk AS DOUBLE)), 6) AS rms_r6
    FROM jpgstats
    ORDER BY media_id""",
    # arithmetic replication of the Y4M encode + per-frame decode: frame f
    # covers text bytes [f*48+1 .. f*48+48] (1-based), sampled frames are
    # the even indices, ts = f * 40 ms at 25 fps — exact integer sums, one
    # double division + sqrt per frame
    "multimodal_video_frames": """
    WITH src AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    b AS (
      SELECT s.doc_id, s.n,
             CAST((t.i - 1) // 48 AS INT) AS frame_idx,
             ascii(substr(s.text, CAST(t.i AS INT), 1)) AS v
      FROM src s CROSS JOIN range(1, 600) t(i)
      WHERE t.i <= (s.n // 48) * 48
    )
    SELECT doc_id AS media_id, frame_idx,
           CAST(frame_idx * 40 AS BIGINT) AS frame_ts_ms,
           round(sum(v) / 48.0, 6) AS mean_r6,
           round(sqrt(sum(v * v) / 48.0), 6) AS rms_r6
    FROM b
    WHERE frame_idx % 2 = 0
    GROUP BY doc_id, frame_idx
    ORDER BY media_id, frame_idx""",
    "multimodal_frame_sample": """
        SELECT doc_id AS media_id,
               CAST((n_chars * 10) // 250 + 1 AS BIGINT) AS n_frames,
               CAST(0 AS BIGINT) AS first_ts,
               CAST(((n_chars * 10) // 250) * 250 AS BIGINT) AS last_ts
        FROM documents
        WHERE doc_id % 3 = 2
        ORDER BY media_id""",
    # arithmetic replication of the MP4 box-walk: every metadata field is
    # a pure function of (doc_id, n, first text bytes) by construction —
    # the parser's versioned mvhd/tkhd walk, track mix, and truncated-mdat
    # fallback lane are all under the hash
    "multimodal_mp4_meta": """
    WITH src AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             ascii(substr(text, 1, 1)) AS b0,
             ascii(substr(text, 2, 1)) AS b1,
             ascii(substr(text, 3, 1)) AS b2
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    )
    SELECT doc_id AS media_id, 'mp4' AS container,
           (doc_id % 9 != 4) AS decoded,
           CASE WHEN doc_id % 9 = 4 THEN NULL
                WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
           CAST(CASE WHEN doc_id % 9 = 4 THEN NULL
                WHEN n % 2 = 0 THEN 1000 ELSE 90000 END AS INT) AS timescale,
           CAST(CASE WHEN doc_id % 9 = 4 THEN NULL
                ELSE n * 250 END AS BIGINT) AS duration_ms,
           CAST(CASE WHEN doc_id % 9 = 4 THEN NULL
                WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INT) AS n_tracks,
           CAST(CASE WHEN doc_id % 9 = 4 OR doc_id % 3 = 2 THEN NULL
                ELSE (b0 % 64 + 1) * 16 END AS INT) AS video_w,
           CAST(CASE WHEN doc_id % 9 = 4 OR doc_id % 3 = 2 THEN NULL
                ELSE (b1 % 64 + 1) * 16 END AS INT) AS video_h,
           CASE WHEN doc_id % 9 = 4 OR doc_id % 3 = 2 THEN NULL
                WHEN b2 % 3 = 0 THEN 'avc1'
                WHEN b2 % 3 = 1 THEN 'hev1' ELSE 'vp09' END AS video_codec,
           CASE WHEN doc_id % 9 = 4 OR doc_id % 3 = 1 THEN NULL
                WHEN b2 % 2 = 0 THEN 'mp4a' ELSE 'opus' END AS audio_codec,
           CASE WHEN doc_id % 9 = 4 THEN NULL
                ELSE doc_id % 9 != 0 END AS tag_ok,
           CAST(CASE WHEN doc_id % 9 IN (4, 0) THEN NULL
                WHEN doc_id % 4 = 1 THEN 0 ELSE 4 END AS INT) AS n_tag_items,
           CASE WHEN doc_id % 9 IN (4, 0) OR doc_id % 4 = 1 THEN NULL
                ELSE 'title-' || doc_id END AS tag_title,
           CASE WHEN doc_id % 9 IN (4, 0) OR doc_id % 4 = 1 THEN NULL
                ELSE 'artist-' || (b0 % 7) END AS tag_artist,
           CASE WHEN doc_id % 9 IN (4, 0) OR doc_id % 4 = 1 THEN NULL
                ELSE 'album-' || (b1 % 5) END AS tag_album,
           CASE WHEN doc_id % 9 IN (4, 0) OR doc_id % 4 = 1 THEN NULL
                ELSE CAST(1980 + doc_id % 40 AS VARCHAR) END AS tag_date
    FROM src ORDER BY media_id""",
    # arithmetic replication of the OGG/Opus walk: every field is a pure
    # function of (doc_id, n, first text bytes); the CRC/lacing/flag
    # machinery is what the parser must get right to SEE these values
    "multimodal_ogg_meta": """
    WITH src AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             ascii(substr(text, 1, 1)) AS b0,
             ascii(substr(text, 2, 1)) AS b1,
             ascii(substr(text, 3, 1)) AS b2,
             ascii(substr(text, 4, 1)) AS b3
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    p AS (
      SELECT doc_id, n % 3 + 1 AS kp, b0 % 3 + 2 AS npk,
             b0 % 2 + 1 AS ch, 200 + b1 % 200 AS ps,
             CASE b2 % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                         WHEN 2 THEN 24000 ELSE 48000 END AS rate,
             b1 % 2 + 1 AS m,
             -- b3 % 9 indexes (1,5,9,13,15,19,23,27,31): 0-2 SILK,
             -- 3-4 Hybrid, 5-8 CELT — all 20 ms configs
             b3 % 9 AS ci,
             b0 % 2 AS st
      FROM src WHERE doc_id % 9 != 4
    )
    SELECT doc_id AS media_id, 'ogg' AS container,
           (doc_id % 9 != 4) AS decoded,
           CAST(CASE WHEN doc_id % 9 = 4 THEN NULL
                ELSE doc_id + 100 END AS BIGINT) AS serial,
           CAST(ch AS INT) AS channels,
           CAST(ps AS INT) AS pre_skip,
           CAST(rate AS INT) AS input_rate,
           CAST(kp + 2 AS INT) AS n_pages,
           CAST(kp * npk AS BIGINT) AS n_packets,
           CAST(kp * npk * m * 20 AS BIGINT) AS duration_ms,
           CAST(kp * npk * m AS BIGINT) AS toc_frames,
           CAST(kp * npk * m * 20 AS BIGINT) AS toc_duration_ms,
           CAST(CASE WHEN ci <= 2 THEN kp * npk ELSE 0 END AS INT) AS n_silk,
           CAST(CASE WHEN ci IN (3, 4) THEN kp * npk ELSE 0 END AS INT)
               AS n_hybrid,
           CAST(CASE WHEN ci >= 5 THEN kp * npk ELSE 0 END AS INT) AS n_celt,
           CAST(CASE WHEN st = 1 THEN kp * npk ELSE 0 END AS INT) AS n_stereo,
           TRUE AS toc_granule_agree
    FROM p
    UNION ALL
    SELECT doc_id, 'ogg', FALSE, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL, NULL, NULL, NULL
    FROM src WHERE doc_id % 9 = 4
    ORDER BY media_id""",
    # closed-form replication of the fmp4 fragment walk: one CTE per
    # precedence tier (trun / tfhd / trex / mixed), the trun tier's
    # per-sample sums via lateral unnest, then cumulative windows give
    # tfdt base times and absolute data_start offsets (HEAD 519 +
    # per-tier moof spans, fitted and pinned in pytest)
    "multimodal_fmp4_frags": """
    WITH src AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             ascii(substr(text, 1, 1)) AS b0,
             ascii(substr(text, 2, 1)) AS b1,
             ascii(substr(text, 3, 1)) AS b2
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    ok AS (
      SELECT doc_id, b0, b1, b2, 2 + n % 3 AS kf,
             b0 % 3 + 2 AS n0, b1 % 3 + 2 AS n1, b2 % 2 + 2 AS n3,
             150 + b2 % 50 AS xsize
      FROM src WHERE doc_id % 9 != 4
    ),
    sx AS (  -- sidx head shift: v0 = 32+12k, v1 = 40+12k, odd docs none
      SELECT doc_id,
             (doc_id % 2 = 0) AS has_sidx,
             CASE WHEN doc_id % 2 = 0
                  THEN (CASE WHEN b2 % 2 = 1 THEN 40 ELSE 32 END) + 12 * kf
                  ELSE 0 END AS sdelta
      FROM ok
    ),
    f0sums AS (
      SELECT o.doc_id,
             sum(50 + (CAST(t.i AS BIGINT) * 7 + o.b0) % 40) AS bytes0
      FROM ok o, unnest(range(o.n0)) AS t(i) GROUP BY o.doc_id
    ),
    tiers AS (
      SELECT o.doc_id, 0 AS frag_idx, CAST(o.n0 AS BIGINT) AS n_samples,
             CAST(100 * o.n0 + 10 * o.n0 * (o.n0 - 1) // 2 AS BIGINT)
               AS duration_ms,
             CAST(s.bytes0 AS BIGINT) AS total_bytes,
             CAST(96 + 8 * o.n0 AS BIGINT) AS hspan
      FROM ok o JOIN f0sums s USING (doc_id)
      UNION ALL
      SELECT doc_id, 1, CAST(n1 AS BIGINT),
             CAST(90 * n1 AS BIGINT),
             CAST(n1 * (40 + b1 % 32) AS BIGINT),
             CAST(104 AS BIGINT)
      FROM ok
      UNION ALL
      SELECT doc_id, 2, CAST(3 AS BIGINT),
             CAST(300 AS BIGINT), CAST(3 * xsize AS BIGINT),
             CAST(96 AS BIGINT)
      FROM ok WHERE kf >= 3
      UNION ALL
      SELECT doc_id, 3, CAST(n3 AS BIGINT),
             CAST(100 * n3 AS BIGINT),
             CAST(30 * n3 + 5 * n3 * (n3 - 1) // 2 AS BIGINT),
             CAST(96 + 4 * n3 AS BIGINT)
      FROM ok WHERE kf >= 4
    ),
    placed AS (
      SELECT doc_id AS media_id, TRUE AS decoded,
             CAST(frag_idx AS INT) AS frag_idx,
             CAST(frag_idx + 1 AS INT) AS seq, 1 AS track_id,
             CAST(coalesce(sum(duration_ms) OVER (
               PARTITION BY doc_id ORDER BY frag_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS base_time_ms,
             n_samples, duration_ms, total_bytes,
             CAST(519 + sx.sdelta
                  + sum(hspan) OVER (
                      PARTITION BY doc_id ORDER BY frag_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  + coalesce(sum(total_bytes) OVER (
                      PARTITION BY doc_id ORDER BY frag_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS data_start,
             TRUE AS contiguous,
             CAST(CASE WHEN sx.has_sidx THEN hspan + total_bytes END
               AS BIGINT) AS sidx_ref_size,
             CAST(CASE WHEN sx.has_sidx THEN duration_ms END
               AS BIGINT) AS sidx_dur_ms,
             CASE WHEN sx.has_sidx THEN TRUE END AS sidx_aligned
      FROM tiers JOIN sx USING (doc_id)
    ),
    fallback AS (
      SELECT doc_id AS media_id, FALSE AS decoded, CAST(NULL AS INT),
             CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BIGINT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
             CAST(NULL AS BOOLEAN), CAST(NULL AS BIGINT),
             CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN)
      FROM src WHERE doc_id % 9 = 4
    )
    SELECT * FROM placed UNION ALL SELECT * FROM fallback
    ORDER BY media_id, frag_idx ASC NULLS FIRST""",
    # closed-form replication of the MP4 seek plan: sample times from the
    # two-run stts arithmetic, sizes from the stsz formula, ABSOLUTE
    # offsets as builder-base (590 + 8*runs + 4*nv + 4*nc + 4*ns — box
    # size arithmetic pinned by pytest) + prefix-sum of sizes; the
    # window predicate and stss cadence are under the hash
    "multimodal_mp4_slice": """
    WITH src AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             ascii(substr(text, 1, 1)) AS b0,
             ascii(substr(text, 2, 1)) AS b1
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    ok AS (
      SELECT doc_id, b0,
             n % 7 + 2 AS nv,
             (b1 % 4) * 100 AS t0,
             (b1 % 4) * 100 + 150 + (n % 3) * 100 AS t1,
             606 + 8 * (CASE WHEN n % 7 + 2 >= 4 THEN 2 ELSE 1 END)
                 + 8 * ((n % 7 + 2 + 1) // 2)
                 + 4 * (n % 7 + 2)
                 + 4 * ((n % 7 + 2 + 2) // 3)
                 + 4 * ((n % 7 + 2 + 3) // 4) AS base
      FROM src WHERE doc_id % 9 != 4
    ),
    samples AS (
      SELECT o.doc_id, o.t0, o.t1, o.base, CAST(t.i AS BIGINT) AS i,
             CASE WHEN o.nv >= 4 AND t.i >= o.nv // 2
                  THEN (o.nv // 2) * 100 + (CAST(t.i AS BIGINT) - o.nv // 2) * 50
                  ELSE CAST(t.i AS BIGINT) * 100 END AS time_ms,
             CASE WHEN o.nv >= 4 AND t.i >= o.nv // 2
                  THEN 50 ELSE 100 END AS dur_ms,
             CASE WHEN (CAST(t.i AS BIGINT) // 2) % 2 = 0
                  THEN 50 ELSE 0 END AS ct_off,
             100 + (CAST(t.i AS BIGINT) * 7 + o.b0) % 50 AS sz
      FROM ok o, unnest(range(o.nv)) AS t(i)
    ),
    planned AS (
      SELECT doc_id, i, time_ms, dur_ms, time_ms + ct_off AS pt_ms, sz,
             base + coalesce(sum(sz) OVER (
               PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS byte_offset,
             (i % 4 = 0) AS sync
      FROM samples
      QUALIFY time_ms >= t0 AND time_ms < t1
    ),
    rows_ AS (
      SELECT doc_id AS media_id, TRUE AS decoded, CAST(i AS INT)
               AS sample_idx,
             CAST(time_ms AS BIGINT) AS time_ms,
             CAST(dur_ms AS BIGINT) AS dur_ms,
             CAST(pt_ms AS BIGINT) AS pt_ms,
             CAST(byte_offset AS BIGINT) AS byte_offset,
             CAST(sz AS BIGINT) AS size, sync
      FROM planned
      UNION ALL
      SELECT doc_id AS media_id, FALSE AS decoded, CAST(NULL AS INT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
             CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN)
      FROM src WHERE doc_id % 9 = 4
    )
    SELECT * FROM rows_ ORDER BY media_id, sample_idx ASC NULLS FIRST""",
    # closed-form replication of the GIF animation's composed canvas:
    # non-overlapping rects make each prior frame's visible state
    # independent (kept -> its palette color, restored -> background),
    # so frame k's canvas moments are base gray + a sum over j < k (the
    # lateral unnest) + the current rect — exact integers end to end
    "multimodal_gif_frames": """
    WITH src AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             ascii(substr(text, 1, 1)) AS b0,
             ascii(substr(text, 2, 1)) AS b1
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    ok AS (
      SELECT doc_id, n, b0, b1, 3 + n % 3 AS kf FROM src
      WHERE doc_id % 9 != 4
    ),
    fr AS (
      SELECT o.doc_id, o.b0, o.b1, CAST(t.k AS BIGINT) AS k
      FROM ok o, unnest(range(o.kf)) AS t(k)
    ),
    -- visible per-pixel contribution of each PRIOR rect j (1 <= j < k):
    -- odd j kept under its local palette, even j restored to gray bg
    psum AS (
      SELECT f.doc_id, f.k,
             sum(CASE WHEN t.j % 2 = 1
                 THEN ((f.b0 + 40 * t.j) % 256)
                      + (255 - ((f.b0 + 40 * t.j) % 256))
                      + ((f.b0 + 40 * t.j) % 256) // 2
                 ELSE 3 * f.b1 END) AS ps,
             sum(CASE WHEN t.j % 2 = 1
                 THEN ((f.b0 + 40 * t.j) % 256) * ((f.b0 + 40 * t.j) % 256)
                      + (255 - ((f.b0 + 40 * t.j) % 256))
                        * (255 - ((f.b0 + 40 * t.j) % 256))
                      + (((f.b0 + 40 * t.j) % 256) // 2)
                        * (((f.b0 + 40 * t.j) % 256) // 2)
                 ELSE 3 * f.b1 * f.b1 END) AS pq
      FROM fr f, unnest(range(1, f.k)) AS t(j)
      GROUP BY f.doc_id, f.k
    ),
    calc AS (
      SELECT f.doc_id, f.k, f.b0, f.b1,
             (f.b0 + 40 * f.k) % 256 AS ck,
             coalesce(p.ps, 0) AS ps, coalesce(p.pq, 0) AS pq
      FROM fr f LEFT JOIN psum p USING (doc_id, k)
    ),
    frames AS (
      SELECT doc_id AS media_id, TRUE AS decoded,
             CAST(k AS INT) AS frame_idx,
             CAST(CASE WHEN k = 0 THEN 0 ELSE 8 * (k - 1) END AS INT) AS left_,
             CAST(CASE WHEN k = 0 THEN 0 ELSE 6 END AS INT) AS top_,
             CAST(CASE WHEN k = 0 THEN 32 ELSE 8 END AS INT) AS w,
             CAST(CASE WHEN k = 0 THEN 20 ELSE 8 END AS INT) AS h,
             CAST(4 + k AS INT) AS delay_cs,
             CAST(CASE WHEN k = 0 OR k % 2 = 1 THEN 1 ELSE 2 END AS INT)
               AS disposal,
             (k != 0 AND k % 2 = 1) AS local_palette,
             CAST(CASE WHEN k = 0 THEN 3 * b0 * 640
                  ELSE 3 * b0 * (640 - 64 * k) + 64 * ps
                       + 64 * (CASE WHEN k % 2 = 1
                               THEN ck + (255 - ck) + ck // 2
                               ELSE 3 * ck END)
                  END AS BIGINT) AS canvas_sum,
             CAST(CASE WHEN k = 0 THEN 3 * b0 * b0 * 640
                  ELSE 3 * b0 * b0 * (640 - 64 * k) + 64 * pq
                       + 64 * (CASE WHEN k % 2 = 1
                               THEN ck * ck + (255 - ck) * (255 - ck)
                                    + (ck // 2) * (ck // 2)
                               ELSE 3 * ck * ck END)
                  END AS BIGINT) AS canvas_sumsq
      FROM calc
    ),
    fallback AS (
      SELECT doc_id AS media_id, FALSE AS decoded,
             CAST(NULL AS INT) AS frame_idx, CAST(NULL AS INT) AS left_,
             CAST(NULL AS INT) AS top_, CAST(NULL AS INT) AS w,
             CAST(NULL AS INT) AS h, CAST(NULL AS INT) AS delay_cs,
             CAST(NULL AS INT) AS disposal,
             CAST(NULL AS BOOLEAN) AS local_palette,
             CAST(NULL AS BIGINT) AS canvas_sum,
             CAST(NULL AS BIGINT) AS canvas_sumsq
      FROM src WHERE doc_id % 9 = 4
    )
    SELECT media_id, decoded, frame_idx, left_ AS "left", top_ AS "top",
           w, h, delay_cs, disposal, local_palette, canvas_sum,
           canvas_sumsq
    FROM (SELECT * FROM frames UNION ALL SELECT * FROM fallback)
    ORDER BY media_id, frame_idx ASC NULLS FIRST""",
    # arithmetic replication of the MP4 sample-table walk: per-track
    # stts/stsz/stsc/stco aggregates are pure functions of
    # (doc_id, n, first text bytes); the video size table is re-summed
    # via an unnest(range()) lateral, the audio track is constant-size
    # arithmetic, the truncation lane is one decoded=false row
    "multimodal_mp4_samples": """
    WITH src AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             ascii(substr(text, 1, 1)) AS b0,
             ascii(substr(text, 2, 1)) AS b1,
             ascii(substr(text, 3, 1)) AS b2
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    v AS (
      SELECT doc_id, n, b0, b1, b2, n % 7 + 2 AS nv FROM src
      WHERE doc_id % 9 != 4
    ),
    vsizes AS (
      SELECT v.doc_id,
             sum(100 + (CAST(t.i AS BIGINT) * 7 + v.b0) % 50) AS total_bytes,
             max(100 + (CAST(t.i AS BIGINT) * 7 + v.b0) % 50) AS max_bytes
      FROM v, unnest(range(v.nv)) AS t(i)
      GROUP BY v.doc_id
    ),
    video AS (
      SELECT v.doc_id AS media_id, TRUE AS decoded, 1 AS track_id,
             'vide' AS handler,
             CASE v.b2 % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1'
                  ELSE 'vp09' END AS codec,
             CAST(v.nv AS BIGINT) AS n_samples,
             1000 AS media_timescale,
             CAST(CASE WHEN v.nv >= 4
                  THEN (v.nv // 2) * 100 + (v.nv - v.nv // 2) * 50
                  ELSE v.nv * 100 END AS BIGINT) AS duration_ms,
             CAST(s.total_bytes AS BIGINT) AS total_bytes,
             CAST(s.max_bytes AS BIGINT) AS max_sample_bytes,
             CAST((v.nv + 2) // 3 AS INT) AS n_chunks,
             CAST((v.nv + 3) // 4 AS INT) AS n_sync,
             CAST(s.total_bytes AS BIGINT) AS chunk_span
      FROM v JOIN vsizes s USING (doc_id)
    ),
    audio AS (
      SELECT doc_id AS media_id, TRUE AS decoded, 2 AS track_id,
             'soun' AS handler, 'mp4a' AS codec,
             CAST(n % 5 + 4 AS BIGINT) AS n_samples,
             48000 AS media_timescale,
             CAST((n % 5 + 4) * 1024 * 1000 // 48000 AS BIGINT) AS duration_ms,
             CAST((n % 5 + 4) * (192 + b1 % 64) AS BIGINT) AS total_bytes,
             CAST(192 + b1 % 64 AS BIGINT) AS max_sample_bytes,
             -- multi-run stsc: one 2-sample head chunk + 4-sample chunks
             CAST(1 + (n % 5 + 4 + 1) // 4 AS INT) AS n_chunks,
             CAST(NULL AS INT) AS n_sync,
             CAST((n % 5 + 4) * (192 + b1 % 64) AS BIGINT) AS chunk_span
      FROM v WHERE doc_id % 2 = 0
    ),
    fallback AS (
      SELECT doc_id AS media_id, FALSE AS decoded, CAST(NULL AS INT)
               AS track_id,
             CAST(NULL AS VARCHAR) AS handler, CAST(NULL AS VARCHAR) AS codec,
             CAST(NULL AS BIGINT) AS n_samples, CAST(NULL AS INT)
               AS media_timescale,
             CAST(NULL AS BIGINT) AS duration_ms, CAST(NULL AS BIGINT)
               AS total_bytes,
             CAST(NULL AS BIGINT) AS max_sample_bytes,
             CAST(NULL AS INT) AS n_chunks, CAST(NULL AS INT) AS n_sync,
             CAST(NULL AS BIGINT) AS chunk_span
      FROM src WHERE doc_id % 9 = 4
    )
    SELECT * FROM video UNION ALL SELECT * FROM audio
    UNION ALL SELECT * FROM fallback
    ORDER BY media_id, track_id ASC NULLS FIRST""",
    # arithmetic replication of the MP3 frame walk: every field is a pure
    # function of (doc_id, n, first text bytes) through the public
    # ISO 11172-3 tables; the truncation lane nulls out like MP4's
    "multimodal_mp3_meta": """
    WITH src AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             ascii(substr(text, 1, 1)) AS b0,
             ascii(substr(text, 2, 1)) AS b1,
             ascii(substr(text, 3, 1)) AS b2
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    p AS (
      SELECT doc_id, n, b0, b1,
             CASE b0 % 5 WHEN 0 THEN 96 WHEN 1 THEN 128 WHEN 2 THEN 192
                         WHEN 3 THEN 256 ELSE 320 END AS br,
             CASE b1 % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                         ELSE 32000 END AS sr,
             CASE b2 % 4 WHEN 0 THEN 'stereo' WHEN 1 THEN 'joint_stereo'
                         WHEN 2 THEN 'dual_channel' ELSE 'mono' END AS cm,
             n // 4 + 2 AS nf
      FROM src
    )
    SELECT doc_id AS media_id, 'mp3' AS container,
           (doc_id % 9 != 7) AS decoded,
           CAST(CASE WHEN doc_id % 9 = 7 THEN NULL ELSE br END AS INT)
             AS bitrate_kbps,
           CAST(CASE WHEN doc_id % 9 = 7 THEN NULL ELSE sr END AS INT)
             AS sample_rate,
           CASE WHEN doc_id % 9 = 7 THEN NULL ELSE cm END AS channel_mode,
           CAST(CASE WHEN doc_id % 9 = 7 THEN NULL ELSE nf END AS BIGINT)
             AS n_frames,
           CAST(CASE WHEN doc_id % 9 = 7 THEN NULL
                ELSE nf * 1152 END AS BIGINT) AS n_samples,
           CAST(CASE WHEN doc_id % 9 = 7 THEN NULL
                ELSE nf * 1152 * 1000 // sr END AS BIGINT) AS duration_ms,
           CASE WHEN doc_id % 9 = 7 THEN NULL
                ELSE doc_id % 9 != 2 END AS tag_ok,
           CAST(CASE WHEN doc_id % 9 IN (7, 2) THEN NULL
                WHEN doc_id % 2 = 1 THEN 4 ELSE 0 END AS INT)
             AS n_tag_frames,
           CASE WHEN doc_id % 9 IN (7, 2) OR doc_id % 2 = 0 THEN NULL
                ELSE 'title-' || doc_id END AS tag_title,
           CASE WHEN doc_id % 9 IN (7, 2) OR doc_id % 2 = 0 THEN NULL
                ELSE 'artist-' || (b0 % 7) END AS tag_artist,
           CASE WHEN doc_id % 9 IN (7, 2) OR doc_id % 2 = 0 THEN NULL
                ELSE 'album-' || (b1 % 5) END AS tag_album,
           CASE WHEN doc_id % 9 IN (7, 2) OR doc_id % 2 = 0 THEN NULL
                ELSE CAST(1980 + doc_id % 40 AS VARCHAR) END AS tag_year
    FROM p ORDER BY media_id""",
    "multimodal_bytes": """
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               lower(substr(hex(encode(text)), 1, 8)) AS head_hex,
               md5(text) AS digest,
               octet_length(encode(text)) >= 256 AS exceeds_inline_threshold
        FROM documents ORDER BY doc_id""",
    "multimodal_chunking": """
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_chunks,
               CASE WHEN octet_length(encode(text)) % 64 = 0 THEN 64
                    ELSE octet_length(encode(text)) % 64 END AS tail_chunk_bytes
        FROM documents ORDER BY doc_id""",
}

QUERIES = {
    "multimodal_bytes": q_multimodal_bytes,
    "multimodal_chunking": q_multimodal_chunking,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_video_frames": q_multimodal_video_frames,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_resample": q_multimodal_resample,
    "source_warc_ingest": q_source_warc_ingest,
    "source_warc_cdx": q_source_warc_cdx,
    "multimodal_jpeg_color": q_multimodal_jpeg_color,
    "multimodal_flac": q_multimodal_flac,
    "multimodal_mp4_meta": q_multimodal_mp4_meta,
    "multimodal_mp4_samples": q_multimodal_mp4_samples,
    "multimodal_gif_frames": q_multimodal_gif_frames,
    "multimodal_mp4_slice": q_multimodal_mp4_slice,
    "multimodal_fmp4_frags": q_multimodal_fmp4_frags,
    "multimodal_ogg_meta": q_multimodal_ogg_meta,
    "multimodal_mp3_meta": q_multimodal_mp3_meta,
}
