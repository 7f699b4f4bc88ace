"""Regression tests for the ADVICE r15 fixes:

1. build_ogg_opus refuses to build a packet its own parser rejects —
   frames_per_packet whose TOC-clock duration exceeds the RFC 6716
   §3.2.5 120 ms bound raises at build time (builder/parser contract);
2. tools/scaling_probe.py fails loudly on an unrecognized ``--`` flag
   instead of silently disabling the scaling gate (a space-separated
   ``--gate-exponent 1.2`` used to strip the flag AND misparse argv);
3. the fingerprint shingle sites guard short code arrays —
   ``sequence(0, size - k)`` runs DESCENDING below k elements, minting
   null shingles the DuckDB oracles' lead()-based shingling never
   emits; the queries now filter those recordings out first.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from octopusdb_spark.functions.ogg import build_ogg_opus, parse_ogg_opus


def test_ogg_builder_rejects_over_120ms_packets():
    """toc_config=1 is a 960-sample (20 ms) frame: 7 frames/packet is
    140 ms — parse_ogg_opus would raise, so the builder must too."""
    with pytest.raises(ValueError, match="120 ms"):
        build_ogg_opus(audio_pages=[(2, 40)], frames_per_packet=7)


def test_ogg_builder_parser_roundtrip_at_the_bound():
    """6 x 20 ms = 120 ms is exactly legal: build and parse agree."""
    payload = build_ogg_opus(audio_pages=[(2, 40)], frames_per_packet=6)
    meta = parse_ogg_opus(payload)
    assert meta["toc_frames"] == 2 * 6
    assert meta["toc_duration_ms"] == 2 * 6 * 20


def test_ogg_builder_bound_uses_toc_clock_not_granule_clock():
    """The parser's bound reads the TOC config's duration; a mismatched
    granule-clock frame_samples must not mask the violation (config 3
    is a 2880-sample 60 ms SILK frame: 3 frames = 180 ms)."""
    with pytest.raises(ValueError, match="120 ms"):
        build_ogg_opus(
            audio_pages=[(1, 40)], toc_config=3,
            frame_samples=960, frames_per_packet=3,
        )


def test_scaling_probe_rejects_unknown_flags(tmp_path):
    """A space-separated or misspelled flag must exit nonzero with a
    message, never run ungated and exit 0."""
    s, b = tmp_path / "s.json", tmp_path / "b.json"
    s.write_text(json.dumps({"queries": {"scan": 1.0}, "sf": 0.01}))
    b.write_text(json.dumps({"queries": {"scan": 30.0}, "sf": 0.1}))
    r = subprocess.run(
        [sys.executable, "tools/scaling_probe.py", str(s), str(b),
         "--gate-exponent", "1.2"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode != 0
    assert "unrecognized flag" in (r.stdout + r.stderr)


def test_scaling_probe_known_flags_still_parse(tmp_path):
    s, b = tmp_path / "s.json", tmp_path / "b.json"
    s.write_text(json.dumps({"queries": {"scan": 1.0}, "sf": 0.01}))
    b.write_text(json.dumps({"queries": {"scan": 30.0}, "sf": 0.1}))
    r = subprocess.run(
        [sys.executable, "tools/scaling_probe.py", str(s), str(b),
         "--gate-exponent=1.2"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 1  # exponent 1.477 > 1.2: gated, loudly


def test_short_code_arrays_emit_zero_shingles(spark):
    """The shared shingle shape: with the size guard a 3-code recording
    contributes nothing. WITHOUT it, sequence(0, size-4) runs
    DESCENDING and — under Spark 4's default ANSI mode — codes[i+3]
    THROWS ArrayIndexOutOfBounds, so one short recording would crash
    the whole query (worse than the null inflation ADVICE predicted)."""
    from pyspark.sql import functions as F
    from pyspark.errors import PySparkException

    df = spark.createDataFrame(
        [("short", [1, 2, 3]), ("long", [1, 2, 3, 4, 5])],
        "media_id string, codes array<int>",
    )
    shingle = F.explode(F.array_distinct(F.expr(
        "transform(sequence(0, size(codes) - 4), i -> "
        "CAST(((codes[i] * 128 + codes[i+1]) * 128 + codes[i+2]) * 128 "
        "+ codes[i+3] AS BIGINT))"
    ))).alias("sh")

    guarded = (
        df.filter(F.size("codes") >= 4).select("media_id", shingle).collect()
    )
    assert {r.media_id for r in guarded} == {"long"}
    assert all(r.sh is not None for r in guarded)

    with pytest.raises(PySparkException):
        df.select("media_id", shingle).collect()


# ---------------------------------------------------------------- r16 tags


def test_mp4_ilst_tag_roundtrip_and_failure_domain():
    """udta/meta/ilst walk: real values back out; absent udta is a
    vacuous success; a corrupted data-box size raises in the TAG walk
    while the container walk stays green (independent domains)."""
    import struct

    from octopusdb_spark.functions.mp4 import (
        build_mp4,
        parse_mp4,
        parse_mp4_tags,
    )

    p = build_mp4(
        b"isom", 1000, 4000, video=(b"avc1", 64, 48), mdat=b"\x00" * 8,
        tags={"title": "t", "artist": "a", "album": "l", "date": "2001"},
    )
    tags = parse_mp4_tags(p)
    assert tags == {
        "n_tag_items": 4, "tag_title": "t", "tag_artist": "a",
        "tag_album": "l", "tag_date": "2001",
    }
    bare = build_mp4(b"isom", 1000, 0, video=(b"avc1", 64, 48), mdat=b"x")
    assert parse_mp4_tags(bare)["n_tag_items"] == 0

    buf = bytearray(p)
    at = p.index(b"data") - 4
    struct.pack_into(">I", buf, at, struct.unpack_from(">I", p, at)[0] + 7)
    with pytest.raises(ValueError):
        parse_mp4_tags(bytes(buf))
    assert parse_mp4(bytes(buf))["duration_ms"] == 4000  # container intact

    with pytest.raises(ValueError, match="unknown MP4 tag keys"):
        build_mp4(tags={"composer": "x"}, video=(b"avc1", 8, 8))


def test_id3v2_tag_roundtrip_and_malformed_classes():
    from octopusdb_spark.functions.mp3 import (
        build_id3v2_frames,
        build_mp3,
        parse_id3v2_frames,
        parse_mp3,
    )
    import struct

    frames = build_id3v2_frames([
        ("TIT2", "ttl", 1),  # UTF-16 with BOM
        ("TPE1", "art"), ("TALB", "alb"), ("TYER", "1999"),
    ])
    s = build_mp3(4, 128, 44100, id3_payload=frames)
    got = parse_id3v2_frames(s)
    assert got["n_tag_frames"] == 4 and got["tag_title"] == "ttl"
    assert got["tag_year"] == "1999"
    assert parse_mp3(s)["n_frames"] == 4  # skip path unaffected
    assert parse_id3v2_frames(build_mp3(2, 128, 44100))["n_tag_frames"] == 0

    def tag(body):
        return build_mp3(2, 128, 44100, id3_payload=body)

    overrun = b"TIT2" + struct.pack(">I", 9999) + b"\x00\x00\x00x"
    bad_id = b"ti!2" + struct.pack(">I", 2) + b"\x00\x00\x00x"
    compressed = b"TIT2" + struct.pack(">I", 2) + b"\x00\x80\x00x"
    bad_enc = b"TIT2" + struct.pack(">I", 2) + b"\x00\x00\x07x"
    no_bom = b"TIT2" + struct.pack(">I", 3) + b"\x00\x00\x01xy"
    for bad, msg in [
        (tag(overrun), "overruns"),
        (tag(bad_id), "frame id"),
        (tag(compressed), "compressed/encrypted"),
        (tag(bad_enc), "encoding"),
        (tag(no_bom), "BOM"),
    ]:
        with pytest.raises(ValueError, match=msg):
            parse_id3v2_frames(bad)
        parse_mp3(bad)  # the audio walk must not care
    # unsupported revision and unsync flag
    rev = bytearray(tag(overrun))
    rev[3] = 9
    with pytest.raises(ValueError, match="revision"):
        parse_id3v2_frames(bytes(rev))
    uns = bytearray(tag(overrun))
    uns[5] = 0x80
    with pytest.raises(ValueError, match="unsynchronised"):
        parse_id3v2_frames(bytes(uns))
    # zero-byte padding terminates the walk cleanly
    padded = tag(build_id3v2_frames([("TIT2", "x")]) + b"\x00" * 24)
    assert parse_id3v2_frames(padded)["n_tag_frames"] == 1


def test_tag_layer_is_independent_on_the_spark_surface(spark):
    """mp3_metadata / mp4_metadata: a malformed tag records
    tag_ok=False with the audio/container fields REAL; decoded=False
    still nulls everything including the tag columns."""
    import struct

    from octopusdb_spark.functions.mp3 import build_mp3, mp3_metadata
    from octopusdb_spark.functions.mp4 import build_mp4, mp4_metadata
    from pyspark.sql import types as T

    media_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ])
    bad_tag = b"TIT2" + struct.pack(">I", 9999) + b"\x00\x00\x00x"
    rows3 = [
        (1, build_mp3(5, 128, 44100, id3_payload=bad_tag)),
        (2, build_mp3(5, 128, 44100)[:-5]),
    ]
    out = {
        r["media_id"]: r
        for r in mp3_metadata(
            spark.createDataFrame(rows3, media_schema)
        ).collect()
    }
    assert out[1]["decoded"] and out[1]["n_frames"] == 5
    assert out[1]["tag_ok"] is False and out[1]["tag_title"] is None
    assert not out[2]["decoded"] and out[2]["tag_ok"] is None

    p = build_mp4(b"isom", 1000, 3000, video=(b"avc1", 32, 32),
                  mdat=b"\x00" * 8, tags={"title": "q"})
    buf = bytearray(p)
    at = p.index(b"data") - 4
    struct.pack_into(">I", buf, at, struct.unpack_from(">I", p, at)[0] + 7)
    rows4 = [(1, bytes(buf)), (2, p)]
    out4 = {
        r["media_id"]: r
        for r in mp4_metadata(
            spark.createDataFrame(rows4, media_schema)
        ).collect()
    }
    assert out4[1]["decoded"] and out4[1]["duration_ms"] == 3000
    assert out4[1]["tag_ok"] is False and out4[1]["tag_title"] is None
    assert out4[2]["tag_ok"] and out4[2]["tag_title"] == "q"


def test_stream_image_dedup_index_catches_earlier_arrivals(spark):
    """The updatable-index mechanism itself: the stream runs in at
    least two micro-batches (maxFilesPerTrigger=1 over the two
    mtime-ordered arrival files), and a >= 30 twin is rejected even
    though the static corpus never matches it — only the between-batch
    index append can catch it."""
    import octopusdb_spark.queries.stream_twin as st

    progress = []
    orig = st._run_bounded

    def probe(q):
        orig(q)
        progress.append(len(q.recentProgress))

    st._run_bounded = probe
    try:
        rows = {
            r["source"]: r
            for r in st.q_stream_image_dedup(
                spark, "/root/testdata/sf0.01"
            ).collect()
        }
    finally:
        st._run_bounded = orig
    assert progress and progress[0] >= 2  # the twins cross a batch boundary
    # oracle-decomposed ground truth at sf0.01: arrivals 35/40/45/50/55
    # are rejected ONLY via an earlier arrival (see the oracle's
    # smaller-doc_id disjunct); their sources carry the rejections
    assert sum(r["n_rejected"] for r in rows.values()) == 7
    assert sum(r["n_arrivals"] for r in rows.values()) == 12


def test_bounded_state_partitions_scopes_and_restores(spark, monkeypatch):
    """r16 optimization: the bounded-domain streaming state-partition
    scope must (a) clamp to the key domain, (b) apply inside the block,
    and (c) restore the session value even on error — a leaked shrunken
    shuffle.partitions would silently deparallelize every later query."""
    import pytest

    from octopusdb_spark.queries.stream_twin import _bounded_state_partitions

    before = spark.conf.get("spark.sql.shuffle.partitions")
    with _bounded_state_partitions(spark, key_domain=256):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "64")
    with _bounded_state_partitions(spark, key_domain=4):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    with pytest.raises(RuntimeError):
        with _bounded_state_partitions(spark, key_domain=256):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
