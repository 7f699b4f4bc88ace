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
