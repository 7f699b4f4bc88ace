"""OGG container walk (Opus streams) — the third real-world audio
format after MP3 and FLAC, and the one modern voice/podcast crawls ship:
page framing ("OggS" capture pattern, little-endian granule/serial/
sequence fields, segment-table lacing), REAL CRC32 page integrity
(the OGG polynomial 0x04c11db7, MSB-first, init/xorout 0 — every page
is verified, so bit rot is detected rather than mis-parsed), packet
reassembly from lacing values, and the OpusHead identification header
(channels, pre-skip, input sample rate). NO audio decode: Opus packets
stay behind the codec-library stub boundary like MP3/MP4 bitstreams —
but page/packet counts, stream identity, and exact duration (granule
positions run at 48 kHz for Opus, minus pre-skip) are what a crawl
pipeline filters and slices audio by, and they live entirely in the
container layer walked here.

Page layout and the Opus mapping (RFC 3533 / RFC 7845) are public
format data. The reference engine (zach030/OctopusDB) has no media
layer; this rides the driver mandate's multimodal surface.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

OGG_MAX_PAGES = 65536  # engine bound (a 2h voice file is ~7k pages)


def _crc_table() -> list:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            r &= 0xFFFFFFFF
        table.append(r)
    return table


_CRC = _crc_table()


def ogg_crc(data: bytes) -> int:
    """The OGG page checksum: CRC-32, polynomial 0x04c11db7, MSB-first,
    init 0, no reflection, no final xor (RFC 3533 A.2)."""
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC[((r >> 24) & 0xFF) ^ b]
    return r


def _lacing(sizes: list) -> bytes:
    """Segment table for whole packets on one page: 255-run lacing, a
    terminal short (or zero) segment per packet."""
    out = bytearray()
    for n in sizes:
        full, rem = divmod(n, 255)
        out += b"\xff" * full
        out.append(rem)  # 0 terminates an exact multiple — per spec
    if len(out) > 255:
        raise ValueError("too many segments for one page")
    return bytes(out)


def _page(serial: int, seq: int, granule: int, htype: int,
          packets: list) -> bytes:
    body = b"".join(packets)
    segs = _lacing([len(p) for p in packets])
    hdr = (
        b"OggS" + bytes([0, htype])
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + b"\x00\x00\x00\x00"  # crc placeholder
        + bytes([len(segs)]) + segs
    )
    page = bytearray(hdr + body)
    crc = ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def build_ogg_opus(
    serial: int = 0x1234,
    channels: int = 1,
    preskip: int = 312,
    input_rate: int = 16000,
    audio_pages: list | None = None,  # [(n_packets, packet_size)...]
    frame_samples: int = 960,  # 20 ms at 48 kHz
) -> bytes:
    """A structurally real OGG/Opus file: BOS page with the OpusHead
    identification header, an OpusTags comment page, then one audio page
    per ``audio_pages`` entry (each carrying ``n_packets`` opaque packets
    of ``packet_size`` bytes; granule positions advance ``frame_samples``
    per packet at the Opus 48 kHz clock, the last page flagged EOS).
    Every page carries its real CRC."""
    head = (
        b"OpusHead" + bytes([1, channels])
        + struct.pack("<H", preskip)
        + struct.pack("<I", input_rate)
        + struct.pack("<h", 0) + bytes([0])
    )
    tags = (
        b"OpusTags" + struct.pack("<I", 9) + b"octopusdb"
        + struct.pack("<I", 0)
    )
    out = bytearray()
    out += _page(serial, 0, 0, 0x02, [head])  # BOS
    out += _page(serial, 1, 0, 0x00, [tags])
    pages = audio_pages or []
    granule = preskip
    for i, (np_, psz) in enumerate(pages):
        granule += np_ * frame_samples
        htype = 0x04 if i == len(pages) - 1 else 0x00  # EOS on the last
        pkts = [
            bytes(((i * 31 + j * 7 + k) % 251) for k in range(psz))
            for j in range(np_)
        ]
        out += _page(serial, 2 + i, granule, htype, pkts)
    return bytes(out)


def parse_ogg_opus(payload: bytes) -> dict:
    """Walk every page: capture pattern, version 0, CRC verification
    (recomputed with the checksum field zeroed — a flipped bit anywhere
    in the page fails here), sequence continuity per stream, lacing ->
    packet counts, and the BOS OpusHead fields. Returns stream-level
    metadata: serial, channels, pre_skip, input_rate, n_pages,
    n_packets (audio packets — the head/tags packets are excluded),
    duration_ms ((last granule - pre_skip) at the 48 kHz Opus clock).
    MULTIPLEXED bitstreams are supported by selection (r14): every
    stream's pages are CRC- and sequence-verified, and the metadata is
    reported for THE Opus stream (the serial whose BOS packet is
    OpusHead) — the real-world mux case (e.g. a video stream sharing
    the container). Two Opus streams, or none, raise. ``n_pages`` /
    ``n_packets`` count the Opus stream's own pages; ``n_streams``
    reports the mux width. Malformed structure raises ValueError (the
    loud-fallback contract). Packet continuation across pages (lacing
    255 at page end) is tracked per stream so spanning packets count
    once."""
    if payload[:4] != b"OggS":
        raise ValueError("not an OGG stream")
    pos = 0
    streams: dict = {}  # serial -> per-stream walk state
    opus_serial = None
    head = None
    total_pages = 0
    while pos < len(payload):
        if total_pages >= OGG_MAX_PAGES:
            raise ValueError("OGG page count exceeds engine bound")
        if pos + 27 > len(payload):
            raise ValueError("truncated OGG page header")
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError("OGG capture pattern lost")
        if payload[pos + 4] != 0:
            raise ValueError("unknown OGG version")
        htype = payload[pos + 5]
        granule = struct.unpack_from("<q", payload, pos + 6)[0]
        serial, seq = struct.unpack_from("<II", payload, pos + 14)
        crc = struct.unpack_from("<I", payload, pos + 22)[0]
        nsegs = payload[pos + 26]
        seg_end = pos + 27 + nsegs
        if seg_end > len(payload):
            raise ValueError("truncated OGG segment table")
        lacing = payload[pos + 27 : seg_end]
        body_len = sum(lacing)
        page_end = seg_end + body_len
        if page_end > len(payload):
            raise ValueError("truncated OGG page body")
        page = bytearray(payload[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"OGG page {seq} CRC mismatch")
        st = streams.get(serial)
        if st is None:
            if not htype & 0x02:
                raise ValueError("new OGG stream without a BOS page")
            st = streams[serial] = {
                "seq": 0, "mid": False, "eos": False,
                "pages": 0, "packets": 0, "last_granule": None,
            }
            body = payload[seg_end:page_end]
            if body[:8] == b"OpusHead":
                if opus_serial is not None:
                    raise ValueError("multiple Opus streams in one file")
                if body_len < 19:
                    raise ValueError("truncated OpusHead")
                if body[8] != 1:
                    raise ValueError(f"unknown OpusHead version {body[8]}")
                opus_serial = serial
                head = {
                    "channels": body[9],
                    "pre_skip": struct.unpack_from("<H", body, 10)[0],
                    "input_rate": struct.unpack_from("<I", body, 12)[0],
                }
        if seq != st["seq"]:
            raise ValueError(
                f"OGG page sequence gap (expected {st['seq']}, got {seq})"
            )
        st["seq"] += 1
        if st["eos"]:
            raise ValueError("OGG page after EOS")
        if htype & 0x04:
            st["eos"] = True
        if bool(htype & 0x01) != st["mid"]:
            raise ValueError("OGG continuation flag inconsistent")
        # packets completed on this page: every lacing value < 255 ends one
        completed = sum(1 for v in lacing if v < 255)
        st["mid"] = bool(lacing) and lacing[-1] == 255
        # running COMPLETED-packet count; audio packets are those after
        # the stream's first two packets (OpusHead + OpusTags). ADVICE
        # r14: RFC 7845 lets the comment header span multiple pages
        # (cover art), so "pages 0/1 are headers" miscounts tags
        # continuation pages as audio — count by packet, not page.
        st["packets"] += completed
        if granule != -1:
            st["last_granule"] = granule
        st["pages"] += 1
        total_pages += 1
        pos = page_end
    if opus_serial is None or head is None:
        raise ValueError("OGG without an Opus stream")
    ost = streams[opus_serial]
    if ost["pages"] < 2 or ost["packets"] < 2:
        raise ValueError("Opus stream without its header packets")
    if not ost["eos"]:
        raise ValueError("Opus stream without an EOS page")
    dur_gr = max(0, (ost["last_granule"] or 0) - head["pre_skip"])
    return {
        "container": "ogg",
        "serial": opus_serial,
        "channels": head["channels"],
        "pre_skip": head["pre_skip"],
        "input_rate": head["input_rate"],
        "n_pages": ost["pages"],
        "n_packets": ost["packets"] - 2,  # minus OpusHead + OpusTags
        "duration_ms": dur_gr * 1000 // 48000,
        "n_streams": len(streams),
    }


OGG_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("container", T.StringType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("serial", T.LongType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("pre_skip", T.IntegerType(), True),
        T.StructField("input_rate", T.IntegerType(), True),
        T.StructField("n_pages", T.IntegerType(), True),
        T.StructField("n_packets", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def ogg_metadata(media_df: DataFrame) -> DataFrame:
    """Partition-parallel OGG/Opus metadata extraction via mapInPandas —
    stateless Arrow batches, the same 100-TB shape as ``mp3_metadata``.
    Malformed payloads record decoded=False with null metadata (loud
    fallback, never a batch failure)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict = {f.name: [] for f in OGG_META_SCHEMA.fields}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    meta = parse_ogg_opus(bytes(p))
                except (ValueError, struct.error, IndexError):
                    meta = None
                out["media_id"].append(int(mid))
                out["container"].append("ogg")
                out["decoded"].append(meta is not None)
                for k in ("serial", "channels", "pre_skip", "input_rate",
                          "n_pages", "n_packets", "duration_ms"):
                    out[k].append(meta[k] if meta else None)
            nullable_int = ("serial", "channels", "pre_skip", "input_rate",
                            "n_pages", "n_packets", "duration_ms")
            yield pd.DataFrame(
                {
                    k: pd.array(v, dtype="Int64") if k in nullable_int else v
                    for k, v in out.items()
                }
            )

    return media_df.mapInPandas(batches, OGG_META_SCHEMA)
