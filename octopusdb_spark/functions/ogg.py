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

# 20 ms Opus configs by coding mode (RFC 6716 table 2) — the builder
# default clock: one 20 ms frame is 960 samples at 48 kHz
OPUS_20MS_CONFIGS = (1, 5, 9, 13, 15, 19, 23, 27, 31)


def opus_toc_config(config: int) -> tuple:
    """Decode an Opus TOC config number (RFC 6716 §3.1, table 2) into
    (mode, bandwidth, frame_duration_in_48k_samples) — pure table
    arithmetic, no entropy decode. configs 0-11 are SILK-only
    (NB/MB/WB x 10/20/40/60 ms), 12-15 Hybrid (SWB/FB x 10/20 ms),
    16-31 CELT-only (NB/WB/SWB/FB x 2.5/5/10/20 ms)."""
    if not 0 <= config <= 31:
        raise ValueError(f"Opus config out of range: {config}")
    if config < 12:
        return ("silk", ("nb", "mb", "wb")[config // 4],
                (480, 960, 1920, 2880)[config % 4])
    if config < 16:
        return ("hybrid", ("swb", "fb")[(config - 12) // 2],
                (480, 960)[config % 2])
    c = config - 16
    return ("celt", ("nb", "wb", "swb", "fb")[c // 4],
            (120, 240, 480, 960)[c % 4])


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
    toc_config: int = 1,  # SILK NB 20 ms — matches frame_samples=960
    stereo_flag: bool = False,
    frames_per_packet: int = 1,
) -> bytes:
    """A structurally real OGG/Opus file: BOS page with the OpusHead
    identification header, an OpusTags comment page, then one audio page
    per ``audio_pages`` entry (each carrying ``n_packets`` packets
    of ``packet_size`` bytes; granule positions advance
    ``frames_per_packet * frame_samples`` per packet at the Opus 48 kHz
    clock, the last page flagged EOS). Every page carries its real CRC,
    and every audio packet starts with a REAL RFC 6716 §3.1 TOC byte:
    ``toc_config`` picks the coding mode/bandwidth/frame duration (the
    caller keeps it consistent with ``frame_samples`` — config 1 is the
    960-sample default), ``stereo_flag`` sets the s bit, and
    ``frames_per_packet`` selects frame-count code 0 (one frame) or
    code 3 with an M-count byte (CBR, no padding). Bytes past the TOC
    stay opaque filler — the codec boundary."""
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
    if not 1 <= frames_per_packet <= 48:
        raise ValueError("frames_per_packet out of the code-3 range")
    # Builder/parser contract (ADVICE r15): parse_ogg_opus rejects any
    # packet over 120 ms at the TOC clock (RFC 6716 §3.2.5), so refuse
    # to build one — the bound uses the TOC config's duration, which is
    # what the parser will see, not the granule-clock frame_samples.
    toc_dur = opus_toc_config(toc_config)[2]
    if frames_per_packet * toc_dur > 5760:
        raise ValueError(
            "frames_per_packet * TOC frame duration exceeds the 120 ms "
            "RFC 6716 packet bound the parser enforces"
        )
    toc = (int(toc_config) << 3) | (int(bool(stereo_flag)) << 2)
    if frames_per_packet == 1:
        prefix = bytes([toc | 0])  # code 0: one frame
    else:
        # code 3, vbr=0, padding=0, M in the low 6 bits
        prefix = bytes([toc | 3, frames_per_packet & 0x3F])
    out = bytearray()
    out += _page(serial, 0, 0, 0x02, [head])  # BOS
    out += _page(serial, 1, 0, 0x00, [tags])
    pages = audio_pages or []
    granule = preskip
    for i, (np_, psz) in enumerate(pages):
        if psz < len(prefix):
            raise ValueError("packet_size smaller than its TOC prefix")
        granule += np_ * frames_per_packet * frame_samples
        htype = 0x04 if i == len(pages) - 1 else 0x00  # EOS on the last
        pkts = [
            prefix + bytes(
                ((i * 31 + j * 7 + k) % 251)
                for k in range(len(prefix), psz)
            )
            for j in range(np_)
        ]
        out += _page(serial, 2 + i, granule, htype, pkts)
    return bytes(out)


def _toc_accumulate(st: dict, b0, b1, plen: int) -> None:
    """Fold one completed AUDIO packet's TOC byte into the stream's
    running aggregates (RFC 6716 §3.1) — called at packet completion so
    per-stream state stays O(1) regardless of packet count. Malformed
    TOC classes raise (the loud-fallback contract)."""
    if b0 is None:
        raise ValueError("zero-length Opus audio packet")
    config, stereo, code = b0 >> 3, (b0 >> 2) & 1, b0 & 3
    mode, _bw, dur = opus_toc_config(config)
    if code == 0:
        nf = 1
    elif code == 1:
        if (plen - 1) % 2:
            raise ValueError("code-1 Opus packet with odd payload")
        nf = 2
    elif code == 2:
        if plen < 2:
            raise ValueError("truncated code-2 Opus packet")
        nf = 2
    else:
        if b1 is None:
            raise ValueError("truncated code-3 Opus packet")
        nf = b1 & 0x3F
        if nf == 0:
            raise ValueError("code-3 Opus packet with zero frames")
    if nf * dur > 5760:  # 120 ms at 48 kHz (RFC 6716 §3.2.5)
        raise ValueError("Opus packet exceeds 120 ms")
    st["toc_frames"] += nf
    st["toc_samples"] += nf * dur
    st["n_stereo"] += stereo
    if mode == "silk":
        st["n_silk"] += 1
    elif mode == "hybrid":
        st["n_hybrid"] += 1
    else:
        st["n_celt"] += 1


def parse_ogg_opus(payload: bytes) -> dict:
    """Walk every page: capture pattern, version 0, CRC verification
    (recomputed with the checksum field zeroed — a flipped bit anywhere
    in the page fails here), sequence continuity per stream, lacing ->
    packet counts, and the BOS OpusHead fields. Returns stream-level
    metadata: serial, channels, pre_skip, input_rate, n_pages,
    n_packets (audio packets — the head/tags packets are excluded),
    duration_ms ((last granule - pre_skip) at the 48 kHz Opus clock).
    The TOC byte of every audio packet is decoded (r15 — RFC 6716 §3.1
    table arithmetic, still zero entropy decode): toc_frames /
    toc_duration_ms accumulate the per-packet frame counts and
    durations from the config field (code-3 packets read their M-count
    byte), n_silk / n_hybrid / n_celt count packets per coding mode,
    n_stereo counts s-bit packets, and toc_granule_agree records
    whether the TOC clock matches the granule clock exactly — the
    integrity signal a crawl pipeline filters on.
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
                "open": None,
                # O(1) running TOC aggregates (review r15: a per-packet
                # heads LIST was input-amplified — 255 zero-length
                # lacing values per page across OGG_MAX_PAGES pages
                # could materialize ~16M tuples; aggregate at packet
                # completion instead, same fuzz-DoS policy as
                # MP4_MAX_SAMPLES)
                "toc_samples": 0, "toc_frames": 0,
                "n_silk": 0, "n_hybrid": 0, "n_celt": 0, "n_stereo": 0,
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
        # walk the lacing values tracking packet boundaries: every
        # value < 255 COMPLETES a packet, and each packet's first two
        # bytes (the RFC 6716 TOC byte + optional code-3 count byte)
        # are captured at its start. A packet's non-final segments are
        # always exactly 255, so when the first segment exists (v > 0)
        # it is either the whole packet (v < 255, b1 present iff
        # v > 1) or a 255-byte run — both bytes always live in that
        # first segment. Audio packets are those after the stream's
        # first two packets (OpusHead + OpusTags). ADVICE r14: RFC
        # 7845 lets the comment header span multiple pages (cover
        # art), so "pages 0/1 are headers" miscounted tags
        # continuation pages as audio — count by packet, not page.
        # TOC stats aggregate AT COMPLETION (O(1) state per stream —
        # never a per-packet list), and only for the Opus stream
        # (whose BOS precedes all of its audio pages, so opus_serial
        # is known by the time any of its packets completes).
        off = 0
        for v in lacing:
            if st["open"] is None:
                st["open"] = {"b0": None, "b1": None, "len": 0}
            o = st["open"]
            if v > 0 and o["b0"] is None:
                s0 = seg_end + off
                o["b0"] = payload[s0]
                if v > 1:
                    o["b1"] = payload[s0 + 1]
            o["len"] += v
            off += v
            if v < 255:
                pkt_idx = st["packets"]
                st["packets"] = pkt_idx + 1
                st["open"] = None
                if serial == opus_serial and pkt_idx >= 2:
                    _toc_accumulate(st, o["b0"], o["b1"], o["len"])
        st["mid"] = st["open"] is not None
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
    if ost["open"] is not None:
        raise ValueError("Opus stream ends mid-packet")
    dur_gr = max(0, (ost["last_granule"] or 0) - head["pre_skip"])

    # TOC aggregates were folded in at packet completion (RFC 6716
    # §3.1 — _toc_accumulate): a per-packet duration CLOCK independent
    # of the granule positions (their agreement is the crawl-quality
    # integrity signal) and the mode distribution (the codec-identity
    # signal), all O(1) stream state.
    toc_samples = ost["toc_samples"]
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
        "toc_frames": ost["toc_frames"],
        "toc_duration_ms": toc_samples * 1000 // 48000,
        "n_silk": ost["n_silk"],
        "n_hybrid": ost["n_hybrid"],
        "n_celt": ost["n_celt"],
        "n_stereo": ost["n_stereo"],
        "toc_granule_agree": toc_samples == dur_gr,
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
        T.StructField("toc_frames", T.LongType(), True),
        T.StructField("toc_duration_ms", T.LongType(), True),
        T.StructField("n_silk", T.IntegerType(), True),
        T.StructField("n_hybrid", T.IntegerType(), True),
        T.StructField("n_celt", T.IntegerType(), True),
        T.StructField("n_stereo", T.IntegerType(), True),
        T.StructField("toc_granule_agree", T.BooleanType(), True),
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
                          "n_pages", "n_packets", "duration_ms",
                          "toc_frames", "toc_duration_ms", "n_silk",
                          "n_hybrid", "n_celt", "n_stereo",
                          "toc_granule_agree"):
                    out[k].append(meta[k] if meta else None)
            nullable_int = ("serial", "channels", "pre_skip", "input_rate",
                            "n_pages", "n_packets", "duration_ms",
                            "toc_frames", "toc_duration_ms", "n_silk",
                            "n_hybrid", "n_celt", "n_stereo")
            yield pd.DataFrame(
                {
                    k: pd.array(v, dtype="Int64") if k in nullable_int
                    else pd.array(v, dtype="boolean")
                    if k == "toc_granule_agree" else v
                    for k, v in out.items()
                }
            )

    return media_df.mapInPandas(batches, OGG_META_SCHEMA)
