"""WARC source — the web-archive container (ISO 28500) that large crawl
corpora (Common Crawl) actually ship, i.e. the canonical 100 TB input of an
LLM pretraining pipeline.

Pure std-lib implementation of both layouts:

- plain ``.warc``: concatenated ``WARC/1.0`` records — a CRLF header block,
  ``Content-Length``-framed body, and a blank-line record separator. The
  framing is length-based, so bodies containing header-like bytes round-trip
  exactly (no delimiter scanning inside content).
- ``.warc.gz``: one gzip MEMBER per record, concatenated — the layout crawl
  archives use so a reader can split work on member boundaries without
  decompressing the whole file. Parsed with ``zlib.decompressobj(wbits=31)``
  chained over ``unused_data`` (std-lib gzip framing, no codec libraries).

``read_warc`` turns a DataFrame of WARC blobs into one row per record via
``mapInPandas``: parsing runs executor-side over Arrow batches, one Python
worker per core, zero driver involvement. At 100 TB the blobs come straight
from ``binaryFile`` (see `sources/io.py::read_media_dir` for the on-ramp
shape): one crawl segment file per row, segments parsed in parallel; the
per-record explode happens INSIDE the batch, so a multi-GB segment streams
out as records without ever becoming one downstream row.

The reference speaks only its own on-disk formats (`kv/file/sstable.go`,
`kv/file/wal.go`); this module is part of the Part-B source surface the
driver mandate adds for training-data pipelines.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

CRLF = b"\r\n"
_GZ_MAGIC = b"\x1f\x8b"

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.LongType(), False),
        T.StructField("record_idx", T.IntegerType(), False),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content", T.BinaryType(), False),
    ]
)


def encode_warc_record(content: bytes, headers: dict | None = None) -> bytes:
    """One WARC/1.0 record: named headers + Content-Length framing + the
    blank-line record separator. Header insertion order is preserved;
    Content-Length is always computed from ``content``."""
    lines = [b"WARC/1.0"]
    for k, v in (headers or {}).items():
        if k.lower() == "content-length":
            continue  # framing is ours to compute
        if ":" in k or any(c.isspace() for c in k):
            # a ':' (or whitespace) in the NAME would re-parse with a
            # different name/value split — same silent-corruption class
            # as an injected CRLF, same loud rejection (WARC field names
            # are token characters only)
            raise ValueError(f"invalid WARC header name {k!r}")
        line = f"{k}: {v}"
        if "\r" in line or "\n" in line:
            # an injected CRLF would silently split into bogus header
            # lines (or terminate the block before the framing line) —
            # reject loudly instead of corrupting the record
            raise ValueError(f"CR/LF in WARC header {k!r}")
        lines.append(line.encode())
    lines.append(b"Content-Length: %d" % len(content))
    return CRLF.join(lines) + CRLF + CRLF + content + CRLF + CRLF


def encode_warc(records, gzip_per_record: bool = False) -> bytes:
    """Concatenate ``(headers, content)`` pairs into one WARC stream;
    ``gzip_per_record=True`` writes the .warc.gz layout (each record its
    own gzip member, the splittable crawl-archive convention)."""
    import gzip

    out = bytearray()
    for headers, content in records:
        rec = encode_warc_record(content, headers)
        # mtime=0 keeps encoded bytes deterministic (stage retries and
        # speculative duplicates must produce identical blobs)
        out += gzip.compress(rec, 6, mtime=0) if gzip_per_record else rec
    return bytes(out)


def encode_warc_indexed(records, gzip_per_record: bool = False):
    """`encode_warc` plus the CDX essentials: returns ``(warc_bytes,
    index)`` where ``index[i] = (offset, length)`` of record i — byte
    positions MEASURED while writing, not recomputed, so the index is
    ground truth for whatever the framing produces. For ``.warc.gz`` the
    offsets/lengths address whole gzip members, the standard CDX
    random-access contract (a reader seeks to a member boundary and
    inflates exactly one record)."""
    import gzip

    out = bytearray()
    index = []
    for headers, content in records:
        rec = encode_warc_record(content, headers)
        blob = gzip.compress(rec, 6, mtime=0) if gzip_per_record else rec
        index.append((len(out), len(blob)))
        out += blob
    return bytes(out), index


def read_warc_slice(blob: bytes, offset: int, length: int):
    """Parse exactly ONE record from a CDX-addressed byte range (plain or
    a single gzip member, sniffed). A range that frames anything other
    than one whole record — truncated, mid-record, or spanning members —
    raises ValueError: a stale index is an ingest error, not a row to
    silently mangle."""
    chunk = bytes(blob[offset : offset + length])
    if len(chunk) != length:
        raise ValueError("CDX range exceeds segment size")
    if chunk[:2] == _GZ_MAGIC:
        dec = zlib.decompressobj(wbits=31)
        try:
            chunk = dec.decompress(chunk)
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member at CDX offset: {e}") from None
        if not dec.eof or dec.unused_data:
            raise ValueError("CDX range does not frame one gzip member")
    recs = list(_parse_plain(chunk))
    if len(recs) != 1:
        raise ValueError("CDX range does not frame exactly one record")
    return recs[0]


CDX_SLICE_SCHEMA = T.StructType(
    [
        T.StructField("source_id", T.LongType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content", T.BinaryType(), False),
    ]
)


def read_warc_cdx(
    segments: DataFrame,
    cdx: DataFrame,
    id_col: str = "source_id",
    payload_col: str = "payload",
) -> DataFrame:
    """CDX-driven random access — the 100 TB read shape for targeted
    re-crawls: instead of scanning whole segments (`read_warc`), the
    (pre-filtered, tiny) CDX selection decides everything.

    ``cdx`` rows are (id_col, uri, offset, length). The per-segment hit
    lists are aggregated first, then INNER-joined to the segment blobs:
    a segment with no selected record is pruned before its payload
    column is ever materialized (with a parquet/object-store on-ramp the
    payload read never happens at all; at scale the aggregated selection
    is small and AQE broadcasts it). Each surviving segment is loaded
    once and all of its addressed ranges are sliced and parsed in one
    mapInPandas pass — total parse cost O(selected records), not
    O(archive). With ranged-GET storage the same plan pushes the
    (offset, length) pairs down to the store instead of slicing a
    loaded blob."""
    from pyspark.sql import functions as F

    hits = cdx.groupBy(id_col).agg(
        F.collect_list(F.struct("uri", "offset", "length")).alias("hits")
    )
    pruned = segments.join(hits, id_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for sid, blob, hh in zip(pdf[id_col], pdf[payload_col], pdf["hits"]):
                out: dict[str, list] = {f.name: [] for f in CDX_SLICE_SCHEMA.fields}
                for h in hh:
                    off, ln = int(h["offset"]), int(h["length"])
                    headers, content = read_warc_slice(bytes(blob), off, ln)
                    out["source_id"].append(int(sid))
                    out["offset"].append(off)
                    out["length"].append(ln)
                    out["warc_type"].append(headers.get("warc-type"))
                    out["target_uri"].append(headers.get("warc-target-uri"))
                    out["warc_date"].append(headers.get("warc-date"))
                    out["content"].append(content)
                if out["source_id"]:
                    yield pd.DataFrame(out)

    return pruned.mapInPandas(batches, CDX_SLICE_SCHEMA)


def read_warc_cdx_rows(joined: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-ROW CDX slicing for streaming use: ``joined`` already carries
    (source_id, offset, length, payload) — e.g. a CDX-hit STREAM
    inner-joined (stream-static) to the segment blobs — and each row is
    sliced and parsed independently (`read_warc_slice`), no per-segment
    grouping. Append-mode friendly: stateless mapInPandas, one output
    row per input row, so the same operator runs a continuous targeted
    re-crawl. The batch path (`read_warc_cdx`) groups hits per segment
    first — one blob materialization per segment; here the join dedups
    segment READS (stream-static joins broadcast-or-scan the static
    side) but a blob column copy rides each hit row, the price of
    append-mode streaming."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {f.name: [] for f in CDX_SLICE_SCHEMA.fields}
            for sid, off, ln, blob in zip(
                pdf["source_id"], pdf["offset"], pdf["length"], pdf[payload_col]
            ):
                headers, content = read_warc_slice(bytes(blob), int(off), int(ln))
                out["source_id"].append(int(sid))
                out["offset"].append(int(off))
                out["length"].append(int(ln))
                out["warc_type"].append(headers.get("warc-type"))
                out["target_uri"].append(headers.get("warc-target-uri"))
                out["warc_date"].append(headers.get("warc-date"))
                out["content"].append(content)
            if out["source_id"]:
                yield pd.DataFrame(out)

    return joined.select(
        "source_id", "offset", "length", payload_col
    ).mapInPandas(batches, CDX_SLICE_SCHEMA)


def _parse_plain(payload: bytes):
    pos = 0
    while pos < len(payload):
        # tolerate inter-record padding (extra CRLFs)
        while payload[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= len(payload):
            return
        end = payload.find(CRLF + CRLF, pos)
        if end < 0:
            raise ValueError("truncated WARC header block")
        head = payload[pos:end].split(CRLF)
        if not head[0].startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line {head[0][:20]!r}")
        headers: dict = {}
        for line in head[1:]:
            # ISO 28500 grammar is name ':' [value] with OPTIONAL whitespace
            # — 'Content-Length:1234' (no space) is a valid archive
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line[:40]!r}")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/invalid Content-Length") from None
        body_at = end + 4
        content = payload[body_at : body_at + clen]
        if len(content) != clen:
            raise ValueError("truncated WARC record body")
        yield headers, content
        pos = body_at + clen


_GZ_CHUNK = 1 << 20


def parse_warc(payload: bytes):
    """Yield ``(headers, content)`` per record; headers are lower-cased
    name -> value. Dispatches on the gzip magic: a .warc.gz stream is
    decompressed member-by-member, feeding bounded chunks off a
    memoryview (linear in segment size — a suffix-copy-per-member loop
    would be quadratic over the ~1e5 members of a real crawl segment).
    Malformed framing raises ValueError."""
    if payload[:2] == _GZ_MAGIC:
        view = memoryview(payload)
        pos = 0
        while pos < len(view):
            dec = zlib.decompressobj(wbits=31)
            member = bytearray()
            try:
                while not dec.eof and pos < len(view):
                    chunk = view[pos : pos + _GZ_CHUNK]
                    pos += len(chunk)
                    member += dec.decompress(chunk)
            except zlib.error as e:
                raise ValueError(f"corrupt gzip member: {e}") from None
            if not dec.eof:
                raise ValueError("truncated gzip member")
            pos -= len(dec.unused_data)  # rewind to the next member's start
            yield from _parse_plain(bytes(member))
    else:
        yield from _parse_plain(payload)


HTTP_RECORD_SCHEMA = T.StructType(
    list(WARC_RECORD_SCHEMA.fields)
    + [
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("http_content_type", T.StringType(), True),
        T.StructField("http_body", T.BinaryType(), True),
    ]
)


def parse_http_response(content: bytes):
    """Split a WARC response record's HTTP payload into (status, headers,
    body) — crawl archives store the raw HTTP exchange, so extracting the
    document body is the stage right after record parsing. Headers are
    lower-cased name -> value. Returns None when the content is not an
    HTTP response message (e.g. a WET/metadata record's bare text)."""
    if not content.startswith(b"HTTP/"):
        return None
    sep = content.find(CRLF + CRLF)
    if sep < 0:
        return None
    head = content[:sep].split(CRLF)
    parts = head[0].split(None, 2)
    if len(parts) < 2 or not parts[1].isdigit():
        return None
    headers: dict = {}
    for line in head[1:]:
        k, s, v = line.partition(b":")
        if s:
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
    return int(parts[1]), headers, content[sep + 4 :]


def read_warc_dir(
    spark, path: str, glob: str | None = None, http: bool = False
) -> DataFrame:
    """The production on-ramp: a directory of .warc / .warc.gz segment
    files (Spark's binaryFile source — listing-time pruning via
    pathGlobFilter, one row per file) exploded to one row per record.
    ``source_id`` is the stable path hash, mirroring `read_media_dir`."""
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    blobs = reader.load(path).select(
        F.xxhash64("path").alias("source_id"),
        F.col("content").alias("payload"),
    )
    return read_warc(blobs, http=http)


def read_warc(
    blobs: DataFrame,
    id_col: str = "source_id",
    payload_col: str = "payload",
    http: bool = False,
) -> DataFrame:
    """One row per WARC record from a DataFrame of WARC blobs (plain or
    .warc.gz, sniffed per blob). Parsing is a stateless mapInPandas —
    embarrassingly parallel, streams under Structured Streaming unchanged.
    A malformed blob fails its task loudly (a crawl segment that doesn't
    parse is an ingest error, not a row to silently drop).

    ``http=True`` additionally splits each record's HTTP response message
    (status, Content-Type, body) into nullable columns — null where the
    content isn't an HTTP message (the raw content column is always kept)."""
    schema = HTTP_RECORD_SCHEMA if http else WARC_RECORD_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one output DataFrame PER BLOB: peak worker memory is bounded by
        # one decompressed segment, not every segment in the Arrow batch —
        # the property the module docstring promises for multi-GB segments
        for pdf in it:
            for sid, blob in zip(pdf[id_col], pdf[payload_col]):
                out: dict[str, list] = {f.name: [] for f in schema.fields}
                for idx, (headers, content) in enumerate(parse_warc(bytes(blob))):
                    out["source_id"].append(int(sid))
                    out["record_idx"].append(idx)
                    out["warc_type"].append(headers.get("warc-type"))
                    out["target_uri"].append(headers.get("warc-target-uri"))
                    out["warc_date"].append(headers.get("warc-date"))
                    out["content"].append(content)
                    if http:
                        resp = parse_http_response(content)
                        if resp is None:
                            out["http_status"].append(None)
                            out["http_content_type"].append(None)
                            out["http_body"].append(None)
                        else:
                            status, hh, body = resp
                            out["http_status"].append(status)
                            out["http_content_type"].append(hh.get("content-type"))
                            out["http_body"].append(body)
                if not out["source_id"]:
                    continue  # empty segment: skip the empty Arrow batch
                if http:
                    out["http_status"] = pd.array(out["http_status"], dtype="Int32")
                yield pd.DataFrame(out)

    return blobs.select(id_col, payload_col).mapInPandas(batches, schema)
