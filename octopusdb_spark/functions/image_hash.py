"""Perceptual image hashing — the multimodal analog of MinHash for the
near-duplicate problem a crawl pipeline faces on IMAGES: resized,
re-encoded, or brightness-shifted copies of the same picture must
collide while different pictures must not. Two classic hashes, both in
EXACT integer arithmetic (so a DuckDB oracle replicates every bit):

- **dHash** (gradient hash): block-average the grayscale image to a
  9x8 grid, then each bit records whether a cell is brighter than its
  right neighbor — 8 comparisons x 8 rows = 64 bits. Invariant to any
  global brightness shift (all cells move together) and to re-encoding
  across lossless containers.
- **pHash** (frequency hash): block-average to an 8x8 grid, apply an
  integer 8x8 DCT-II (the matrix below — rounded from the orthonormal
  cosine basis, scaled by 64; every u>0 row sums to EXACTLY zero, so a
  global brightness shift moves only the DC coefficient), then each
  bit records whether a coefficient exceeds the mean of the 63 AC
  coefficients (compared as ``63*T > sum_ac`` — no division, no
  rounding ambiguity).

Hashes are packed into SIGNED 64-bit integers (bit 63 carries weight
-2^63) so Spark BIGINT and DuckDB BIGINT hold identical values and
``bit_count(xor(a, b))`` is the hamming distance on both engines.

The pairing strategy rides the SimHash band machinery's logic
(``queries/dedup.py``): 4 x 16-bit bands of the dHash; candidates share
at least one band; the exact re-score keeps hamming <= 3. By pigeonhole
a pair within hamming 3 of 64 bits cannot differ in all 4 bands, so the
banded plan finds EXACTLY the same pairs as a full cross join — the
oracle does the cross join (tiny at test scale), the Spark plan never
does (the 100 TB shape).

The reference engine (zach030/OctopusDB) has no media layer; this rides
the driver mandate's training-data-pipeline surface. pHash/dHash are
public-domain algorithms (Krawetz's "Looks Like It" description).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Integer DCT-II basis, round(64 * orthonormal): row 0 is the DC row
# (constant 23); every later row sums to exactly 0, which is what makes
# the brightness-invariance argument exact rather than approximate.
DCT8 = (
    (23, 23, 23, 23, 23, 23, 23, 23),
    (31, 27, 18, 6, -6, -18, -27, -31),
    (30, 12, -12, -30, -30, -12, 12, 30),
    (27, -6, -31, -18, 18, 31, 6, -27),
    (23, -23, -23, 23, 23, -23, -23, 23),
    (18, -31, 6, 27, -27, -6, 31, -18),
    (12, -30, 30, -12, -12, 30, -30, 12),
    (6, -18, 27, -31, 31, -27, 18, -6),
)

_DCT8_NP = np.array(DCT8, dtype=np.int64)


def pattern_rgb(ax: int, ay: int, k: int, c: int, delta: int = 0,
                w: int = 72, h: int = 64) -> bytes:
    """The gate rows' deterministic grayscale test pattern:
    v(x,y) = (ax*x + ay*y + ((x*y) % 7)*k + c) % 200 + delta, emitted
    as w*h*3 RGB bytes (r=g=b). Values stay under 200 so any delta up
    to 55 never clamps — the exact closed form the DuckDB oracles
    replicate, kept in ONE place so Spark rows, stream twins, and
    tests cannot drift."""
    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]
    v = (ax * xs + ay * ys + ((xs * ys) % 7) * k + c) % 200 + delta
    return np.repeat(v.astype(np.uint8).reshape(-1), 3).tobytes()


def _signed64(h: int) -> int:
    """Pack 64 hash bits into the signed two's-complement value both
    Spark and DuckDB BIGINTs carry."""
    return h - (1 << 64) if h >= (1 << 63) else h


def _grid_from_gray(gray: np.ndarray, gw: int, gh: int) -> np.ndarray:
    """Block-average a (h, w) int grayscale matrix to a gw x gh grid;
    dimensions must tile evenly (resampling policy belongs to the
    resize operator, not the hash)."""
    h, w = gray.shape
    if w % gw or h % gh:
        raise ValueError(f"{w}x{h} image does not tile a {gw}x{gh} grid")
    bw, bh = w // gw, h // gh
    return gray.reshape(gh, bh, gw, bw).sum(axis=(1, 3)) // (bw * bh)


def gray_grid(rgb: bytes, w: int, h: int, gw: int, gh: int) -> np.ndarray:
    """Block-average the (r+g+b)//3 grayscale of a w*h RGB image down to
    a gw x gh integer grid. w/h must divide evenly (the builders pick
    72x64 so both the 9x8 dHash and 8x8 pHash grids tile exactly)."""
    a = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64)
    if a.size != w * h * 3:
        raise ValueError("pixel buffer size mismatch")
    return _grid_from_gray(a.reshape(h, w, 3).sum(axis=2) // 3, gw, gh)


def _pack_dhash(g: np.ndarray) -> int:
    bits = (g[:, :8] > g[:, 1:]).astype(np.uint64)
    weights = (1 << (np.arange(8, dtype=np.uint64)[None, :]
                     + 8 * np.arange(8, dtype=np.uint64)[:, None]))
    return _signed64(int((bits * weights).sum()))


def dhash64(rgb: bytes, w: int, h: int) -> int:
    """Gradient hash: 9x8 grid, bit (r,c) = grid[r][c] > grid[r][c+1],
    packed row-major into a signed 64-bit int."""
    return _pack_dhash(gray_grid(rgb, w, h, 9, 8))


def dhash64_gray(gray: np.ndarray) -> int:
    """dHash of an (h, w) int grayscale matrix — the per-frame lane for
    video fingerprints, identical grid/packing to the RGB entry point."""
    return _pack_dhash(_grid_from_gray(np.asarray(gray, dtype=np.int64),
                                       9, 8))


def phash64(rgb: bytes, w: int, h: int) -> int:
    """Frequency hash: 8x8 grid -> integer DCT (C @ G @ C.T) -> bit
    (u,v) = 63*T[u][v] > sum(AC coefficients), packed row-major."""
    g = gray_grid(rgb, w, h, 8, 8)
    t = _DCT8_NP @ g @ _DCT8_NP.T
    ac_sum = int(t.sum()) - int(t[0, 0])
    bits = (63 * t > ac_sum).astype(np.uint64)
    weights = (1 << (np.arange(8, dtype=np.uint64)[None, :]
                     + 8 * np.arange(8, dtype=np.uint64)[:, None]))
    return _signed64(int((bits * weights).sum()))


def _decode_rgb(payload: bytes) -> tuple:
    """(w, h, rgb) from the lossless containers the hash lanes use —
    PPM or BMP by magic (the two encoders whose decode round-trips are
    already pinned in the multimodal suite)."""
    from octopusdb_spark.functions.multimodal import _bmp_pixels, _ppm_pixels

    if payload[:2] == b"P6":
        return _ppm_pixels(payload)
    if payload[:2] == b"BM":
        return _bmp_pixels(payload)
    raise ValueError("unsupported image container for hashing")


IMAGE_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("dhash", T.LongType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


VIDEO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("hashes", T.ArrayType(T.LongType()), True),
    ]
)


def video_fingerprints(media_df: DataFrame) -> DataFrame:
    """VIDEO fingerprinting (r15): one dHash per frame of a mono Y4M
    stream — the per-frame lane of the image hash, so a re-encoded or
    globally brightness-shifted copy of a clip carries the IDENTICAL
    hash sequence. Matching pairs consecutive-frame shingles (the
    queries layer), never raw frames. Stateless Arrow batches; a
    malformed stream (truncated frame, non-mono colorspace) records
    decoded=False — the loud fallback."""
    from octopusdb_spark.functions.multimodal import _y4m_parse

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict = {f.name: [] for f in VIDEO_FP_SCHEMA.fields}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    (w, h, _n, _d, _ch, cs), frames = _y4m_parse(bytes(p))
                    if cs != "mono":
                        raise ValueError("fingerprint lane is mono Y4M")
                    hashes = [
                        dhash64_gray(
                            np.frombuffer(f, dtype=np.uint8)
                            .astype(np.int64).reshape(h, w)
                        )
                        for f in frames
                    ]
                    if not hashes:
                        raise ValueError("Y4M stream with no frames")
                except (ValueError, struct.error, IndexError):
                    hashes = None
                out["media_id"].append(int(mid))
                out["decoded"].append(hashes is not None)
                out["n_frames"].append(
                    len(hashes) if hashes is not None else None
                )
                out["hashes"].append(hashes)
            yield pd.DataFrame(
                {
                    k: pd.array(v, dtype="Int64") if k == "n_frames" else v
                    for k, v in out.items()
                }
            )

    return media_df.mapInPandas(batches, VIDEO_FP_SCHEMA)


def image_hashes(media_df: DataFrame) -> DataFrame:
    """Partition-parallel perceptual hashing via mapInPandas — stateless
    Arrow batches, one output row per image, the same 100 TB shape as
    the other media walks. Malformed payloads record decoded=False with
    null hashes (loud fallback, never a batch failure)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict = {f.name: [] for f in IMAGE_HASH_SCHEMA.fields}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, rgb = _decode_rgb(bytes(p))
                    row = (dhash64(rgb, w, h), phash64(rgb, w, h))
                except (ValueError, struct.error, IndexError):
                    row = None
                out["media_id"].append(int(mid))
                out["decoded"].append(row is not None)
                out["dhash"].append(row[0] if row else None)
                out["phash"].append(row[1] if row else None)
            yield pd.DataFrame(
                {
                    k: pd.array(v, dtype="Int64")
                    if k in ("dhash", "phash") else v
                    for k, v in out.items()
                }
            )

    return media_df.mapInPandas(batches, IMAGE_HASH_SCHEMA)
