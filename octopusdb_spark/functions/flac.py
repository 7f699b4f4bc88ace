"""FLAC codec — lossless compressed audio, decoded FOR REAL in pure
Python (no codec libraries): the FOURTH entropy-codec family in the
multimodal surface (Rice/Golomb coding, after DEFLATE/PNG, LZW/GIF and
Huffman+DCT/JPEG), and the first COMPRESSED audio container (WAV is raw
PCM).

Decoder scope (r13: the subset real-world encoders actually emit):
fLaC marker, STREAMINFO + skipped metadata blocks, fixed-blocking
frames with CRC-8-checked headers and CRC-16-checked footers, subframe
types CONSTANT / VERBATIM / FIXED order 0-4 / LPC orders 1-32
(quantized coefficients + arithmetic shift) with wasted-bits support,
Rice residuals (4- and 5-bit parameter variants, any partition order,
escape partitions), mono AND stereo with all four channel assignments
(independent, left/side, right/side, mid/side — side subframes carry
bps+1 bits per the spec). Variable blocking, >2 channels, and non-16-bit
depths raise ValueError -> the caller's stub fallback, the same explicit
boundary the other decoders use. Lossless means decode(encode(x)) == x
EXACTLY, so the correctness-gate oracle is pure sample arithmetic — no
constant-block tricks needed (contrast the lossy JPEG lanes).

The matching encoder writes mono or stereo streams with per-frame
best-of predictors — fixed orders 0-2 and/or real LPC (windowless
autocorrelation + Levinson-Durbin, error-feedback coefficient
quantization at precision 12) — per-subframe optimal Rice parameters,
and per-frame best-of stereo decorrelation (or a forced mode), with
VERBATIM as the universal cost ceiling. Entropy-coded for real; a real
size win on smooth signals.

Spec constants (sync code, CRC-8 poly 0x07, CRC-16 poly 0x8005, fixed
predictor coefficients, Rice zigzag) are public xiph.org FLAC format
data. The reference engine (zach030/OctopusDB) has no media layer; this
rides the driver mandate's multimodal surface.
"""

from __future__ import annotations

FLAC_SIG = b"fLaC"

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ _CRC8_POLY) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ _CRC16_POLY) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitWriter:
    """MSB-first bit packer (no byte stuffing — that's a JPEG-ism)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def put_unary(self, q: int) -> None:
        """FLAC unary: q zero bits then a one bit."""
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def append_from(self, other: "_BitWriter") -> None:
        """Splice another writer's bits (whole bytes + partial tail) —
        lets subframe candidates be costed in isolation then spliced
        into the frame body without re-encoding."""
        for b in other.out:
            self.put(b, 8)
        if other.n:
            self.put(other.acc & ((1 << other.n) - 1), other.n)

    def bit_length(self) -> int:
        return 8 * len(self.out) + self.n

    def bytes(self) -> bytes:
        assert self.n == 0, "unaligned"
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position of the NEXT byte to load
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def signed(self, k: int) -> int:
        v = self.bits(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bit() == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway FLAC unary code")
        return q

    def align(self) -> None:
        self.n = 0


# fixed predictor coefficients by order (FLAC format spec):
# residual[i] = x[i] - sum(coef[j] * x[i-1-j])
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _utf8_code(n: int) -> bytes:
    """The frame-number coding (UTF-8-style, up to 36 bits). An
    nbytes-long code carries (7 - nbytes) payload bits in the lead byte
    plus 6 per continuation: 5*nbytes + 1 total — the review-fixed
    bound (the first cut mis-sized it and corrupted frame numbers
    >= 2048, i.e. any stream past ~2048 frames)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)):  # capacity of an nbytes code
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _utf8_decode(r: _BitReader) -> int:
    b0 = r.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC coded number")
    v = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = r.bits(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("invalid FLAC coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _zigzag(e: int) -> int:
    return (e << 1) if e >= 0 else (-(e << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _best_rice_k(residuals) -> int:
    if not residuals:
        return 0
    total = sum(_zigzag(e) for e in residuals)
    mean = total / len(residuals)
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    return k


_LPC_PRECISION = 12  # qlp coefficient precision the encoder emits
_LPC_ORDERS = (2, 4, 8)  # analysis orders the encoder tries


def _lpc_analyze(block, order: int, precision: int = _LPC_PRECISION):
    """Hann-windowed autocorrelation + Levinson-Durbin, then
    error-feedback quantization to ``precision``-bit signed coefficients
    with a shift in [1, 15]. The window matters: rectangular
    autocorrelation's edge effects bias a sinusoid's AR(2) poles inward
    (~1.94 instead of 2cos(w)), leaving LPC WORSE than the fixed
    predictors; windowed, residuals drop ~17x (libFLAC defaults to
    Tukey for the same reason). Raises ValueError on degenerate/unstable
    input (constant or near-zero blocks) — the caller falls through to
    other predictors. Float analysis only steers COMPRESSION;
    losslessness is carried by the integer residual path, which mirrors
    the decoder exactly."""
    import math

    n = len(block)
    if n < 2:
        raise ValueError("block too short for LPC")
    x = [
        s * (0.5 - 0.5 * math.cos(2.0 * math.pi * i / (n - 1)))
        for i, s in enumerate(block)
    ]
    autoc = [
        sum(x[i] * x[i + lag] for i in range(n - lag)) for lag in range(order + 1)
    ]
    if autoc[0] <= 0.0:
        raise ValueError("degenerate autocorrelation")
    err = autoc[0]
    lpc = [0.0] * order
    for i in range(order):
        acc = autoc[i + 1]
        for j in range(i):
            acc -= lpc[j] * autoc[i - j]
        if err <= 0.0:
            raise ValueError("unstable LPC")
        refl = acc / err
        nxt = lpc[:]
        nxt[i] = refl
        for j in range(i):
            nxt[j] = lpc[j] - refl * lpc[i - 1 - j]
        lpc = nxt
        err *= 1.0 - refl * refl
    cmax = max(abs(c) for c in lpc)
    if cmax == 0.0 or not math.isfinite(cmax):
        raise ValueError("degenerate LPC coefficients")
    # |c| < 2**e (frexp) -> shift = precision-1-e keeps |q| < 2**(precision-1)
    shift = precision - 1 - math.frexp(cmax)[1]
    shift = max(1, min(15, shift))
    qmax = (1 << (precision - 1)) - 1
    qmin = -(1 << (precision - 1))
    q = []
    carry = 0.0
    for c in lpc:
        v = c * (1 << shift) + carry
        qi = max(qmin, min(qmax, int(math.floor(v + 0.5))))
        carry = v - qi
        q.append(qi)
    if all(v == 0 for v in q):
        raise ValueError("all-zero quantized LPC")
    return q, shift


def _rice_cost(res, k: int) -> int:
    return sum((_zigzag(e) >> k) + 1 + k for e in res)


def _put_residual(body: _BitWriter, res, k: int) -> None:
    body.put(0b00, 2)  # rice method, 4-bit params
    body.put(0, 4)  # partition order 0
    body.put(k, 4)
    for e in res:
        u = _zigzag(e)
        body.put_unary(u >> k)
        if k:
            body.put(u & ((1 << k) - 1), k)


def _encode_subframe(block, bps: int, predictors) -> _BitWriter:
    """One subframe into a fresh writer: CONSTANT for flat blocks, else
    the cheapest of the allowed predictor families (fixed 0-2 and/or LPC
    at `_LPC_ORDERS`) by exact Rice bit cost, with VERBATIM as the
    universal ceiling (also the fallback when a forced family doesn't
    fit the block — e.g. LPC-only on a tail block shorter than the
    order)."""
    body = _BitWriter()
    n = len(block)
    mask = (1 << bps) - 1
    body.put(0, 1)
    if all(s == block[0] for s in block):
        body.put(0b000000, 6)  # CONSTANT
        body.put(0, 1)  # no wasted bits
        body.put(block[0] & mask, bps)
        return body
    # (cost_bits, kind, order, res, k, qcoefs, shift)
    best = (n * bps, "verbatim", 0, None, 0, None, 0)
    if "fixed" in predictors:
        for order in (0, 1, 2):
            if n <= order:
                continue
            coefs = _FIXED_COEFS[order]
            res = [
                block[i] - sum(c * block[i - 1 - j] for j, c in enumerate(coefs))
                for i in range(order, n)
            ]
            k = _best_rice_k(res)
            cost = order * bps + 2 + 4 + 4 + _rice_cost(res, k)
            if cost < best[0]:
                best = (cost, "fixed", order, res, k, None, 0)
    if "lpc" in predictors:
        for order in _LPC_ORDERS:
            if n <= 2 * order:
                continue
            try:
                qcoefs, shift = _lpc_analyze(block, order)
            except ValueError:
                continue
            res = [
                block[i]
                - (
                    sum(c * block[i - 1 - j] for j, c in enumerate(qcoefs))
                    >> shift
                )
                for i in range(order, n)
            ]
            k = _best_rice_k(res)
            cost = (
                order * bps + 4 + 5 + order * _LPC_PRECISION
                + 2 + 4 + 4 + _rice_cost(res, k)
            )
            if cost < best[0]:
                best = (cost, "lpc", order, res, k, qcoefs, shift)
    _cost, kind, order, res, k, qcoefs, shift = best
    if kind == "verbatim":
        body.put(0b000001, 6)
        body.put(0, 1)
        for s in block:
            body.put(s & mask, bps)
        return body
    if kind == "fixed":
        body.put(0b001000 | order, 6)
    else:
        body.put(0b100000 | (order - 1), 6)  # LPC
    body.put(0, 1)  # no wasted bits
    for w in block[:order]:
        body.put(w & mask, bps)
    if kind == "lpc":
        body.put(_LPC_PRECISION - 1, 4)
        body.put(shift, 5)  # spec: signed, but encoders only emit >= 0
        for c in qcoefs:
            body.put(c & ((1 << _LPC_PRECISION) - 1), _LPC_PRECISION)
    _put_residual(body, res, k)
    return body


# stereo channel assignments: frame-header code + per-subframe extra bit
# (the SIDE channel carries bps+1 bits, FLAC format spec §frame header)
_STEREO_MODES = {
    "independent": 0b0001,
    "left_side": 0b1000,
    "right_side": 0b1001,
    "mid_side": 0b1010,
}


def _stereo_subblocks(mode: str, left, right):
    """The two channel signals a given assignment encodes, with bps."""
    if mode == "independent":
        return [(left, 16), (right, 16)]
    side = [l - r for l, r in zip(left, right)]
    if mode == "left_side":
        return [(left, 16), (side, 17)]
    if mode == "right_side":
        return [(side, 17), (right, 16)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    return [(mid, 16), (side, 17)]


def encode_flac(
    samples,
    sample_rate: int = 8000,
    block_size: int = 4096,
    channels: int = 1,
    stereo_mode: str = "best",
    predictors=("fixed",),
) -> bytes:
    """16-bit FLAC from an iterable of int samples (interleaved LRLR...
    when ``channels`` == 2): per frame the cheapest of the allowed
    predictor families per subframe by exact Rice cost (``predictors``
    may include "fixed" and/or "lpc"; VERBATIM is always the ceiling),
    partition order 0, per-subframe optimal Rice parameter, CONSTANT
    subframes for flat blocks, and for stereo the cheapest of the four
    channel assignments (or a forced ``stereo_mode`` from
    independent/left_side/right_side/mid_side) — real entropy-coded
    compression, losslessly invertible."""
    samples = [int(s) for s in samples]
    if channels not in (1, 2):
        raise ValueError("encode_flac supports 1 or 2 channels")
    if not samples or len(samples) % channels:
        raise ValueError("empty or non-rectangular FLAC input")
    if any(s < -32768 or s > 32767 for s in samples):
        raise ValueError("samples out of int16 range")
    if not 16 <= block_size <= 65535:
        raise ValueError("block_size out of range")
    if stereo_mode != "best" and stereo_mode not in _STEREO_MODES:
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")

    nframes = len(samples) // channels  # per-channel (inter-channel) count
    # STREAMINFO (34 bytes)
    si = _BitWriter()
    nblocks = (nframes + block_size - 1) // block_size
    last_len = nframes - (nblocks - 1) * block_size
    si.put(min(block_size, last_len) if nblocks > 1 else last_len, 16)  # min
    si.put(block_size if nblocks > 1 else last_len, 16)  # max blocksize
    si.put(0, 24)  # min framesize unknown
    si.put(0, 24)  # max framesize unknown
    si.put(sample_rate, 20)
    si.put(channels - 1, 3)
    si.put(15, 5)  # bits per sample - 1
    si.put(nframes, 36)
    si.align()
    streaminfo = si.bytes() + b"\x00" * 16  # md5 unknown (spec: zeros)

    out = bytearray(FLAC_SIG)
    out += bytes([0x80, 0, 0, 34]) + streaminfo  # last-block flag + type 0

    for fi in range(nblocks):
        lo, hi = fi * block_size, min((fi + 1) * block_size, nframes)
        n = hi - lo
        if channels == 1:
            ch_code = 0
            subs = [_encode_subframe(samples[lo:hi], 16, predictors)]
        else:
            left = samples[2 * lo : 2 * hi : 2]
            right = samples[2 * lo + 1 : 2 * hi : 2]
            modes = (
                _STEREO_MODES if stereo_mode == "best"
                else {stereo_mode: _STEREO_MODES[stereo_mode]}
            )
            pick = None
            for mode, code in modes.items():
                cand = [
                    _encode_subframe(blk, bps, predictors)
                    for blk, bps in _stereo_subblocks(mode, left, right)
                ]
                bits = sum(c.bit_length() for c in cand)
                if pick is None or bits < pick[0]:
                    pick = (bits, code, cand)
            _bits, ch_code, subs = pick
        hdr = _BitWriter()
        hdr.put(0b11111111111110, 14)
        hdr.put(0, 1)  # reserved
        hdr.put(0, 1)  # fixed blocking
        hdr.put(0b0111, 4)  # blocksize: 16-bit at end of header
        hdr.put(0, 4)  # sample rate: from STREAMINFO
        hdr.put(ch_code, 4)  # channel assignment
        hdr.put(0b100, 3)  # 16 bits per sample
        hdr.put(0, 1)  # reserved
        hdr.align()
        head = hdr.bytes() + _utf8_code(fi)
        bs = _BitWriter()
        bs.put(n - 1, 16)
        bs.align()
        head += bs.bytes()
        head += bytes([_crc8(head)])

        body = _BitWriter()
        for sub in subs:
            body.append_from(sub)
        body.align()
        frame = head + body.bytes()
        crc = _crc16(frame)
        out += frame + bytes([crc >> 8, crc & 0xFF])
    return bytes(out)


_MAX_FLAC_SAMPLES = 1 << 26  # decode bound: the PNG zip-bomb rule


def _decode_residual(r: _BitReader, n: int, order: int) -> list:
    """Rice-coded residual section shared by FIXED and LPC subframes:
    rice/rice2 methods, any partition order, escape partitions."""
    method = r.bits(2)
    if method not in (0, 1):
        raise ValueError("reserved FLAC residual method")
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    porder = r.bits(4)
    npart = 1 << porder
    if n % npart:
        raise ValueError("FLAC partition does not divide blocksize")
    res: list = []
    for p in range(npart):
        cnt = (n >> porder) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("FLAC partition smaller than order")
        k = r.bits(kbits)
        if k == escape:
            raw = r.bits(5)
            res.extend(r.signed(raw) if raw else 0 for _ in range(cnt))
        else:
            for _ in range(cnt):
                u = (r.unary() << k) | (r.bits(k) if k else 0)
                res.append(_unzigzag(u))
    return res


def _decode_subframe(r: _BitReader, n: int, bps: int) -> list:
    """One subframe at ``bps`` bits (bps+1 for stereo SIDE channels):
    CONSTANT / VERBATIM / FIXED 0-4 / LPC 1-32 with wasted bits."""
    if r.bits(1) != 0:
        raise ValueError("bad FLAC subframe padding bit")
    stype = r.bits(6)
    wasted = 0
    if r.bits(1):
        wasted = 1 + r.unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if stype == 0:
        block = [r.signed(eff)] * n
    elif stype == 1:
        block = [r.signed(eff) for _ in range(n)]
    elif 0b001000 <= stype <= 0b001100:
        order = stype & 0x07
        block = [r.signed(eff) for _ in range(order)]
        res = _decode_residual(r, n, order)
        coefs = _FIXED_COEFS[order]
        for e in res:
            pred = sum(c * block[len(block) - 1 - j] for j, c in enumerate(coefs))
            block.append(e + pred)
    elif stype >= 0b100000:
        order = (stype & 0x1F) + 1
        if n < order:
            raise ValueError("FLAC LPC order exceeds blocksize")
        block = [r.signed(eff) for _ in range(order)]
        prec = r.bits(4)
        if prec == 0b1111:
            raise ValueError("invalid FLAC LPC coefficient precision")
        prec += 1
        shift = r.signed(5)
        if shift < 0:
            # spec marks negative shifts reserved; no encoder emits them
            raise ValueError("negative FLAC LPC shift")
        coefs = [r.signed(prec) for _ in range(order)]
        res = _decode_residual(r, n, order)
        for e in res:
            pred = (
                sum(c * block[len(block) - 1 - j] for j, c in enumerate(coefs))
                >> shift
            )
            block.append(e + pred)
    else:
        raise ValueError(f"unsupported FLAC subframe type {stype:#08b}")
    if len(block) != n:
        raise ValueError("FLAC subframe sample count mismatch")
    if wasted:
        block = [s << wasted for s in block]
    return block


def decode_flac(payload: bytes) -> dict:
    """Parse FLAC FOR REAL: STREAMINFO walk, frame headers verified by
    CRC-8, subframes (constant / verbatim / fixed 0-4 / LPC 1-32 with
    quantized-coefficient arithmetic-shift reconstruction, wasted bits),
    Rice residuals (rice/rice2, any partition order, escape partitions),
    stereo decorrelation (independent, left/side, right/side, mid/side),
    CRC-16 frame footers — then exact integer sample moments over the
    interleaved stream. Returns the wav-shaped feature dict."""
    if payload[:4] != FLAC_SIG:
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            r = _BitReader(body)
            r.bits(16)  # min blocksize
            r.bits(16)  # max blocksize
            r.bits(24)
            r.bits(24)
            rate = r.bits(20)
            channels = r.bits(3) + 1
            bps = r.bits(5) + 1
            total = r.bits(36)
            streaminfo = (rate, channels, bps, total)
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC stream without STREAMINFO")
    rate, channels, bps, total = streaminfo
    if channels not in (1, 2):
        raise ValueError(">2-channel FLAC unsupported")
    if bps != 16:
        raise ValueError("non-16-bit FLAC unsupported")
    if total == 0:
        # spec-legal "unknown length" — but this decoder's moments need a
        # definite count; ValueError keeps the stub-fallback contract
        # (a ZeroDivisionError would escape decode_media's catch list)
        raise ValueError("FLAC stream with unknown/zero total samples")
    if total * channels > _MAX_FLAC_SAMPLES:
        raise ValueError("FLAC length outside decode bound")

    samples: list = []  # interleaved output
    decoded = 0  # inter-channel (per-channel) samples decoded
    while pos < len(payload) and decoded < total:
        frame_start = pos
        r = _BitReader(payload, pos)
        if r.bits(14) != 0b11111111111110:
            raise ValueError("FLAC frame sync lost")
        r.bits(1)  # reserved
        if r.bits(1) != 0:
            raise ValueError("variable-blocking FLAC unsupported")
        bs_code = r.bits(4)
        sr_code = r.bits(4)
        ch_code = r.bits(4)
        ss_code = r.bits(3)
        r.bits(1)  # reserved
        if channels == 1:
            if ch_code != 0:
                raise ValueError("stereo frame in a mono FLAC stream")
        elif ch_code not in (0b0001, 0b1000, 0b1001, 0b1010):
            raise ValueError(
                f"unsupported FLAC channel assignment {ch_code:#06b}"
            )
        if ss_code not in (0, 0b100):
            raise ValueError("frame sample size != 16 unsupported")
        _frame_no = _utf8_decode(r)
        if bs_code == 0b0110:
            n = r.bits(8) + 1
        elif bs_code == 0b0111:
            n = r.bits(16) + 1
        elif bs_code == 0b0001:
            n = 192
        elif 0b0010 <= bs_code <= 0b0101:
            n = 576 << (bs_code - 2)
        elif 0b1000 <= bs_code <= 0b1111:
            n = 256 << (bs_code - 8)
        else:
            raise ValueError(f"reserved FLAC blocksize code {bs_code}")
        if sr_code == 0b1100:
            r.bits(8)
        elif sr_code in (0b1101, 0b1110):
            r.bits(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid FLAC sample-rate code")
        # header CRC-8 covers everything up to here
        hdr_end = r.pos  # aligned: all header fields are whole bits -> bytes
        if r.n != 0:
            raise ValueError("unaligned FLAC frame header")
        if _crc8(payload[frame_start:hdr_end]) != r.bits(8):
            raise ValueError("FLAC frame header CRC mismatch")

        if channels == 1:
            block = _decode_subframe(r, n, 16)
        else:
            # side channels carry one extra bit (format spec)
            bps0 = 17 if ch_code == 0b1001 else 16
            bps1 = 17 if ch_code in (0b1000, 0b1010) else 16
            sub0 = _decode_subframe(r, n, bps0)
            sub1 = _decode_subframe(r, n, bps1)
            if ch_code == 0b0001:
                left, right = sub0, sub1
            elif ch_code == 0b1000:  # left/side
                left = sub0
                right = [l - s for l, s in zip(sub0, sub1)]
            elif ch_code == 0b1001:  # side/right
                right = sub1
                left = [rr + s for s, rr in zip(sub0, sub1)]
            else:  # mid/side
                left, right = [], []
                for mid, side in zip(sub0, sub1):
                    m2 = (mid << 1) | (side & 1)
                    left.append((m2 + side) >> 1)
                    right.append((m2 - side) >> 1)
            block = [v for pair in zip(left, right) for v in pair]
        r.align()
        body_end = r.pos
        if _crc16(payload[frame_start:body_end]) != r.bits(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = r.pos
        samples.extend(block)
        decoded += n
    if decoded != total:
        raise ValueError("FLAC sample count mismatch vs STREAMINFO")
    m = len(samples)
    s1 = sum(samples)
    s2 = sum(s * s for s in samples)
    return {
        "container": "flac", "width": None, "height": None,
        "n_samples": decoded, "sample_rate": rate, "channels": channels,
        "mean": s1 / m, "rms": (s2 / m) ** 0.5,
    }
