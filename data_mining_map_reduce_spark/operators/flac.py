"""Pure-integer FLAC decode (r12) — the last realistically
library-free audio format through the multimodal codec seam.

FLAC (RFC 9639 / xiph.org format spec) is lossless integer-only
compression: every stage below is exact integer arithmetic, so a
stdlib+numpy decoder reproduces the PCM bit-for-bit with no codec
library. Scope mirrors the other real decoders (operators/jpeg.py,
multimodal._decode_wav — and like them this file has no counterpart
in the reference repo, whose media handling is out of scope; the
reference is RDD scripts over Yelp text, e.g. Assignment1/task1.py):

- container: fLaC magic + metadata blocks (STREAMINFO parsed, others
  skipped)
- frames: both blocking strategies, CRC-8-verified headers,
  CRC-16-verified frames
- subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (any order),
  wasted bits
- residual: Rice / Rice2 partitions including the escaped
  raw-bits form
- stereo decorrelation: independent, left/side, right/side, mid/side
- bit depths 8/12/16/20/24 (normalized to float64 in [-1, 1))

Anything outside (32-bit bps, unparseable stream) raises ValueError
so the feature router's byte-stat fallback catches it — the same
contract every other decoder in the seam follows.

``encode_flac`` is the deterministic test/fixture twin (the role
encode_png / encode_wav / encode_jpeg play): minimal but fully legal
streams with a choice of subframe strategy (constant / verbatim /
fixed2+Rice / fixed2 with the escaped raw-residual form / lpc1 /
verbatim with wasted bits), stereo mode (independent / left_side /
right_side / mid_side), and bit depth (8/12/16/20/24) — every decoder
branch is exercised by bit-perfect round-trips against known PCM.
"""

from __future__ import annotations

import struct

import numpy as np

# Output cap, same bomb-guard spirit as PNG_MAX_DECODED_BYTES /
# WAV_MAX_DECODED_BYTES: a tiny corrupt header may not allocate
# arbitrary executor memory (total_samples is attacker-controlled).
FLAC_MAX_DECODED_SAMPLES = 8 * 1024 * 1024  # x8 bytes/f64 = 64 MiB mono


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 — the FLAC
    frame-header checksum."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 —
    the FLAC whole-frame checksum."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


class _Bits:
    """Big-endian bit reader with hard bounds checks (corrupt streams
    raise ValueError instead of spinning or over-reading)."""

    __slots__ = ("buf", "pos", "end")

    def __init__(self, buf: bytes, start_byte: int = 0):
        self.buf = buf
        self.pos = start_byte * 8
        self.end = len(buf) * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        pos = self.pos
        if pos + n > self.end:
            raise ValueError("FLAC bitstream truncated")
        first, last = pos >> 3, (pos + n - 1) >> 3
        chunk = int.from_bytes(self.buf[first : last + 1], "big")
        chunk >>= 7 - ((pos + n - 1) & 7)
        self.pos = pos + n
        return chunk & ((1 << n) - 1)

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count 0 bits up to the terminating 1 bit."""
        count = 0
        pos = self.pos
        while True:
            if pos >= self.end:
                raise ValueError("FLAC bitstream truncated in unary run")
            byte = self.buf[pos >> 3]
            bit = (byte >> (7 - (pos & 7))) & 1
            pos += 1
            if bit:
                self.pos = pos
                return count
            count += 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
for _i in range(8, 16):
    _BLOCKSIZE_CODES[_i] = 256 << (_i - 8)

_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_utf8_number(bits: _Bits) -> int:
    """The frame header's UTF-8-style coded frame/sample number (up
    to 36 bits over 7 bytes)."""
    first = bits.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("FLAC invalid UTF-8-coded number")
    val = first & (mask - 1)
    for _ in range(n_follow):
        b = bits.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC invalid UTF-8-coded continuation")
        val = (val << 6) | (b & 0x3F)
    return val


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"FLAC reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    parts = 1 << porder
    if blocksize % parts:
        raise ValueError("FLAC partition order does not divide blocksize")
    out: list[int] = []
    for p in range(parts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(bits.sread(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = bits.unary()
                r = bits.read(param) if param else 0
                v = (q << param) | r
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    ebps = bps - wasted
    if ebps <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        samples = [bits.sread(ebps)] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [bits.sread(ebps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        samples = [bits.sread(ebps) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        coeffs = _FIXED_COEFFS[order]
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coeffs))
            samples.append(r + pred)
    elif stype >= 32:  # LPC, order = stype - 31
        order = stype - 31
        samples = [bits.sread(ebps) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC invalid LPC precision code")
        shift = bits.read(5)
        if shift > 15:  # 5-bit value is spec'd non-negative (<= 31)
            raise ValueError("FLAC LPC shift out of range")
        coeffs = [bits.sread(prec) for _ in range(order)]
        for r in _decode_residual(bits, blocksize, order):
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coeffs)) >> shift
            samples.append(r + pred)
    else:
        raise ValueError(f"FLAC reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _parse_streaminfo(block: bytes) -> tuple[int, int, int, int]:
    if len(block) < 34:
        raise ValueError("FLAC STREAMINFO too short")
    rate = (block[10] << 12) | (block[11] << 4) | (block[12] >> 4)
    channels = ((block[12] >> 1) & 0x7) + 1
    bps = (((block[12] & 1) << 4) | (block[13] >> 4)) + 1
    total = (
        ((block[13] & 0x0F) << 32)
        | (block[14] << 24)
        | (block[15] << 16)
        | (block[16] << 8)
        | block[17]
    )
    return rate, channels, bps, total


def _decode_flac(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """FLAC decode → (sample_rate, n_channels, samples) with samples
    float64 in [-1, 1), shape (n_frames, n_channels) — the exact
    return contract of multimodal._decode_wav, so the audio feature
    path is codec-agnostic."""
    if len(payload) < 8 or payload[:4] != b"fLaC":
        raise ValueError("bad FLAC signature")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC truncated in metadata blocks")
        head = payload[pos]
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise ValueError("FLAC metadata block truncated")
        if head & 0x7F == 0:
            info = _parse_streaminfo(body)
        elif head & 0x7F == 127:
            raise ValueError("FLAC invalid metadata block type 127")
        pos += 4 + length
        if head & 0x80:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, channels, bps, total = info
    if rate < 1:
        raise ValueError("FLAC sample rate 0")
    if bps not in (8, 12, 16, 20, 24):
        raise ValueError(f"unsupported FLAC bit depth {bps}")
    if total * channels > FLAC_MAX_DECODED_SAMPLES:
        raise ValueError(
            f"FLAC declares {total} frames x {channels} ch, over the "
            f"{FLAC_MAX_DECODED_SAMPLES}-sample decode cap"
        )
    bits = _Bits(payload, pos)
    chans: list[list[int]] = [[] for _ in range(channels)]
    got = 0
    while (total == 0 or got < total) and bits.pos + 32 <= bits.end:
        got += _decode_frame(bits, payload, rate, channels, bps, chans)
        if total == 0 and got > FLAC_MAX_DECODED_SAMPLES // max(channels, 1):
            raise ValueError("FLAC stream exceeds the decode cap")
    if total and got < total:
        raise ValueError(f"FLAC stream ended at {got}/{total} frames")
    n = min(len(c) for c in chans)
    if total:
        n = min(n, total)  # a final partial block may legally overrun
    if n < 1:
        raise ValueError("FLAC stream holds no complete frame")
    out = np.empty((n, channels), dtype=np.float64)
    scale = float(1 << (bps - 1))
    for i, c in enumerate(chans):
        out[:, i] = np.asarray(c[:n], dtype=np.float64) / scale
    return rate, channels, out


def _decode_frame(
    bits: _Bits,
    payload: bytes,
    rate: int,
    channels: int,
    bps: int,
    chans: list[list[int]],
) -> int:
    frame_start = bits.byte_pos()
    if bits.read(14) != 0x3FFE:
        raise ValueError("FLAC frame sync lost")
    if bits.read(1):
        raise ValueError("FLAC frame reserved bit set")
    bits.read(1)  # blocking strategy — number parsed either way
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_code = bits.read(4)
    ss_code = bits.read(3)
    if bits.read(1):
        raise ValueError("FLAC frame reserved bit set")
    _read_utf8_number(bits)
    if bs_code == 0:
        raise ValueError("FLAC reserved blocksize code 0")
    elif bs_code == 6:
        blocksize = bits.read(8) + 1
    elif bs_code == 7:
        blocksize = bits.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_CODES[bs_code]
    if sr_code == 12:
        bits.read(8)
    elif sr_code in (13, 14):
        bits.read(16)
    elif sr_code == 15:
        raise ValueError("FLAC invalid sample rate code 15")
    # (sample rate mismatches vs STREAMINFO are tolerated, spec-style)
    if ss_code == 0:
        fbps = bps
    elif ss_code in _SAMPLE_SIZE_CODES:
        fbps = _SAMPLE_SIZE_CODES[ss_code]
    else:
        raise ValueError(f"FLAC reserved sample size code {ss_code}")
    if fbps != bps:
        # mirror the channel-count check: _decode_flac normalizes by
        # the STREAMINFO scale (1 << (bps-1)), so a frame coded at a
        # different depth would decode to wrongly-scaled floats —
        # fail into the documented ValueError fallback instead
        raise ValueError("FLAC frame sample size != STREAMINFO bit depth")
    header_bytes = payload[frame_start : bits.byte_pos()]
    if _crc8(header_bytes) != bits.read(8):
        raise ValueError("FLAC frame header CRC-8 mismatch")

    if ch_code < 8:
        n_ch = ch_code + 1
        if n_ch != channels:
            raise ValueError("FLAC frame channel count != STREAMINFO")
        sub = [_decode_subframe(bits, blocksize, fbps) for _ in range(n_ch)]
    elif ch_code in (8, 9, 10):
        if channels != 2:
            raise ValueError("FLAC stereo decorrelation in non-stereo stream")
        # the side (difference) channel carries one extra bit
        if ch_code == 8:  # left/side
            left = _decode_subframe(bits, blocksize, fbps)
            side = _decode_subframe(bits, blocksize, fbps + 1)
            sub = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # right/side (side first)
            side = _decode_subframe(bits, blocksize, fbps + 1)
            right = _decode_subframe(bits, blocksize, fbps)
            sub = [[r + s for r, s in zip(right, side)], right]
        else:  # mid/side
            mid = _decode_subframe(bits, blocksize, fbps)
            side = _decode_subframe(bits, blocksize, fbps + 1)
            left, right = [], []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            sub = [left, right]
    else:
        raise ValueError(f"FLAC reserved channel assignment {ch_code}")

    bits.align()
    frame_bytes = payload[frame_start : bits.byte_pos()]
    if _crc16(frame_bytes) != bits.read(16):
        raise ValueError("FLAC frame CRC-16 mismatch")
    for i in range(channels):
        chans[i].extend(sub[i])
    return blocksize


# ---------------------------------------------------------------------------
# Deterministic encoder twin (fixtures/tests only — not a production
# compressor): minimal legal streams exercising EVERY decoder path —
# CONSTANT / VERBATIM / FIXED+Rice / FIXED+escaped-raw residual /
# LPC / wasted bits, and all three stereo decorrelations.
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _write_rice(w: _BitWriter, residuals: list[int], param: int) -> None:
    for r in residuals:
        v = (r << 1) if r >= 0 else ((-r) << 1) - 1  # zigzag
        q, rem = v >> param, v & ((1 << param) - 1)
        w.write(1, q + 1)  # q zeros then a 1  == value 1 in q+1 bits
        if param:
            w.write(rem, param)


def _encode_subframe(
    w: _BitWriter, samples: list[int], bps: int, strategy: str
) -> None:
    if strategy == "constant":
        if any(s != samples[0] for s in samples):
            raise ValueError("constant strategy requires constant samples")
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(samples[0], bps)
        return
    if strategy in ("fixed2", "fixed2_escape") and len(samples) > 2:
        w.write(0, 1)
        w.write(10, 6)  # FIXED order 2
        w.write(0, 1)
        for s in samples[:2]:
            w.write(s, bps)
        resid = [
            samples[i] - 2 * samples[i - 1] + samples[i - 2]
            for i in range(2, len(samples))
        ]
        w.write(0, 2)  # method 0 (4-bit Rice)
        w.write(0, 4)  # partition order 0
        if strategy == "fixed2_escape":
            # the escaped raw-bits partition form: param 0b1111, then
            # 5-bit width, then fixed-width signed residuals
            width = max((max(abs(r) for r in resid).bit_length() + 1), 1)
            w.write(15, 4)
            w.write(width, 5)
            for r in resid:
                w.write(r, width)
        else:
            # one Rice partition, param sized to the residual magnitude
            mean = sum(abs(r) for r in resid) // max(len(resid), 1) + 1
            param = min(max(mean.bit_length(), 1), 14)
            w.write(param, 4)
            _write_rice(w, resid, param)
        return
    if strategy == "lpc1" and len(samples) > 1:
        # LPC order 1, precision 5, shift 2, coefficient 4: predictor
        # is (4 * s[i-1]) >> 2 == s[i-1] exactly — a legal LPC stream
        # whose reconstruction is integer-exact for any input
        w.write(0, 1)
        w.write(32, 6)  # LPC, order = 32 - 31 = 1
        w.write(0, 1)
        w.write(samples[0], bps)  # warmup
        w.write(5 - 1, 4)  # precision code
        w.write(2, 5)  # shift
        w.write(4, 5)  # the single coefficient, 5-bit signed
        resid = [samples[i] - samples[i - 1] for i in range(1, len(samples))]
        mean = sum(abs(r) for r in resid) // max(len(resid), 1) + 1
        param = min(max(mean.bit_length(), 1), 14)
        w.write(0, 2)
        w.write(0, 4)
        w.write(param, 4)
        _write_rice(w, resid, param)
        return
    if strategy == "verbatim_wasted":
        # shift every sample's shared power-of-two factor into the
        # wasted-bits field (spec 9.2.2): k encoded as unary k-1
        # zeros + 1 after the flag bit
        wasted = 0
        while all(s % 2 == 0 for s in samples) and any(samples) and wasted < 4:
            samples = [s >> 1 for s in samples]
            wasted += 1
        w.write(0, 1)
        w.write(1, 6)
        if wasted:
            w.write(1, 1)  # wasted-bits flag
            w.write(1, wasted)  # unary: (wasted-1) zeros then a 1
        else:
            w.write(0, 1)
        for s in samples:
            w.write(s, bps - wasted)
        return
    # verbatim (the default fallback)
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for s in samples:
        w.write(s, bps)


_SAMPLE_SIZE_TO_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}


def encode_flac(
    sample_rate: int,
    channels: int,
    samples_i16: "np.ndarray",
    block_size: int = 4096,
    strategy: str = "verbatim",
    stereo: str = "independent",
    bits: int = 16,
) -> bytes:
    """Deterministic FLAC encoder twin. ``strategy`` picks the
    subframe coding ('verbatim' | 'constant' | 'fixed2' |
    'fixed2_escape' | 'lpc1' | 'verbatim_wasted'); ``stereo`` picks
    'independent' | 'left_side' | 'right_side' | 'mid_side'
    (decorrelations need exactly 2 channels); ``bits`` is the sample
    depth (8/12/16/20/24 — every depth the decoder supports; samples
    must already fit the depth). Pure struct/bit packing — stable
    everywhere, as fixture twins must be."""
    pcm = np.asarray(samples_i16, dtype=np.int64).reshape(-1, channels)
    n_total = pcm.shape[0]
    if n_total < 1:
        raise ValueError("encode_flac needs at least one frame")
    if bits not in _SAMPLE_SIZE_TO_CODE:
        raise ValueError(f"unsupported encoder bit depth {bits}")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if pcm.min() < lo or pcm.max() > hi:
        raise ValueError(f"samples exceed {bits}-bit range")
    _STEREO_CODES = {"left_side": 8, "right_side": 9, "mid_side": 10}
    if stereo != "independent" and (
        stereo not in _STEREO_CODES or channels != 2
    ):
        raise ValueError(
            f"stereo mode {stereo!r} needs exactly 2 channels"
        )

    streaminfo = bytearray(34)
    bsz = min(block_size, max(n_total, 16))
    struct.pack_into(">HH", streaminfo, 0, bsz, bsz)
    # min/max framesize left 0 (unknown, legal)
    streaminfo[10] = (sample_rate >> 12) & 0xFF
    streaminfo[11] = (sample_rate >> 4) & 0xFF
    streaminfo[12] = (
        ((sample_rate & 0xF) << 4) | ((channels - 1) << 1) | ((bits - 1) >> 4)
    )
    streaminfo[13] = (((bits - 1) & 0xF) << 4) | ((n_total >> 32) & 0xF)
    struct.pack_into(">I", streaminfo, 14, n_total & 0xFFFFFFFF)
    # MD5 left zeroed (unset, legal)
    out = bytearray(b"fLaC")
    out.append(0x80)  # last block + type 0
    out += len(streaminfo).to_bytes(3, "big")
    out += streaminfo

    frame_no = 0
    for start in range(0, n_total, bsz):
        block = pcm[start : start + bsz]
        n = block.shape[0]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy -> frame number coding
        w.write(7, 4)  # blocksize: explicit 16-bit at header end
        w.write(0, 4)  # sample rate: from STREAMINFO
        ch_code = _STEREO_CODES.get(stereo, channels - 1)
        w.write(ch_code, 4)
        w.write(_SAMPLE_SIZE_TO_CODE[bits], 3)  # sample size code
        w.write(0, 1)
        if frame_no > 0x7F:
            raise ValueError("encoder twin caps at 128 frames")
        w.write(frame_no, 8)  # UTF-8 single byte
        w.write(n - 1, 16)
        w.align()
        header = w.bytes()
        w2 = _BitWriter()
        for b in header:
            w2.write(b, 8)
        w2.write(_crc8(header), 8)
        if stereo == "left_side":
            side = (block[:, 0] - block[:, 1]).tolist()
            _encode_subframe(w2, block[:, 0].tolist(), bits, strategy)
            _encode_subframe(w2, side, bits + 1, strategy)
        elif stereo == "right_side":
            side = (block[:, 0] - block[:, 1]).tolist()
            _encode_subframe(w2, side, bits + 1, strategy)
            _encode_subframe(w2, block[:, 1].tolist(), bits, strategy)
        elif stereo == "mid_side":
            mid = ((block[:, 0] + block[:, 1]) >> 1).tolist()
            side = (block[:, 0] - block[:, 1]).tolist()
            _encode_subframe(w2, mid, bits, strategy)
            _encode_subframe(w2, side, bits + 1, strategy)
        else:
            for c in range(channels):
                _encode_subframe(w2, block[:, c].tolist(), bits, strategy)
        w2.align()
        frame = w2.bytes()
        w3 = _BitWriter()
        for b in frame:
            w3.write(b, 8)
        w3.write(_crc16(frame), 16)
        out += w3.bytes()
        frame_no += 1
    return bytes(out)
