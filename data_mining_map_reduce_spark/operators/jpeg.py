"""Baseline JPEG codec in stdlib + numpy (r11).

The reference treats media as opaque payloads; the engine's
multimodal block (operators/multimodal.py, SURVEY §2 X15) decodes
the library-free formats for real and stubs only what genuinely
needs a codec library. JPEG is the last major image format on that
stub list — and baseline JFIF is decodable with nothing but numpy:
marker parse, Huffman entropy decode, dequantize, inverse DCT,
chroma upsample, YCbCr→RGB. This module implements exactly that.

Scope (decode): baseline sequential DCT (SOF0), 8-bit samples,
1-component grayscale or 3-component YCbCr, any sampling factors
(4:4:4, 4:2:2, 4:2:0, ...), multiple DQT/DHT segments, restart
intervals (DRI/RSTn). Progressive (SOF2), arithmetic coding, and
12-bit variants raise ValueError — the byte-stat fallback contract.

Scope (encode — the deterministic test twin): 4:4:4 YCbCr or
grayscale, flat quantization tables, and PRIVATE canonical Huffman
tables (all-8-bit AC codes, 4-bit DC codes) emitted in DHT. The
encoder exists to drive the decoder in tests and to build pinned
probe payloads, not to be small or fast; its byte output is pure
integer arithmetic — stable across numpy versions.

Determinism note for pinned probes: a SOLID-GRAY image encodes to
DC-only blocks; with the flat quant tables used here the DC
coefficient round-trips exactly, so the decoded pixel value is known
from arithmetic alone (see encode_jpeg docstring) and probe oracle
constants never need to run the decoder.

Entropy-coded data walks Python loops per Huffman symbol — fine for
the mapInPandas feature path (already Python per batch), not a bulk
transcoder.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index k of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal 8-point DCT-II basis: C[u, x] = c(u) cos((2x+1)uπ/16),
# c(0)=sqrt(1/8), c(u>0)=sqrt(2/8). FDCT of a block B is C @ B @ C.T
# and the JPEG IDCT is C.T @ S @ C (this scaling makes a flat block's
# DC exactly 8*mean, the fact the pinned probes rely on).
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(0.125) if _u == 0 else np.sqrt(0.25)
        )

JPEG_MAX_DECODED_BYTES = 64 * 1024 * 1024


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    byte-stuffing removal; RSTn markers are surfaced to the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # pad with 1-bits past the end (spec behavior); the
                # scan loop stops on block count, EOI handled upstream
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # RSTn / EOI / next segment: stop consuming and pad
                    # with 1-bits — a restart marker is only VALID at an
                    # MCU boundary, where the scan loop calls
                    # skip_to_restart (which scans raw bytes from pos,
                    # untouched here) to consume it
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if n > self.nbits:
            raise ValueError("JPEG entropy data exhausted")
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return out

    def skip_to_restart(self) -> int:
        """Consume up to the next RSTn marker and return its index."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                idx = self.data[self.pos + 1] & 7
                self.pos += 2
                return idx
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


class _Huff:
    """Canonical Huffman table from a DHT (BITS, HUFFVAL) pair,
    decoded MSB-first via the canonical min/max-code walk."""

    def __init__(self, bits: list[int], vals: bytes):
        if sum(bits) != len(vals) or sum(bits) == 0:
            raise ValueError("malformed JPEG Huffman table")
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_index = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            self.val_index[length] = k
            self.min_code[length] = code
            self.max_code[length] = code + n - 1 if n else -1
            code = (code + n) << 1
            k += n
        self.vals = vals

    def decode(self, reader: _BitReader) -> int:
        code = reader.bits(1)
        for length in range(1, 17):
            if self.max_code[length] >= 0 and code <= self.max_code[length]:
                return self.vals[self.val_index[length] + code - self.min_code[length]]
            code = (code << 1) | reader.bits(1)
        raise ValueError("invalid JPEG Huffman code")


def _extend(value: int, size: int) -> int:
    """JPEG EXTEND: a SIZE-bit magnitude with leading 0 encodes a
    negative value."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def _decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Baseline JPEG decode → (width, height, interleaved RGB bytes).
    See module docstring for scope; anything outside it raises
    ValueError so multimodal's feature router falls back to byte
    stats."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before
        # a marker — skip to the marker byte itself so padded streams
        # decode instead of desyncing into the length-skip path
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(payload):
            break
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                if tbl.shape[0] != 64:
                    raise ValueError("JPEG DQT truncated")
                qt[tq] = tbl.astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = seg[p + 17 : p + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF 0x{marker:02x} (progressive/extended/arithmetic) "
                "unsupported — baseline sequential only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            sel = {}
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                sel[cs] = (tables >> 4, tables & 15)
            return _decode_scan(
                payload, pos + seglen, frame, sel, qt, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / anything else: skip
        pos += seglen
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(payload, pos, frame, sel, qt, huff_dc, huff_ac, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if not (0 < w and 0 < h):
        raise ValueError(f"bad JPEG geometry {w}x{h}")
    if w * h * 3 > JPEG_MAX_DECODED_BYTES:
        raise ValueError("JPEG geometry exceeds the decode cap")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad JPEG sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(f"JPEG quant table {c['tq']} missing")
        if c["id"] not in sel:
            raise ValueError("JPEG scan does not cover every component")
        td, ta = sel[c["id"]]
        if td not in huff_dc or (ta not in huff_ac):
            raise ValueError("JPEG Huffman table missing")
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    reader = _BitReader(bytes(payload), pos)
    pred = [0] * len(comps)
    mcu_count = 0
    expected_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                idx = reader.skip_to_restart()
                if idx != expected_rst:
                    raise ValueError("JPEG restart marker out of sequence")
                expected_rst = (expected_rst + 1) & 7
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = sel[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeff = _decode_block(
                            reader, huff_dc[td], huff_ac[ta], pred, ci
                        )
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coeff * q
                        pix = _C.T @ block.reshape(8, 8) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    # upsample each component to full geometry and clip
    full = []
    for c, plane in zip(comps, planes):
        rep_y, rep_x = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise ValueError("non-integer JPEG sampling ratio unsupported")
        up = np.repeat(np.repeat(plane, rep_y, axis=0), rep_x, axis=1)
        full.append(up[:h, :w])
    if len(full) == 1:
        grey = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return w, h, np.ascontiguousarray(
            np.repeat(grey[..., None], 3, axis=-1)
        ).tobytes()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.clip(np.rint(rgb), 0, 255).astype(np.uint8).tobytes()


def _decode_block(reader, hdc, hac, pred, ci) -> np.ndarray:
    coeff = np.zeros(64, dtype=np.int64)
    size = hdc.decode(reader)
    if size > 11:
        raise ValueError("bad JPEG DC size category")
    pred[ci] += _extend(reader.bits(size), size)
    coeff[0] = pred[ci]
    k = 1
    while k < 64:
        rs = hac.decode(reader)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run == 0:  # EOB
                break
            if run == 15:  # ZRL
                k += 16
                continue
            raise ValueError("bad JPEG AC run/size symbol")
        k += run
        if k >= 64:
            raise ValueError("JPEG AC coefficient index overflow")
        coeff[k] = _extend(reader.bits(size), size)
        k += 1
    return coeff


# ---------------------------------------------------------------------------
# Encoder twin
# ---------------------------------------------------------------------------

# Private canonical Huffman tables (NOT the Annex K defaults — any
# valid prefix code is legal as long as DHT carries it): DC sizes
# 0..11 as 4-bit codes 0..11; the 162 baseline AC run/size symbols as
# 8-bit codes 0..161. No code is all-ones, as the spec requires.
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]


def _enc_code_map(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    q_dc: int = 16,
    q_ac: int = 16,
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Minimal deterministic baseline JPEG encoder — the test/fixture
    twin of ``_decode_jpeg``. 4:4:4 (or single-component grayscale),
    FLAT quantization tables (``q_dc`` for the DC slot, ``q_ac``
    everywhere else), private canonical Huffman tables carried in
    DHT. All integer arithmetic after the rounded color transform /
    DCT, so byte output is stable.

    Pinned-probe exactness argument: a solid gray level v encodes as
    Y=v, Cb=Cr=128 exactly (integer rounding of the JFIF transform);
    every block is flat, so its only nonzero coefficient is
    DC = 8·(v−128). With v−128 divisible by q_dc/8 the quantized DC
    round-trips exactly and the decoder reproduces the flat value v
    bit-for-bit after its own rounding — no float drift can move a
    probe constant."""
    px = (
        np.frombuffer(rgb, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = np.rint(0.299 * r + 0.587 * g + 0.114 * b)
    cb = np.rint(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
    cr = np.rint(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    planes = [y] if grayscale else [y, cb, cr]

    qtbl = np.full(64, q_ac, dtype=np.int64)
    qtbl[0] = q_dc
    dc_map = _enc_code_map(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_map = _enc_code_map(_ENC_AC_BITS, _AC_SYMBOLS)

    # pad to 8x8 multiples by edge replication
    ph = -(-height // 8) * 8
    pw = -(-width // 8) * 8
    writer = _BitWriter()
    pred = [0] * len(planes)
    padded = [
        np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge")
        for p in planes
    ]
    data = bytearray()
    mcu_count = 0
    rst = 0
    for my in range(ph // 8):
        for mx in range(pw // 8):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                data += writer.flush()
                data += bytes([0xFF, 0xD0 | rst])
                rst = (rst + 1) & 7
                writer = _BitWriter()
                pred = [0] * len(planes)
            for ci, plane in enumerate(padded):
                block = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
                coef = _C @ block @ _C.T
                zz = np.rint(coef.reshape(-1)[_ZIGZAG] / qtbl).astype(np.int64)
                _encode_block(writer, zz, pred, ci, dc_map, ac_map)
            mcu_count += 1
    data += writer.flush()
    data = bytes(data)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, height, width, ncomp) + b"".join(
        struct.pack(">BBB", i + 1, 0x11, 0) for i in range(ncomp)
    )
    dht = (
        bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + _AC_SYMBOLS
    )
    sos = bytes([ncomp]) + b"".join(
        bytes([i + 1, 0x00]) for i in range(ncomp)
    ) + bytes([0, 63, 0])
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + qtbl.astype(np.uint8).tobytes())
        + dri
        + seg(0xC0, sof)
        + seg(0xC4, dht)
        + seg(0xDA, sos)
        + data
        + b"\xff\xd9"
    )


def _encode_block(writer, zz, pred, ci, dc_map, ac_map) -> None:
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    size = int(diff if diff >= 0 else -diff).bit_length()
    if size > 11:
        raise ValueError("JPEG DC difference out of baseline range")
    writer.write(*dc_map[size])
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            writer.write(*ac_map[0xF0])  # ZRL
            run -= 16
        size = int(v if v >= 0 else -v).bit_length()
        if size > 10:
            raise ValueError("JPEG AC coefficient out of baseline range")
        writer.write(*ac_map[(run << 4) | size])
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        writer.write(*ac_map[0x00])  # EOB
