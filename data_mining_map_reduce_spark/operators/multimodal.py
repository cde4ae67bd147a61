"""Multimodal column plumbing: opaque binary payloads + typed
metadata, feature extraction over ``mapInPandas`` (the LLM-pipeline
multimodal block).

Design contract (what IS real and tested):
- schema: payload as ``binary``, metadata as typed columns
  (modality, width/height/duration, mime) — the storage layout a
  100 TB multimodal corpus uses (parquet binary chunks, pruned
  metadata columns).
- partition shape: feature extraction runs as Arrow-batched
  ``mapInPandas`` — payload bytes stream through Python in batches,
  never materialize a full partition as one object, and the output
  schema is declared up front so Catalyst can plan around it.

Decode surface (r8, extended r10/r11): ``decode_image`` REALLY
decodes the four library-free formats — PPM (P6 binary / P3 ASCII),
24-bit uncompressed BMP, 8-bit non-interlaced PNG including
palette (color type 3) images (stdlib zlib inflate + numpy
per-scanline unfilter; ``encode_png`` is its deterministic test
twin; inflate is CAPPED at the declared geometry so untrusted
payloads can't balloon executor memory), GIF including
four-pass interlaced frames (r11, de-interlaced r11-late:
pure-Python LZW with the same decode cap; transparency indices
render as their palette color; ``encode_gif`` deterministic
twin), and baseline-sequential JPEG (r11:
operators/jpeg.py — marker parse, Huffman entropy decode, dequant,
IDCT, chroma upsample, YCbCr→RGB; ``encode_jpeg`` deterministic
twin) — in pure Python, and ``extract_features``'s default
feature path magic-sniffs the payload: decodable images yield real
pixel statistics, everything else falls back to the deterministic
byte-stat fake (bit-identical to the pre-r8 behavior, which the
media_feature_rollup oracle replays). ``decode_audio`` REALLY
decodes WAV integer PCM (r11: stdlib struct + numpy, ``encode_wav``
deterministic twin) and FLAC (r12: pure-integer Rice/LPC decode,
operators/flac.py, ``encode_flac`` deterministic twin) into real
audio statistics. Remaining stubs are the formats whose codecs
genuinely aren't in this container:
WebP/AVIF/progressive-JPEG for images, mp3/ogg for audio —
those raise NotImplementedError (unrecognized magic) or ValueError
(recognized container, unsupported variant); swap ``feature_fn``
for a real decoder (PIL/librosa/ffmpeg) in a production image —
signature and batch shape are already what that code needs.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "media_id long, modality string, n_bytes long, "
    f"features array<double>"
)


def _decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """PPM (netpbm) decode: P6 binary or P3 ASCII, maxval <= 255.
    Returns (width, height, interleaved RGB bytes, row-major)."""
    # header tokens may be separated by any whitespace and interleaved
    # with '#' comments; after the maxval token, P6 pixel data starts
    # after EXACTLY one whitespace byte
    magic = payload[:2]
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    width, height, maxval = tokens
    if not (0 < width and 0 < height and 0 < maxval <= 255):
        raise ValueError(f"unsupported PPM geometry {tokens}")
    n = width * height * 3
    if magic == b"P6":
        pixels = payload[pos + 1 : pos + 1 + n]
        if len(pixels) != n:
            raise ValueError(
                f"PPM payload truncated: expected {n} pixel bytes, "
                f"got {len(pixels)}"
            )
    else:  # P3: pixels are ASCII ints, parsed vectorized by numpy
        vals = payload[pos:].split()
        # structural sanity: a real P3 stream is EXACTLY the declared
        # sample count — leftover (or missing) tokens mean this is a
        # non-image payload that happened to start with 'P3', and it
        # must fall through to the byte-stat path (r8 advice).
        if len(vals) != n:
            raise ValueError(
                f"P3 token stream not fully consumed: expected {n} "
                f"samples, got {len(vals)}"
            )
        try:
            # OverflowError too: a token wider than int64 (e.g. a
            # 23-digit run in a non-image payload that starts with
            # 'P3') must also route to the byte-stat fallback, not
            # crash the mapInPandas task (r9 advice).
            arr = np.array(vals, dtype=np.int64)
        except (ValueError, OverflowError) as exc:
            raise ValueError(f"non-numeric P3 sample token: {exc}") from exc
        if arr.size and (arr.min() < 0 or arr.max() > maxval):
            raise ValueError("P3 sample out of [0, maxval] range")
        pixels = arr.astype(np.uint8).tobytes()
    if maxval != 255:
        # samples are stored on a [0, maxval] scale; rescale so the
        # downstream [0, 1] normalization (which divides by 255) is
        # correct for any maxval (r8 advice).
        arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
        pixels = (
            np.rint(arr * (255.0 / maxval)).clip(0, 255)
            .astype(np.uint8).tobytes()
        )
    return width, height, pixels


def _decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """24-bit uncompressed bottom-up BMP decode (BITMAPINFOHEADER).
    Returns (width, height, interleaved RGB bytes, row-major
    top-down) — BGR storage and 4-byte row padding are undone."""
    import struct

    if len(payload) < 54:
        raise ValueError("BMP payload shorter than its fixed headers")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        raise ValueError(
            f"only 24-bit uncompressed BMP is supported "
            f"(bpp={bpp}, compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3
    if len(payload) < data_off + height * row_stride:
        raise ValueError("BMP payload truncated")
    # vectorized: view the pixel block as (height, stride), drop the
    # row padding, flip vertically for bottom-up storage, swap BGR→RGB
    px = np.frombuffer(
        payload, dtype=np.uint8, count=height * row_stride, offset=data_off
    ).reshape(height, row_stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        px = px[::-1]
    return width, height, px[..., ::-1].tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter_row(
    f: int, row: "np.ndarray", prev: "np.ndarray", bpp: int
) -> "np.ndarray":
    """Reconstruct one PNG scanline (int64 in, int64 out, values in
    [0, 255]). Filters 0/1/2 are fully vectorized (Sub is a cumsum
    over a (pixels, bpp) reshape — recon[x] = filt[x] + recon[x-bpp]
    is exactly a mod-256 prefix sum per channel lane); Average and
    Paeth predict from the CURRENT row's reconstructed left pixel, so
    they are inherently serial in x (r9 verdict ask 6's expected
    shape) — still numpy row arithmetic for the up/upleft terms."""
    if f == 0:  # None
        return row
    if f == 2:  # Up
        return (row + prev) & 255
    if f == 1:  # Sub
        return (np.cumsum(row.reshape(-1, bpp), axis=0) & 255).ravel()
    n = row.shape[0]
    out = np.empty(n, dtype=np.int64)
    if f == 3:  # Average
        for x in range(n):
            left = out[x - bpp] if x >= bpp else 0
            out[x] = (row[x] + (left + prev[x]) // 2) & 255
        return out
    if f == 4:  # Paeth
        for x in range(n):
            a = out[x - bpp] if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (row[x] + pred) & 255
        return out
    raise ValueError(f"unknown PNG filter type {f}")


# Max pixel buffer _decode_png will inflate (r10 advice): untrusted
# media must not be able to allocate arbitrary executor memory via a
# decompression bomb or an absurd declared geometry. 64 MiB covers a
# ~4600x4600 RGB image — far past any feature-extraction need; a real
# production decoder would stream/tile anyway.
PNG_MAX_DECODED_BYTES = 64 * 1024 * 1024


def _decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """PNG decode with stdlib zlib + numpy (r9 verdict ask 6, palette
    added r11): 8-bit non-interlaced greyscale / grey+alpha / RGB /
    RGBA / palette (color type 3, PLTE lookup). Inflates the IDAT
    stream (CAPPED at the declared scanline size — see
    PNG_MAX_DECODED_BYTES), unfilters per scanline (all five filter
    types), and normalizes to interleaved RGB (alpha dropped, grey
    replicated, palette indices resolved). Unsupported variants
    (16-bit, packed palette depths, interlaced) raise ValueError so
    the byte-stat fallback catches them."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos = 8
    ihdr = None
    plte: bytes | None = None
    idat: list[bytes] = []
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        pos += 8
        data = payload[pos : pos + length]
        if len(data) != length:
            raise ValueError("PNG chunk truncated")
        pos += length + 4  # + CRC (not verified: corruption surfaces
        # as an inflate error or a size mismatch below)
        if ctype == b"IHDR":
            # r10 advice: a 13-byte unpack of a differently-sized
            # chunk raises struct.error, which would escape the
            # ValueError fallback contract and crash the task
            if length != 13:
                raise ValueError(f"PNG IHDR chunk length {length} != 13")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    width, height, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color}, "
            f"interlace={interlace}) — only 8-bit non-interlaced "
            "grey/RGB/alpha/palette"
        )
    if color == 3:
        if plte is None or len(plte) % 3 or not 3 <= len(plte) <= 768:
            raise ValueError("palette PNG missing or malformed PLTE chunk")
    if not (0 < width and 0 < height):
        raise ValueError(f"bad PNG geometry {width}x{height}")
    stride = width * channels
    expected = height * (stride + 1)
    # Geometry/size sanity BEFORE inflating, and a capped inflate
    # (r10 advice): the declared scanline size bounds the output, so
    # neither a bomb stream nor a huge declared width/height can
    # allocate past the cap.
    if expected > PNG_MAX_DECODED_BYTES:
        raise ValueError(
            f"PNG geometry {width}x{height}x{channels} exceeds the "
            f"{PNG_MAX_DECODED_BYTES}-byte decode cap"
        )
    try:
        raw = zlib.decompressobj().decompress(b"".join(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    if len(raw) != expected:
        raise ValueError(
            f"PNG scanline data size mismatch: got {len(raw)}, "
            f"expected {expected}"
        )
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    recon = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        prev = _png_unfilter_row(
            int(lines[y, 0]), lines[y, 1:].astype(np.int64), prev, channels
        )
        recon[y] = prev.astype(np.uint8)
    px = recon.reshape(height, width, channels)
    if color == 3:  # palette indices -> RGB lookup
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[..., 0]
        if int(idx.max()) >= pal.shape[0]:
            raise ValueError(
                f"palette index {int(idx.max())} out of range "
                f"({pal.shape[0]} PLTE entries)"
            )
        px = pal[idx]
    elif color == 6:  # RGBA -> drop alpha
        px = px[..., :3]
    elif color == 4:  # grey+alpha -> grey
        px = px[..., :1]
    if px.shape[-1] == 1:  # grey -> replicate to RGB
        px = np.repeat(px, 3, axis=-1)
    return width, height, np.ascontiguousarray(px).tobytes()


def encode_png(
    width: int,
    height: int,
    rgb: bytes,
    row_filters: list[int] | None = None,
) -> bytes:
    """Minimal deterministic RGB8 PNG encoder — the test/fixture twin
    of ``_decode_png``. ``row_filters`` picks the per-scanline filter
    type (default all 0) so tests can exercise every unfilter path.
    The IDAT stream uses STORED deflate blocks (``zlib.compress``
    level 0), so the byte output is stable across zlib versions —
    required for the pinned oracle literals in media_feature_rollup."""
    import struct
    import zlib

    px = (
        np.frombuffer(rgb, dtype=np.uint8)
        .reshape(height, width * 3)
        .astype(np.int64)
    )
    filters = row_filters if row_filters is not None else [0] * height
    if len(filters) != height:
        raise ValueError("row_filters length must equal height")
    bpp = 3
    prev = np.zeros(width * 3, dtype=np.int64)
    scanlines = []
    for y, f in enumerate(filters):
        cur = px[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = (cur - left) & 255
        elif f == 2:
            filt = (cur - prev) & 255
        elif f == 3:
            filt = (cur - (left + prev) // 2) & 255
        elif f == 4:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = (cur - pred) & 255
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        scanlines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(scanlines), 0)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _gif_lzw_decode(data: bytes, min_code: int, max_pixels: int) -> bytes:
    """GIF-variant LZW decode: LSB-first bit packing, code width
    starts at min_code+1 and grows with the dictionary to 12 bits,
    CLEAR resets, END terminates. Output is CAPPED at max_pixels (the
    image descriptor's declared geometry) — same bomb-guard contract
    as the PNG inflate cap."""
    clear = 1 << min_code
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    bitpos = 0
    nbits = len(data) * 8
    out = bytearray()
    prev: bytes | None = None
    while bitpos + width <= nbits:
        byte_idx = bitpos >> 3
        code = (
            int.from_bytes(data[byte_idx : byte_idx + 3], "little")
            >> (bitpos & 7)
        ) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= clear:
                raise ValueError("LZW stream starts with a non-literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        if len(out) > max_pixels:
            raise ValueError(
                f"LZW output exceeds declared geometry ({max_pixels} px)"
            )
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    raise ValueError("LZW stream ended without END code")


def _decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """GIF decode in pure Python (r11): GIF87a/GIF89a, first image
    frame, global or local color table, full LZW dictionary decode;
    interlaced frames are de-interlaced (the four-pass row
    permutation) and a transparency index renders as its palette
    color (single-frame thumbnail contract — there is no prior frame
    to composite against). Returns the frame's own geometry
    (animation compositing is out of scope: the FIRST frame is the
    thumbnail contract)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    if len(payload) < 13:
        raise ValueError("GIF truncated before screen descriptor")
    _sw, _sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_table: bytes | None = None
    if flags & 0x80:
        size = 3 * (2 << (flags & 7))
        global_table = payload[pos : pos + size]
        if len(global_table) != size:
            raise ValueError("GIF global color table truncated")
        pos += size

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("GIF sub-blocks truncated")
            n = payload[p]
            p += 1 + n
            if n == 0:
                return p

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos = skip_subblocks(pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        _left, _top, width, height, iflags = struct.unpack_from(
            "<HHHHB", payload, pos
        )
        pos += 9
        interlaced = bool(iflags & 0x40)
        table = global_table
        if iflags & 0x80:
            size = 3 * (2 << (iflags & 7))
            table = payload[pos : pos + size]
            if len(table) != size:
                raise ValueError("GIF local color table truncated")
            pos += size
        if table is None:
            raise ValueError("GIF frame has no color table")
        if not (0 < width and 0 < height):
            raise ValueError(f"bad GIF geometry {width}x{height}")
        if width * height * 3 > PNG_MAX_DECODED_BYTES:
            raise ValueError(
                f"GIF geometry {width}x{height} exceeds the decode cap"
            )
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad LZW min code size {min_code}")
        chunks = []
        while True:
            if pos >= len(payload):
                raise ValueError("GIF image data truncated")
            n = payload[pos]
            pos += 1
            if n == 0:
                break
            chunks.append(payload[pos : pos + n])
            pos += n
        indices = np.frombuffer(
            _gif_lzw_decode(b"".join(chunks), min_code, width * height),
            dtype=np.uint8,
        )
        if indices.shape[0] != width * height:
            raise ValueError(
                f"GIF pixel count mismatch: got {indices.shape[0]}, "
                f"expected {width * height}"
            )
        pal = np.frombuffer(table, dtype=np.uint8).reshape(-1, 3)
        if int(indices.max()) >= pal.shape[0]:
            raise ValueError("GIF palette index out of range")
        rows = indices.reshape(height, width)
        if interlaced:
            # GIF interlace stores rows in four passes (start 0/4/2/1,
            # step 8/8/4/2); map them back to their display positions
            order = np.concatenate(
                [np.arange(s, height, t) for s, t in
                 ((0, 8), (4, 8), (2, 4), (1, 2))]
            )
            deinterlaced = np.empty_like(rows)
            deinterlaced[order] = rows
            rows = deinterlaced
        return width, height, np.ascontiguousarray(pal[rows]).tobytes()
    raise ValueError("GIF contains no image frame")


def encode_gif(
    width: int, height: int, rgb: bytes, interlace: bool = False
) -> bytes:
    """Minimal deterministic GIF87a encoder — the test/fixture twin of
    ``_decode_gif``. Builds a global color table from the distinct
    colors (≤ 256 required) and emits clear-code-separated literal
    LZW codes at constant width, a grossly inefficient but fully
    valid stream whose bytes are pure arithmetic — stable everywhere,
    as the pinned-literal contract requires. ``interlace`` stores the
    rows in GIF's four-pass order (and sets the flag) to drive the
    decoder's de-interlace path."""
    import struct

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
    if px.shape[0] != width * height:
        raise ValueError("rgb size does not match geometry")
    colors, indices = np.unique(px, axis=0, return_inverse=True)
    if interlace:
        order = np.concatenate(
            [np.arange(s, height, t) for s, t in
             ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        indices = indices.reshape(height, width)[order].reshape(-1)
    if colors.shape[0] > 256:
        raise ValueError("encode_gif supports at most 256 distinct colors")
    # palette size must be a power of two >= 4 (min_code >= 2)
    table_bits = max(2, int(colors.shape[0] - 1).bit_length())
    table = colors.tobytes() + bytes(
        3 * ((1 << table_bits) - colors.shape[0])
    )
    min_code = table_bits
    clear = 1 << min_code
    end = clear + 1
    cwidth = min_code + 1
    # bit-pack [clear, i0, clear, i1, ..., clear, end] LSB-first: the
    # clear before every literal keeps the decoder's table at its
    # base size, so the code width never grows
    acc = 0
    nacc = 0
    stream = bytearray()
    codes = [clear]
    for i in indices.tolist():
        codes.append(int(i))
        codes.append(clear)
    codes[-1] = end  # final clear slot becomes END
    for code in codes:
        acc |= code << nacc
        nacc += cwidth
        while nacc >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        stream.append(acc & 0xFF)
    sub = b"".join(
        bytes([len(stream[i : i + 255])]) + bytes(stream[i : i + 255])
        for i in range(0, len(stream), 255)
    )
    flags = 0x80 | (table_bits - 1)  # global table present, size bits
    return (
        b"GIF87a"
        + struct.pack("<HHBBB", width, height, flags, 0, 0)
        + table
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, width, height, 0x40 if interlace else 0)
        + bytes([min_code])
        + sub
        + b"\x00"
        + b"\x3b"
    )


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an image payload in pure Python →
    (width, height, interleaved RGB bytes, row-major top-down).

    Real decoders for the five library-free formats: PPM (P6/P3),
    24-bit uncompressed BMP, 8-bit PNG (stdlib zlib inflate + numpy
    unfilter), GIF incl. four-pass interlace (pure-Python LZW, r11),
    and baseline-sequential JPEG (operators/jpeg.py: Huffman + dequant +
    IDCT + chroma upsample, r11). The remaining formats (WebP, AVIF,
    progressive JPEG, ...) need codec libraries absent from this
    container and raise NotImplementedError / ValueError — pass a
    real decoder via ``extract_features(feature_fn=...)`` there."""
    if payload is None or len(payload) < 2:
        raise ValueError("empty image payload")
    magic = bytes(payload[:2])
    # Corrupt payloads must surface as ValueError so the feature
    # router's fallback contract holds (the r10-advice bug class:
    # struct.error/IndexError from a truncated container escaping the
    # except clause and crashing the mapInPandas task). The decoders
    # validate what they can cheaply; this normalizes the remainder.
    import struct as _struct

    try:
        if magic in (b"P6", b"P3"):
            return _decode_ppm(bytes(payload))
        if magic == b"BM":
            return _decode_bmp(bytes(payload))
        if magic == _PNG_SIG[:2]:
            return _decode_png(bytes(payload))
        if magic == b"GI":
            return _decode_gif(bytes(payload))
        if magic == b"\xff\xd8":
            from .jpeg import _decode_jpeg

            return _decode_jpeg(bytes(payload))
    except (_struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"corrupt {magic!r} image payload: {exc}") from exc
    raise NotImplementedError(
        f"image format with magic {magic!r} requires a codec library "
        "not present in this environment; extract_features("
        "feature_fn=...) accepts a real decoder"
    )


# Same bomb-guard spirit as PNG_MAX_DECODED_BYTES: a declared data
# chunk may not allocate arbitrary executor memory. 64 MiB of PCM is
# ~12 min of 16-bit stereo at 44.1 kHz — far past feature needs.
WAV_MAX_DECODED_BYTES = 64 * 1024 * 1024


def _decode_wav(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """WAV PCM decode with stdlib struct + numpy (r11 — the audio
    twin of the r9/r10 PNG move): RIFF/WAVE container, format tag 1
    (integer PCM) at 8 or 16 bits. Returns (sample_rate, n_channels,
    samples) with samples float64 in [-1, 1), shape
    (n_frames, n_channels). Lossy codecs (mp3/ogg, and
    float/extensible WAV variants) raise ValueError so the byte-stat
    fallback catches them — those genuinely need codec libraries this
    container doesn't have."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("bad RIFF/WAVE signature")
    pos = 12
    fmt = None
    data: bytes | None = None
    while pos + 8 <= len(payload):
        ctype, length = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        chunk = payload[pos : pos + length]
        if len(chunk) != length:
            raise ValueError("WAV chunk truncated")
        pos += length + (length & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            if length < 16:
                raise ValueError(f"WAV fmt chunk length {length} < 16")
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif ctype == b"data":
            data = chunk
            break  # fmt always precedes data in a well-formed file
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _align, bits = fmt
    if tag != 1 or bits not in (8, 16) or channels < 1 or rate < 1:
        raise ValueError(
            f"unsupported WAV variant (fmt tag {tag}, {bits}-bit, "
            f"{channels} ch) — only 8/16-bit integer PCM"
        )
    if len(data) > WAV_MAX_DECODED_BYTES:
        raise ValueError(
            f"WAV data chunk {len(data)} bytes exceeds the "
            f"{WAV_MAX_DECODED_BYTES}-byte decode cap"
        )
    width = bits // 8
    frame_bytes = width * channels
    n_frames = len(data) // frame_bytes
    if n_frames < 1:
        raise ValueError("WAV data chunk holds no complete frame")
    data = data[: n_frames * frame_bytes]
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:  # 8-bit WAV is unsigned with midpoint 128
        raw = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    return rate, channels, raw.reshape(n_frames, channels)


def encode_wav(
    sample_rate: int, channels: int, samples_i16: "np.ndarray"
) -> bytes:
    """Minimal deterministic 16-bit PCM WAV encoder — the test/fixture
    twin of ``_decode_wav`` (same role encode_png plays for the PNG
    path). ``samples_i16`` is int16, shape (n_frames, channels); the
    byte output is pure struct packing, stable everywhere — required
    for pinned oracle literals."""
    import struct

    pcm = np.asarray(samples_i16, dtype="<i2").reshape(-1, channels)
    data = pcm.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _audio_features(
    sample_rate: int, channels: int, samples: "np.ndarray"
) -> list[float]:
    """FEATURE_DIM floats from REAL decoded PCM, all in [0, 1]: RMS,
    mean |x|, peak, zero-crossing rate, DC offset, duration/channel/
    rate proxies. Mirrors _pixel_features: numpy reductions over the
    whole buffer, no per-sample Python loop, deterministic."""
    mono = samples.mean(axis=1)
    n = mono.shape[0]
    rms = float(np.sqrt((mono * mono).sum() / n))
    zc = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    return [
        min(rms, 1.0),
        min(float(np.abs(mono).sum() / n), 1.0),
        min(float(np.abs(samples).max()), 1.0),
        zc / (n - 1) if n > 1 else 0.0,
        (float(mono.sum() / n) + 1.0) / 2.0,
        n / (n + float(sample_rate)),  # ≈ seconds/(seconds+1)
        (channels - 1.0) / channels,
        sample_rate / (sample_rate + 44100.0),
    ]


def decode_audio(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Audio decode dispatcher: WAV integer PCM (``_decode_wav``) and
    FLAC (operators/flac.py — pure-integer, r12) decode for real;
    lossy codecs (mp3/ogg/...) require audio libraries absent from
    this container and raise NotImplementedError — pass a real
    decoder via ``extract_features(feature_fn=...)`` there."""
    if payload is None or len(payload) < 12:
        raise ValueError("empty audio payload")
    if bytes(payload[:4]) == b"RIFF" and bytes(payload[8:12]) == b"WAVE":
        import struct as _struct

        try:
            return _decode_wav(bytes(payload))
        except (_struct.error, IndexError, OverflowError) as exc:
            raise ValueError(f"corrupt WAV payload: {exc}") from exc
    if bytes(payload[:4]) == b"fLaC":
        from .flac import _decode_flac

        try:
            return _decode_flac(bytes(payload))
        except (IndexError, OverflowError) as exc:
            # flac.py raises ValueError by contract (bounds-checked
            # bit reader); this normalizes any stragglers the same
            # way the WAV branch does
            raise ValueError(f"corrupt FLAC payload: {exc}") from exc
    raise NotImplementedError(
        "audio codec not recognized as WAV PCM or FLAC; decoding it "
        "requires an audio library not present in this environment; "
        "extract_features(feature_fn=...) accepts a real decoder"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in feature vector: bytes → FEATURE_DIM
    floats derived from simple byte statistics. Replaces the decoder
    output so batch shape / schema / partitioning are testable."""
    if payload is None:
        payload = b""
    n = len(payload)
    acc = []
    for j in range(FEATURE_DIM):
        s = sum(payload[j::FEATURE_DIM]) if n else 0
        acc.append(float((s % 997) / 997.0))
    return acc


def _pixel_features(width: int, height: int, rgb: bytes) -> list[float]:
    """FEATURE_DIM floats from REAL decoded pixels, all in [0, 1]:
    channel means, luminance mean/std, aspect, fill ratio, extremes.
    numpy vectorized reductions over the whole pixel buffer — this is
    the batch idiom a production decoder seam should model (no
    per-pixel Python loop), and stays deterministic across runs."""
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3).astype(np.float64)
    n_px = max(width * height, 1)
    ch_sum = px.sum(axis=0) if px.size else np.zeros(3)
    luma = px @ np.array([0.299, 0.587, 0.114])
    mean_y = float(luma.sum()) / n_px
    var_y = max(float((luma * luma).sum()) / n_px - mean_y * mean_y, 0.0)
    lo = float(px.min()) if px.size else 255.0
    hi = float(px.max()) if px.size else 0.0
    return [
        float(ch_sum[0]) / (255.0 * n_px),
        float(ch_sum[1]) / (255.0 * n_px),
        float(ch_sum[2]) / (255.0 * n_px),
        mean_y / 255.0,
        var_y**0.5 / 255.0,
        width / (width + height) if width + height else 0.0,
        lo / 255.0,
        hi / 255.0,
    ]


def _default_features(payload: bytes) -> list[float]:
    """Magic-sniff router: payloads that decode as real images (PPM /
    24-bit BMP / PNG / GIF / baseline JPEG) yield pixel statistics,
    WAV PCM payloads yield
    real audio statistics (r11); everything else falls back to the
    byte-stat fake UNCHANGED (the media_feature_rollup oracle replays
    that path bit-for-bit on text payloads, so the fallback must stay
    stable)."""
    if payload is not None and bytes(payload[:2]) in (
        b"P6", b"P3", b"BM", b"GI", b"\xff\xd8", _PNG_SIG[:2],
    ):
        try:
            return _pixel_features(*decode_image(payload))
        except (ValueError, NotImplementedError):
            pass  # looked like an image but is not one → byte stats
    if (
        payload is not None
        and len(payload) >= 12
        and (
            (bytes(payload[:4]) == b"RIFF" and bytes(payload[8:12]) == b"WAVE")
            or bytes(payload[:4]) == b"fLaC"
        )
    ):
        try:
            # via decode_audio, which normalizes struct/index errors
            # from corrupt containers into the ValueError contract
            return _audio_features(*decode_audio(payload))
        except ValueError:
            pass  # looked like WAV/FLAC but not decodable → byte stats
    return _fake_features(payload)


def extract_features(
    media: DataFrame,
    feature_fn: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads →
    (media_id, modality, n_bytes, features array<double>).

    The pandas iterator shape is the real contract: batches arrive as
    Arrow record batches, the payload column is bytes per row, and
    each output batch declares FEATURES_SCHEMA. The default
    ``feature_fn`` routes decodable images through the REAL pure-
    Python decoder (see ``_default_features``); a production decoder
    slots in via ``feature_fn`` without touching the Spark plumbing."""
    fn = feature_fn or _default_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "features": [fn(p) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id long, modality string, payload binary, "
    "meta_width int, meta_height int"
)

FRAMES_SCHEMA = (
    "media_id long, frame_idx int, ts_ms int, frame_payload binary"
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in resize: stride-sample the payload down
    (or tile it up) to exactly width*height bytes. Replaces the pixel
    resample so schema / metadata rewrite / batch shape are testable;
    a real PIL/opencv resample slots in via ``resize_fn``."""
    if payload is None:
        payload = b""
    target = max(width * height, 0)
    if not target:
        return b""
    if not payload:
        return bytes(target)
    if len(payload) >= target:
        stride = len(payload) // target
        return payload[:: max(stride, 1)][:target]
    reps = target // len(payload) + 1
    return (payload * reps)[:target]


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched payload resize → same media layout with the
    payload transformed and meta_width/meta_height rewritten to the
    target dimensions (metadata must track the payload — downstream
    pruned-metadata scans depend on it).

    1 row in → 1 row out; the binary column round-trips through Arrow
    in batches. Swap ``resize_fn`` for a real resampler (PIL/opencv)
    without touching the Spark plumbing."""
    fn = resize_fn or _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": [fn(p, width, height) for p in pdf["payload"]],
                    "meta_width": width,
                    "meta_height": height,
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def _fake_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in frame extraction: split the payload into
    ``n_frames`` contiguous chunks (last chunk takes the remainder).
    A real ffmpeg keyframe sampler slots in via ``frame_fn``."""
    if payload is None:
        payload = b""
    if n_frames <= 0:
        return []
    step = max(len(payload) // n_frames, 1)
    return [
        payload[i * step: (i + 1) * step] if i < n_frames - 1
        else payload[(n_frames - 1) * step:]
        for i in range(n_frames)
    ]


def sample_frames(
    media: DataFrame,
    n_frames: int,
    frame_fn: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Arrow-batched frame sampling → 1 media row explodes into up to
    ``n_frames`` rows of (media_id, frame_idx, ts_ms, frame_payload);
    ts_ms spreads frames evenly across meta_duration_ms.

    The 1→N expansion INSIDE mapInPandas is the contract a video
    pipeline needs (an output batch need not align row-for-row with
    its input batch). Swap ``frame_fn`` for a real decoder (ffmpeg)
    without touching the Spark plumbing."""
    fn = frame_fn or _fake_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts, frames = [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["meta_duration_ms"]
            ):
                chunks = fn(payload, n_frames)
                dur = int(dur) if dur is not None and not pd.isna(dur) else 0
                for i, chunk in enumerate(chunks):
                    ids.append(mid)
                    idxs.append(i)
                    ts.append(i * dur // max(len(chunks), 1))
                    frames.append(chunk)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "ts_ms": ts,
                    "frame_payload": frames,
                }
            )

    return media.select("media_id", "payload", "meta_duration_ms").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )


def media_summary(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — must NEVER touch the payload column
    (column pruning keeps the binary bytes out of the scan; that is
    the point of the typed-metadata layout)."""
    return (
        media.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.avg("meta_duration_ms").alias("avg_duration_ms"),
            F.max("meta_width").alias("max_width"),
        )
        .orderBy("modality")
    )


# ---------------------------------------------------------------------------
# X38 perceptual media dedup (r16): dHash + Hamming-banded pairing.
# ---------------------------------------------------------------------------

PHASH_SCHEMA = "media_id long, modality string, phash long, decoded boolean"


def dhash64(payload: bytes) -> int:
    """64-bit difference hash (dHash, the classic perceptual image
    fingerprint): decode → luma → 9×8 box-average downsample → one
    bit per horizontally adjacent cell pair (left > right). Small
    pixel noise, re-encoding, and resizing flip few cells, so
    near-identical images land within a small Hamming radius — the
    image-side analogue of SimHash on text. Raises if the payload is
    not a decodable image (callers route the fallback)."""
    import numpy as np

    w, h, rgb = decode_image(payload)
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    # ITU-R BT.601 luma
    luma = a[:, :, 0] * 0.299 + a[:, :, 1] * 0.587 + a[:, :, 2] * 0.114
    # 9x8 box-average via split indices (handles w < 9 / h < 8 by
    # repeating edge pixels — tiny images still hash)
    ys = np.linspace(0, h, 9)[:-1].astype(int) if h >= 8 else np.zeros(8, int)
    xs = np.linspace(0, w, 10)[:-1].astype(int) if w >= 9 else np.zeros(9, int)
    ye = np.append(ys[1:], h) if h >= 8 else np.full(8, h)
    xe = np.append(xs[1:], w) if w >= 9 else np.full(9, w)
    grid = np.empty((8, 9))
    for r in range(8):
        for c in range(9):
            block = luma[ys[r]:max(ye[r], ys[r] + 1), xs[c]:max(xe[c], xs[c] + 1)]
            grid[r, c] = block.mean()
    bits = (grid[:, :-1] > grid[:, 1:]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # two's-complement into a signed 64-bit long (Spark LongType)
    return v - (1 << 64) if v >= (1 << 63) else v


def perceptual_hashes(media: DataFrame) -> DataFrame:
    """Arrow-batched perceptual hashing over binary payloads →
    (media_id, modality, phash, decoded). Decodable images get the
    real dHash; undecodable payloads fall back to an exact content
    hash (md5 low 64 bits — detects byte-identical duplicates only)
    with ``decoded = False`` so downstream pairing never mixes the
    two hash spaces. A NULL payload hashes a per-``media_id``
    sentinel, NOT md5(b'') — two rows with missing content are not
    byte-identical duplicates, so NULLs never pair with each other
    (r16 ADVICE item 3)."""
    import hashlib

    def one(mid, p) -> tuple[int, bool]:
        if p is not None:
            try:
                return dhash64(bytes(p)), True
            except (ValueError, NotImplementedError):
                pass
        raw = (
            hashlib.md5(b"\x00null-payload:%d" % int(mid)).digest()[:8]
            if p is None
            else hashlib.md5(bytes(p)).digest()[:8]
        )
        v = int.from_bytes(raw, "big")
        return (v - (1 << 64) if v >= (1 << 63) else v), False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hv, dec = (
                zip(*(one(m, p) for m, p in zip(pdf["media_id"], pdf["payload"])))
                if len(pdf)
                else ((), ())
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "phash": pd.Series(hv, dtype="int64"),
                    "decoded": pd.Series(dec, dtype="bool"),
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, schema=PHASH_SCHEMA
    )


def media_near_dup_pairs(
    media: DataFrame,
    bands: int = 8,
    hamming_max: int = 6,
) -> DataFrame:
    """Perceptual near-dup media pairs: Manku-style s-subset banding
    over the 64-bit dHash (the simhash_near_dup_pairs scheme — see
    operators/dedup.py:296 for the pigeonhole recall-1.0 argument and
    the s-subset key-width math), verify popcount ≤ ``hamming_max``.
    Fallback-hashed payloads (undecodable → exact md5 space) pair
    only at Hamming 0, i.e. byte-identical content — the ``decoded``
    flag joins as part of the band key so the two hash spaces never
    cross. Returns (a, b, hamming, decoded).

    Scale shape: the phash relation is one long per item (pinned
    eagerly — it feeds both join sides through a 28-key explode);
    candidates are band-bucketed, the verify is codegen popcount —
    never an all-pairs join."""
    import itertools as _it

    bits = 64 // bands
    m = bands - hamming_max
    if m <= 0:
        raise ValueError(
            f"hamming_max={hamming_max} must be < bands={bands} for recall 1.0"
        )
    s = min(m, 2)
    combos = list(_it.combinations(range(bands), s))

    def _bval(i: int) -> Column:
        return F.shiftright("phash", i * bits).bitwiseAND(F.lit((1 << bits) - 1))

    keys = []
    for cid, combo in enumerate(combos):
        k: Column = F.lit(cid).cast("long")
        for i in combo:
            k = F.shiftleft(k, bits).bitwiseOR(_bval(i))
        keys.append(k)

    fp = perceptual_hashes(media).localCheckpoint(eager=True)
    banded = fp.select(
        "media_id",
        "phash",
        "decoded",
        F.explode(F.array(*keys)).alias("_bkey"),
    )
    lhs = banded.select(
        F.col("media_id").alias("a"),
        F.col("phash").alias("_ha"),
        "decoded",
        "_bkey",
    )
    rhs = banded.select(
        F.col("media_id").alias("b"),
        F.col("phash").alias("_hb"),
        "decoded",
        "_bkey",
    )
    from ..functions.hashing import hamming64

    verified = (
        lhs.join(rhs, ["_bkey", "decoded"])
        .where(F.col("a") < F.col("b"))
        .select(
            "a", "b", hamming64(F.col("_ha"), F.col("_hb")).alias("hamming"),
            "decoded",
        )
    )
    radius = F.when(F.col("decoded"), F.lit(hamming_max)).otherwise(F.lit(0))
    return verified.where(F.col("hamming") <= radius).distinct()


def media_dedup_canonical(
    media: DataFrame,
    bands: int = 8,
    hamming_max: int = 6,
) -> DataFrame:
    """X38 completion (r17, mirroring X16's dedup_keep_best_docs):
    perceptual near-dup pairs → connected components → ONE canonical
    item per perceptual cluster, keep = largest payload (most bytes —
    the highest-fidelity copy of a re-encoded/resized family), ties
    to the smallest media_id. Transitive closure matters: A≈A' and
    A'≈A'' must collapse to one survivor even when A, A'' drift past
    the pairing radius. Fallback-space (undecodable) clusters contain
    only byte-identical content by construction (see
    media_near_dup_pairs), so their keep rule degenerates to the
    exact-dup canonical. Every item gets a row; singletons keep
    themselves. Returns (media_id, best_id, is_kept, n_bytes).

    Scale shape: pairs are band-bucketed (never all-pairs), the
    component relation is edge-bounded min-label propagation
    (graph.py:106), and the keep-best argmax is one window
    partitioned by cluster id — the dedup_keep_best_docs plan on the
    media axis."""
    from .graph import connected_components

    pairs = media_near_dup_pairs(media, bands=bands, hamming_max=hamming_max)
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    comp = connected_components(edges)
    sized = media.select(
        "media_id",
        F.coalesce(F.length("payload"), F.lit(0)).cast("long").alias("n_bytes"),
    )
    mapped = (
        sized.join(comp, sized.media_id == comp.id, "left")
        .select(
            "media_id",
            F.coalesce("component", "media_id").alias("_grp"),
            "n_bytes",
        )
    )
    w = Window.partitionBy("_grp").orderBy(
        F.col("n_bytes").desc(), F.col("media_id")
    )
    best = (
        mapped.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("_grp", F.col("media_id").alias("best_id"))
    )
    return mapped.join(best, "_grp").select(
        "media_id",
        "best_id",
        (F.col("media_id") == F.col("best_id")).alias("is_kept"),
        "n_bytes",
    )
