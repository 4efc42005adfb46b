"""Multimodal (image/audio/video) column processing.

Media ride through the engine as opaque ``binary`` columns with typed
metadata structs — the only representation that scales: blobs stay in
columnar storage, predicates prune on metadata without touching bytes,
and compute happens in Arrow-batched Pandas iterators (``mapInPandas``),
never row-at-a-time Python.

Decode is REAL for the formats stdlib+numpy can express — uncompressed
BMP (pure numpy header parse, 8-bit palette + 24-bit BGR), PNG (stdlib
``zlib`` inflate + all five scanline unfilters; gray / RGB / palette /
alpha color types, 8- and 16-bit, Adam7 interlace), GIF (pure-Python
LZW, interlace, local/global palettes), baseline JPEG (operators/jpeg:
Huffman entropy decode + IDCT, luma plane out), and PCM WAV plus G.711
mu-law/A-law (stdlib ``wave`` / numpy expansion), binary netpbm
(P5/P6), and uncompressed TIFF (both byte orders, strips, WhiteIsZero)
— dispatched on magic bytes, with exact/bounded encode/decode
roundtrips pinned by tests.  JPEG covers baseline AND progressive
(SOF2 spectral selection + successive approximation).  Video is REAL
for animated GIF and for AVI containers (RIFF parse; MJPEG frames
through the baseline-JPEG decoder, uncompressed 8/24-bit DIB frames
directly).  What remains codec-bound (MP3, MP4/H.264) needs
PIL/ffmpeg/librosa, NOT in this container: those fall back to a
deterministic fake derived from the payload bytes (clearly marked; swap
for the real library on a cluster image).  Everything Spark-side is
real and tested either way: schemas, Arrow batch shapes, UDF
signatures, partition-sized batching.

Schema conventions:
    image:  (media_id BIGINT, content BINARY,
             meta STRUCT<format STRING, width INT, height INT>)
    audio:  (media_id BIGINT, content BINARY,
             meta STRUCT<format STRING, sample_rate INT, n_samples INT>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "media_id BIGINT, content BINARY, "
    "meta STRUCT<format: STRING, width: INT, height: INT>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id BIGINT, width INT, height INT, n_bytes INT, "
    "mean_intensity DOUBLE, feature ARRAY<DOUBLE>"
)

RESIZE_SCHEMA = (
    "media_id BIGINT, content BINARY, "
    "meta STRUCT<format: STRING, width: INT, height: INT>"
)


def encode_bmp_gray8(img: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as an uncompressed 8-bit BMP with an
    identity grayscale palette (pure numpy/struct — no codec).  Rows are
    bottom-up and padded to 4 bytes, per the format."""
    import struct

    h, w = img.shape
    pad = (-w) % 4
    palette = b"".join(struct.pack("<BBBB", v, v, v, 0) for v in range(256))
    rows = b"".join(
        img[r].astype(np.uint8).tobytes() + b"\x00" * pad for r in range(h - 1, -1, -1)
    )
    offset = 14 + 40 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", offset + len(rows), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(rows), 2835, 2835, 256, 0)
    return header + info + palette + rows


def _meta_int(meta, key: str) -> int:
    """Null-safe metadata coercion: None/missing -> 0 (the real decoders
    don't need metadata; only the deterministic fake does)."""
    if meta is None:
        return 0
    v = meta[key] if key in meta else None
    # struct fields arrive as numpy scalars through Arrow; NaN means null
    return int(v) if v is not None and v == v else 0


def _decode_bmp(content: bytes) -> np.ndarray:
    """REAL decode of uncompressed BMP (BI_RGB): 8-bit palette images
    come back as the palette-index plane mapped through the palette's
    blue channel (identity-gray palettes roundtrip exactly); 24-bit BGR
    is reduced to uint8 grayscale by integer channel mean."""
    import struct

    offset = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    w, h = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    comp = struct.unpack_from("<I", content, 30)[0]
    if comp != 0 or bpp not in (8, 24):
        raise NotImplementedError(f"BMP decode supports BI_RGB 8/24-bit, got bpp={bpp} comp={comp}")
    flip = h > 0
    h = abs(h)
    if bpp == 8:
        row_bytes = (w + 3) & ~3
        raw = np.frombuffer(content, np.uint8, count=row_bytes * h, offset=offset)
        idx = raw.reshape(h, row_bytes)[:, :w]
        pal_off = 14 + hdr_size
        # biClrUsed (offset 46) bounds the stored palette; 0 means full.
        # Entries past the stored table default to identity so short
        # palettes neither crash nor read into pixel data.
        n_pal = struct.unpack_from("<I", content, 46)[0] or 256
        n_pal = min(n_pal, 256, max(0, (offset - pal_off)) // 4)
        pal_b = np.arange(256, dtype=np.uint8)
        if n_pal > 0:
            stored = np.frombuffer(
                content, np.uint8, count=n_pal * 4, offset=pal_off
            ).reshape(n_pal, 4)
            pal_b[:n_pal] = stored[:, 0]  # blue channel; identity for gray
        img = pal_b[idx]
    else:
        row_bytes = (w * 3 + 3) & ~3
        raw = np.frombuffer(content, np.uint8, count=row_bytes * h, offset=offset)
        bgr = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        img = (bgr.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    return img[::-1] if flip else img


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick whichever of left (a),
    up (b), up-left (c) is closest to a+b-c, preferring a, then b."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png_gray8(img: np.ndarray, *, filter_type: int = 0) -> bytes:
    """Encode a 2-D uint8 array as an 8-bit grayscale PNG (stdlib
    ``zlib``/``struct`` — no codec library).

    ``filter_type`` applies the REAL per-scanline filter math (0 None,
    1 Sub, 2 Up, 3 Average, 4 Paeth) before deflate, so roundtrip tests
    exercise every unfilter path of :func:`_decode_png` against an
    independently-constructed stream.
    """
    import struct
    import zlib

    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"PNG filter type must be 0..4, got {filter_type}")
    h, w = img.shape
    img = img.astype(np.uint8)
    lines = []
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        cur = img[r].astype(np.int32)
        left = np.concatenate(([0], cur[:-1]))
        upleft = np.concatenate(([0], prev[:-1]))
        if filter_type == 0:
            f = cur
        elif filter_type == 1:
            f = cur - left
        elif filter_type == 2:
            f = cur - prev
        elif filter_type == 3:
            f = cur - (left + prev) // 2
        else:
            pred = np.fromiter(
                (_png_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prev, upleft)),
                dtype=np.int32,
                count=w,
            )
            f = cur - pred
        lines.append(bytes([filter_type]) + (f % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    idat = zlib.compress(b"".join(lines))
    return _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering: ``raw`` is h scanlines of
    (1 filter byte + stride data bytes); returns (h, stride) uint8.

    Up/None/Sub are vectorized (Sub is a per-lane cumulative sum mod
    256); Average and Paeth depend on the just-reconstructed left
    neighbor, so they run as per-byte loops — acceptable because images
    decode independently inside Arrow batches (the parallelism is
    across rows of the DataFrame, not within one image).
    """
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG data truncated")
    arr = np.frombuffer(raw, np.uint8, count=h * (stride + 1)).reshape(h, stride + 1)
    ftypes, data = arr[:, 0], arr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft, f = int(ftypes[r]), data[r]
        if ft == 0:
            cur = f
        elif ft == 1:
            cur = f.copy()
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(cur[lane::bpp]) % 256
        elif ft == 2:
            cur = (f + prev) % 256
        elif ft == 3:
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (f[x] + (left + prev[x]) // 2) % 256
        elif ft == 4:
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                cur[x] = (f[x] + _png_paeth(int(a), int(prev[x]), int(c))) % 256
        else:
            raise NotImplementedError(f"PNG filter type {ft}")
        out[r] = cur
        prev = cur
    return out.astype(np.uint8)


# Adam7 passes: (x_start, y_start, x_step, y_step) — each pass is an
# independently-filtered sub-image in storage order
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _decode_png(content: bytes) -> np.ndarray:
    """REAL decode of 8/16-bit PNG via stdlib ``zlib``:
    chunk walk -> inflate IDAT -> unfilter -> uint8 grayscale.

    Color types: 0 gray (exact), 4 gray+alpha (alpha dropped), 2 RGB /
    6 RGBA (integer channel mean, like the 24-bit BMP path), 3 palette
    (indices mapped through the PLTE's channel mean — identity-gray
    palettes roundtrip exactly).  16-bit samples keep their high byte
    (the spec's own 16->8 approximation).  Adam7 interlacing is
    supported: each of the seven passes is an independently-filtered
    sub-image (its own scanline filter bytes), unfiltered separately
    and scattered onto the (y0 + i*dy, x0 + j*dx) grid.
    """
    import struct
    import zlib

    if content[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(content):
        length, ctype = struct.unpack_from(">I4s", content, pos)
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth not in (8, 16) or comp != 0 or filt != 0:
        raise NotImplementedError(f"PNG depth={depth} comp={comp} filter={filt}")
    if interlace not in (0, 1):
        raise NotImplementedError(f"PNG interlace method {interlace}")
    if depth == 16 and ctype_n == 3:
        raise ValueError("PNG palette images are 8-bit by spec")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_n)
    if channels is None:
        raise NotImplementedError(f"PNG color type {ctype_n}")
    bps = depth // 8  # bytes per sample; filters operate on raw bytes
    bpp = channels * bps
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        px = _png_unfilter(raw, h, w * bpp, bpp).reshape(h, w, channels, bps)[
            :, :, :, 0
        ]  # 16-bit: network byte order — high byte ≈ value/257
    else:
        px = np.zeros((h, w, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * bpp
            sub = _png_unfilter(raw[pos:], ph, stride, bpp).reshape(
                ph, pw, channels, bps
            )[:, :, :, 0]
            pos += ph * (stride + 1)
            px[y0::dy, x0::dx] = sub
    if ctype_n == 0:
        return px[:, :, 0]
    if ctype_n == 4:
        return px[:, :, 0]  # gray plane; alpha dropped
    if ctype_n == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        gray = (plte.astype(np.uint16).sum(axis=1) // 3).astype(np.uint8)
        lut = np.zeros(256, dtype=np.uint8)
        lut[: gray.size] = gray
        return lut[px[:, :, 0]]
    return (px[:, :, :3].astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)


def _gif_lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """GIF-flavor LZW (LSB-first variable-width codes, 12-bit cap,
    CLEAR/END control codes) -> palette indices."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1

    def fresh() -> list:
        return [[i] for i in range(clear)] + [None, None]

    table, code_size, prev = fresh(), min_code_size + 1, None
    out: list[int] = []
    bitpos, total = 0, len(data) * 8
    while bitpos + code_size <= total:
        byte_i, bit_o = divmod(bitpos, 8)
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> bit_o) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table, code_size, prev = fresh(), min_code_size + 1, None
            continue
        if code == end:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _gif_lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """Real LZW compression (dictionary build, width growth, 4096-entry
    reset) — exists so GIF roundtrip tests feed :func:`_gif_lzw_decode`
    an independently-produced stream, not its own output."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    codes: list[tuple[int, int]] = []

    def fresh() -> dict:
        return {(i,): i for i in range(clear)}

    table, next_code, code_size = fresh(), end + 1, min_code_size + 1
    codes.append((clear, code_size))
    buf: tuple = ()
    for px in indices:
        cand = buf + (int(px),)
        if cand in table:
            buf = cand
            continue
        codes.append((table[buf], code_size))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code == 4096:
            codes.append((clear, code_size))
            table, next_code, code_size = fresh(), end + 1, min_code_size + 1
        buf = (int(px),)
    if buf:
        codes.append((table[buf], code_size))
    codes.append((end, code_size))
    acc = bitpos = 0
    out = bytearray()
    for code, width in codes:
        acc |= code << bitpos
        bitpos += width
        while bitpos >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bitpos -= 8
    if bitpos:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_frame_blocks(img: np.ndarray, *, interlace: bool, left: int = 0, top: int = 0) -> bytes:
    """One image-descriptor block (descriptor + LZW sub-blocks) for an
    encoder frame."""
    import struct

    h, w = img.shape
    rows = img[_gif_interlace_order(h)] if interlace else img
    sub = _gif_lzw_encode(8, rows.reshape(-1).tolist())
    blocks = b"".join(
        bytes([len(chunk)]) + chunk
        for chunk in (sub[i : i + 255] for i in range(0, len(sub), 255))
    )
    return (
        b"\x2c"
        + struct.pack("<HHHHB", left, top, w, h, 0x40 if interlace else 0)
        + bytes([8])  # LZW min code size
        + blocks
        + b"\x00"  # block terminator
    )


def encode_gif_gray8(img: np.ndarray, *, interlace: bool = False) -> bytes:
    """Encode a 2-D uint8 array as a GIF87a with a 256-entry identity
    grayscale palette and real LZW compression (stdlib-only)."""
    import struct

    h, w = img.shape
    img = img.astype(np.uint8)
    palette = bytes(v for g in range(256) for v in (g, g, g))
    return (
        b"GIF87a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global 256-color table
        + palette
        + _gif_frame_blocks(img, interlace=interlace)
        + b"\x3b"  # trailer
    )


def encode_gif_gray8_frames(frames: list, *, offsets: list | None = None) -> bytes:
    """Encode a multi-frame (animated) GIF89a: frame 0 sets the logical
    screen; later frames may be smaller patches at (left, top) offsets
    — the real animation layout, where frames compose onto the previous
    screen."""
    import struct

    h, w = frames[0].shape
    offsets = offsets or [(0, 0)] * len(frames)
    palette = bytes(v for g in range(256) for v in (g, g, g))
    body = b"".join(
        _gif_frame_blocks(np.asarray(f, dtype=np.uint8), interlace=False, left=x, top=y)
        for f, (x, y) in zip(frames, offsets)
    )
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        + palette
        + body
        + b"\x3b"
    )


def _gif_interlace_order(h: int) -> np.ndarray:
    """GIF's four interlace passes: rows 0::8, 4::8, 2::4, 1::2 — the
    order scanlines are STORED for an ``h``-row image."""
    return np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    ).astype(int)


def _iter_gif_frames(content: bytes):
    """REAL decode of EVERY frame of a GIF87a/89a via pure-Python LZW:
    header walk (extensions skipped), global/local color tables,
    variable-width LSB-first codes, interlace reorder.  Palettes reduce
    to uint8 gray by integer RGB mean (identity-gray palettes roundtrip
    exactly).  Each frame composes onto the running logical screen at
    its (left, top) offset — the animation convention — and the screen
    snapshot after each frame is yielded.  (Disposal modes and
    transparency are simplifications: frames replace the rectangle
    they cover.)"""
    import struct

    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(content, np.uint8, count=n * 3, offset=pos).reshape(n, 3)
        pos += n * 3
    screen = np.zeros((sh, sw), dtype=np.uint8)
    yielded = False
    while pos < len(content):
        marker = content[pos]
        pos += 1
        if marker == 0x21:  # extension: label + sub-blocks
            pos += 1
            while content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
        elif marker == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack_from("<HHHHB", content, pos)
            pos += 9
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(content, np.uint8, count=n * 3, offset=pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF frame has no color table")
            min_code = content[pos]
            pos += 1
            sub = bytearray()
            while content[pos] != 0:
                ln = content[pos]
                sub += content[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw_decode(min_code, bytes(sub))
            if len(idx) < w * h:
                raise ValueError("GIF pixel data truncated")
            frame = np.asarray(idx[: w * h], dtype=np.int32).reshape(h, w)
            if iflags & 0x40:
                deinterlaced = np.empty_like(frame)
                deinterlaced[_gif_interlace_order(h)] = frame
                frame = deinterlaced
            gray = (ct.astype(np.uint16).sum(axis=1) // 3).astype(np.uint8)
            lut = np.zeros(256, dtype=np.uint8)
            lut[: gray.size] = gray
            screen[top : top + h, left : left + w] = lut[frame]
            yielded = True
            yield screen.copy()
        elif marker == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{marker:02x}")
    if not yielded:
        raise ValueError("GIF contains no image frame")


def _decode_gif(content: bytes) -> np.ndarray:
    """First composed frame of :func:`_iter_gif_frames` (the still-image
    view of a GIF)."""
    return next(_iter_gif_frames(bytes(content)))


def _decode_pnm(content: bytes) -> np.ndarray:
    """REAL decode of binary netpbm: P5 (gray) and P6 (RGB, reduced by
    integer channel mean).  Header = magic, optional #comments,
    width/height/maxval whitespace-separated; 8-bit maxval only."""
    if content[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM")
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while content[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(content[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise NotImplementedError("16-bit PNM")
    ch = 1 if content[:2] == b"P5" else 3
    px = np.frombuffer(content, np.uint8, count=w * h * ch, offset=pos)
    if ch == 1:
        return px.reshape(h, w).copy()
    return (px.reshape(h, w, 3).astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)


def encode_pgm(img: np.ndarray) -> bytes:
    """2-D uint8 -> binary PGM (P5)."""
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _tiff_lzw_decode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first codes, 9->12 bit widths with the
    EARLY-CHANGE rule (width grows one code earlier than GIF — the
    libtiff maxcode = (1<<nbits)-2 convention below 12 bits)."""
    out = bytearray()
    nbits, maxcode = 9, (1 << 9) - 2
    table: list[bytes] = []
    free_ent = 258
    prev: bytes | None = None
    acc = accbits = 0
    pos = 0
    n = len(data)
    while True:
        while accbits < nbits and pos < n:
            acc = (acc << 8) | data[pos]
            pos += 1
            accbits += 8
        if accbits < nbits:
            break
        code = (acc >> (accbits - nbits)) & ((1 << nbits) - 1)
        accbits -= nbits
        if code == 256:  # Clear
            table = [bytes((i,)) for i in range(256)] + [b"", b""]
            free_ent, nbits, maxcode = 258, 9, (1 << 9) - 2
            prev = None
            continue
        if code == 257:  # EndOfInformation
            break
        if prev is None:
            entry = table[code]
        elif code < free_ent:
            entry = table[code]
        elif code == free_ent:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            free_ent += 1
            if free_ent > maxcode:
                nbits += 1
                maxcode = (1 << nbits) - (1 if nbits == 12 else 2)
        prev = entry
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """Mirror of :func:`_tiff_lzw_decode` (same early-change widths);
    emits Clear / EOI per TIFF 6.0, resetting at a full table."""
    out = bytearray()
    acc = accbits = 0

    def emit(code: int, nbits: int) -> None:
        nonlocal acc, accbits
        acc = (acc << nbits) | code
        accbits += nbits
        while accbits >= 8:
            out.append((acc >> (accbits - 8)) & 0xFF)
            accbits -= 8

    # The decoder's table lags the encoder's by exactly one entry (it
    # adds after reading the NEXT code), so the encoder's width switch
    # fires at (1<<n)-1 while the decoder's early-change rule fires at
    # (1<<n)-2 — the streams then agree on every code's width.
    table: dict[bytes, int] = {bytes((i,)): i for i in range(256)}
    free_ent, nbits = 258, 9
    emit(256, nbits)
    w = b""
    for b in data:
        k = w + bytes((b,))
        if k in table:
            w = k
            continue
        emit(table[w], nbits)
        table[k] = free_ent
        free_ent += 1
        if nbits == 12:
            if free_ent >= 4094:  # table full: Clear + restart
                emit(256, nbits)
                table = {bytes((i,)): i for i in range(256)}
                free_ent, nbits = 258, 9
        elif free_ent > (1 << nbits) - 1:
            nbits += 1
        w = bytes((b,))
    if w:
        emit(table[w], nbits)
    emit(257, nbits)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """TIFF PackBits (Apple RLE): n in 0..127 -> copy n+1 literals,
    n in -127..-1 -> repeat next byte 1-n times, -128 -> no-op."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n >= 0:
            out += data[i : i + n + 1]
            i += n + 1
        elif n != -128:
            out += data[i : i + 1] * (1 - n)
            i += 1
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs of >= 3 as repeats, else literals."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append((257 - run) & 0xFF)
            out.append(data[i])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out.append(i - lit - 1)
        out += data[lit:i]
    return bytes(out)


_TIFF_STRIP_DECODERS = {
    1: lambda d: d,
    5: _tiff_lzw_decode,
    32773: _packbits_decode,
}


def _decode_tiff(content: bytes) -> np.ndarray:
    """REAL decode of baseline TIFF (both byte orders): first IFD,
    8-bit grayscale or RGB (channel-mean reduction), strip layout;
    compressions: none, LZW (early change), PackBits, and Deflate
    (zlib, codes 8/32946).  JPEG-in-TIFF raises NotImplementedError —
    the dispatcher falls back when metadata allows."""
    import struct

    if content[:4] == b"II*\x00":
        bo = "<"
    elif content[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack_from(bo + "I", content, 4)
    (n_tags,) = struct.unpack_from(bo + "H", content, ifd_off)
    tags: dict[int, tuple] = {}
    _SZ = {1: 1, 2: 1, 3: 2, 4: 4}
    for i in range(n_tags):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", content, off)
        if typ not in _SZ:
            continue
        total = _SZ[typ] * cnt
        voff = off + 8 if total <= 4 else struct.unpack_from(bo + "I", content, off + 8)[0]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        vals = struct.unpack_from(bo + fmt * cnt, content, voff)
        tags[tag] = vals
    w = tags[256][0]
    h = tags[257][0]
    comp = tags.get(259, (1,))[0]
    if comp in (8, 32946):  # Adobe/legacy Deflate: zlib per strip
        import zlib

        strip_decode = zlib.decompress
    elif comp in _TIFF_STRIP_DECODERS:
        strip_decode = _TIFF_STRIP_DECODERS[comp]
    else:
        raise NotImplementedError(f"TIFF compression {comp}")
    bits = tags.get(258, (8,))
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits}")
    spp = tags.get(277, (1,))[0]
    if spp not in (1, 3):
        raise NotImplementedError(f"TIFF samples-per-pixel {spp}")
    offsets = tags[273]
    counts = tags.get(279, (w * h * spp,))
    raw = b"".join(strip_decode(content[o : o + c]) for o, c in zip(offsets, counts))
    px = np.frombuffer(raw, np.uint8, count=w * h * spp)
    if spp == 1:
        img = px.reshape(h, w).copy()
    else:
        img = (px.reshape(h, w, 3).astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    if tags.get(262, (1,))[0] == 0:  # PhotometricInterpretation WhiteIsZero
        img = (255 - img.astype(np.int16)).astype(np.uint8)
    return img


_TIFF_STRIP_ENCODERS = {
    "none": (1, lambda d: d),
    "lzw": (5, _tiff_lzw_encode),
    "packbits": (32773, _packbits_encode),
}


def encode_tiff_gray8(
    img: np.ndarray,
    *,
    rows_per_strip: int | None = None,
    compression: str = "none",
) -> bytes:
    """2-D uint8 -> little-endian TIFF (multi-strip when
    ``rows_per_strip`` is set — exercises the strip-reassembly path).
    ``compression``: "none" | "lzw" | "packbits" | "deflate" — per-strip
    compression, the fixture source for the compressed decode paths."""
    import struct

    if compression == "deflate":
        import zlib

        comp_code, enc = 8, zlib.compress
    else:
        comp_code, enc = _TIFF_STRIP_ENCODERS[compression]
    h, w = img.shape
    rps = rows_per_strip or h
    strips = [enc(img[r : r + rps].tobytes()) for r in range(0, h, rps)]
    n = len(strips)
    # layout: header(8) | pixel strips | IFD | long-value arrays
    data_off = 8
    strip_offs = []
    off = data_off
    for s in strips:
        strip_offs.append(off)
        off += len(s)
    ifd_off = off
    n_tags = 8
    after_ifd = ifd_off + 2 + 12 * n_tags + 4

    def arr_or_inline(vals):
        nonlocal after_ifd
        if len(vals) == 1:
            return vals[0], b""
        blob = struct.pack("<" + "I" * len(vals), *vals)
        ptr = after_ifd
        after_ifd += len(blob)
        return ptr, blob

    so_val, so_blob = arr_or_inline(strip_offs)
    sc_val, sc_blob = arr_or_inline([len(s) for s in strips])
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8), (259, 3, 1, comp_code),
        (262, 3, 1, 1), (273, 4, n, so_val), (278, 4, 1, rps), (279, 4, n, sc_val),
    ]
    ifd = struct.pack("<H", n_tags)
    for tag, typ, cnt, val in entries:
        ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    return (
        b"II*\x00" + struct.pack("<I", ifd_off)
        + b"".join(strips) + ifd + so_blob + sc_blob
    )


def _fake_image(content: bytes, width: int, height: int) -> np.ndarray:
    buf = np.frombuffer(content, dtype=np.uint8)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = int(np.ceil(width * height / buf.size))
    return np.tile(buf, reps)[: width * height].reshape(height, width)


def _decode_image(content: bytes, width: int, height: int) -> np.ndarray:
    """Decode dispatcher: REAL numpy decode for uncompressed BMP (magic
    ``BM``) and 8-bit PNG (the 8-byte PNG signature); deterministic
    fake for everything else.

    A payload that LOOKS like a supported format but fails the real
    decode (RLE/exotic BMP bit depths, sub-byte PNG depths, truncated
    headers, a random payload that happens to carry the magic) falls
    back to the fake when metadata carries dimensions — one
    undecodable file must not fail a 100 TB job — and re-raises the
    decode error only when no fallback is possible.

    Codec-bound formats (arithmetic-coded JPEG etc.) would be
    ``np.asarray(PIL.Image.open(BytesIO(content)))`` — PIL is not in
    this container, so the fallback derives a deterministic uint8
    grayscale array from the payload bytes (repeating it to fill
    width*height).  Keeps every downstream shape/statistic real.
    """
    real = None
    if content[:2] == b"BM":
        real = _decode_bmp
    elif bytes(content[:8]) == _PNG_MAGIC:
        real = _decode_png
    elif bytes(content[:6]) in (b"GIF87a", b"GIF89a"):
        real = _decode_gif
    elif bytes(content[:2]) == b"\xff\xd8":
        from beyond_vector_search_spark.operators.jpeg import decode_jpeg

        real = decode_jpeg
    elif bytes(content[:2]) in (b"P5", b"P6"):
        real = _decode_pnm
    elif bytes(content[:4]) in (b"II*\x00", b"MM\x00*"):
        real = _decode_tiff
    if real is not None:
        try:
            return real(bytes(content))
        except Exception:  # noqa: BLE001 — variant/corrupt: fall back if we can
            if width > 0 and height > 0:
                return _fake_image(content, width, height)
            raise
    if width <= 0 or height <= 0:
        raise NotImplementedError(
            "real decode of JPEG-class formats requires PIL/opencv (not in "
            "this container); metadata must carry width/height for the fake"
        )
    return _fake_image(content, width, height)


def image_features(images: DataFrame, *, feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract in Arrow batches.

    mapInPandas: each partition arrives as an iterator of pandas
    DataFrames (Arrow batches); the UDF is called once per batch, the
    decode loop is C-speed numpy per image.  The 'feature' is a
    ``feature_dim``-bin intensity histogram (a stand-in for a real
    embedding model — same schema, same batching).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                img = _decode_image(content, _meta_int(meta, "width"), _meta_int(meta, "height"))
                h, w = img.shape  # decoded shape is authoritative (BMP carries its own)
                hist, _ = np.histogram(img, bins=feature_dim, range=(0, 256))
                denom = max(1, img.size)
                out.append(
                    (
                        int(mid),
                        w,
                        h,
                        len(content),
                        float(img.mean()),
                        (hist / denom).astype(float).tolist(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "n_bytes", "mean_intensity", "feature",
                ],
            )

    return images.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


PHASH_SCHEMA = "media_id BIGINT, ahash BIGINT, dhash BIGINT"


def _nn_resize(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resample to exactly (h, w) — same sampling rule
    as resize_images, but to a fixed grid (hash inputs)."""
    H, W = img.shape
    yi = (np.arange(h) * (H / h)).astype(int)
    xi = (np.arange(w) * (W / w)).astype(int)
    return img[yi][:, xi]


def _pack_bits64(bits: np.ndarray) -> int:
    """Row-major bit vector -> signed int64 (two's complement — full 64
    bits usable; the banded hamming join handles negative longs)."""
    v = 0
    for b in bits.flat:
        v = (v << 1) | int(bool(b))
    return int(np.uint64(v).astype(np.int64))


def image_phashes(images: DataFrame, *, hash_size: int = 8) -> DataFrame:
    """(media_id, ahash, dhash) — perceptual fingerprints of the DECODED
    pixels, the image arm of the near-dup family:

    - ``ahash``: average hash — resample to hash_size², bit = pixel >
      mean.  Robust to uniform brightness/scale changes.
    - ``dhash``: difference hash — resample to (hash_size+1) x
      hash_size, bit = left-to-right gradient sign.  Robust to global
      level shifts, sensitive to structure.

    Both are 64-bit at the default size, so near-duplicate pairing is
    exactly the text SimHash machinery:
    ``dedup.hamming_fingerprint_pairs(image_phashes(imgs),
    id_col="media_id", fp_col="dhash", bits=64, bands=4)`` — banded
    equi-join, never all-pairs, pigeonhole-lossless at hamming <=
    bands-1.  Re-encoded/resized/brightness-shifted copies land within
    a few bits; unrelated images differ in ~32.

    ``hash_size`` is capped at 8: the fingerprints pack into signed
    int64 (hash_size² bits), and a 64-bit hash is what the banded
    hamming join's band extraction is specified over.
    """
    if hash_size < 1 or hash_size > 8:
        raise ValueError(
            f"hash_size must be in [1, 8] (got {hash_size}): "
            "hash_size**2 bits must fit a signed int64 fingerprint"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                img = _decode_image(
                    content, _meta_int(meta, "width"), _meta_int(meta, "height")
                )
                small_a = _nn_resize(img, hash_size, hash_size).astype(np.float64)
                ahash = _pack_bits64(small_a > small_a.mean())
                small_d = _nn_resize(img, hash_size + 1, hash_size).astype(np.int32)
                dhash = _pack_bits64(small_d[:, 1:] > small_d[:, :-1])
                out.append((int(mid), ahash, dhash))
            yield pd.DataFrame(out, columns=["media_id", "ahash", "dhash"])

    return images.mapInPandas(kernel, schema=PHASH_SCHEMA)


def resize_images(images: DataFrame, *, max_side: int = 64) -> DataFrame:
    """Downscale images whose longest side exceeds ``max_side``.

    Nearest-neighbor resample on the (stub-)decoded array, re-encoded as
    raw bytes with updated metadata — the classic normalize-before-
    training step.  Aspect ratio preserved, never upscales.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                img = _decode_image(content, _meta_int(meta, "width"), _meta_int(meta, "height"))
                h, w = img.shape
                scale = max_side / max(w, h)
                if scale < 1.0:
                    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                    yi = (np.arange(nh) * (h / nh)).astype(int)
                    xi = (np.arange(nw) * (w / nw)).astype(int)
                    img = img[yi][:, xi]
                    w, h = nw, nh
                rows.append(
                    (int(mid), img.tobytes(), {"format": "raw8", "width": w, "height": h})
                )
            yield pd.DataFrame(rows, columns=["media_id", "content", "meta"])

    return images.mapInPandas(kernel, schema=RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# AVI (RIFF) container: MJPEG + uncompressed-DIB video, pure stdlib/numpy
# ---------------------------------------------------------------------------
# Public spec: RIFF 'AVI ' -> LIST hdrl (avih + per-stream LIST strl of
# strh/strf) + LIST movi ('##dc' compressed / '##db' uncompressed frame
# chunks, word-aligned).  MJPEG frames are baseline JPEGs (decoded by
# operators/jpeg); uncompressed frames are bottom-up DIBs (8-bit
# palette or 24-bit BGR, rows padded to 4 bytes).

import struct as _struct

_MJPG = int.from_bytes(b"MJPG", "little")


def _riff_subchunks(buf: bytes, off: int, end: int):
    """Yield (fourcc, list_type_or_None, data_off, size) walking a RIFF
    chunk sequence; LIST chunks expose their type fourcc."""
    while off + 8 <= end:
        cc = buf[off : off + 4]
        (sz,) = _struct.unpack_from("<I", buf, off + 4)
        data = off + 8
        if data + sz > len(buf):
            break
        ltype = buf[data : data + 4] if cc in (b"LIST", b"RIFF") else None
        yield cc, ltype, data, sz
        off = data + sz + (sz & 1)


def _parse_avi(blob: bytes):
    """-> (video stream format dict, [(chunk_id, off, size), ...] movi
    frame chunks).  Only the FIRST 'vids' stream is decoded."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI payload")
    fmt: dict = {}
    frames: list[tuple[bytes, int, int]] = []

    def walk(off: int, end: int) -> None:
        for cc, ltype, data, sz in _riff_subchunks(blob, off, end):
            if cc == b"LIST" and ltype in (b"hdrl", b"strl"):
                walk(data + 4, data + sz)
            elif cc == b"LIST" and ltype == b"movi":
                for fcc, _lt, d, s in _riff_subchunks(blob, data + 4, data + sz):
                    if fcc[2:4] in (b"dc", b"db"):
                        frames.append((fcc, d, s))
            elif cc == b"strh" and sz >= 8 and blob[data : data + 4] == b"vids":
                fmt.setdefault("handler", blob[data + 4 : data + 8])
                if sz >= 28 and "rate" not in fmt:
                    scale, rate = _struct.unpack_from("<II", blob, data + 20)
                    fmt.update(scale=scale, rate=rate)
            elif cc == b"strf" and "biW" not in fmt and sz >= 40:
                (biSize, biW, biH, _planes, bits, comp) = _struct.unpack_from(
                    "<IiiHHI", blob, data
                )
                fmt.update(biW=biW, biH=biH, bits=bits, comp=comp)
                if bits == 8 and sz >= 40 + 256 * 4:
                    pal = np.frombuffer(blob, np.uint8, 256 * 4, data + 40).reshape(
                        256, 4
                    )
                    # RGBQUAD is B,G,R,reserved — BT.601 integer luma
                    # (each channel cast first: a python-int * uint8
                    # product would wrap under NumPy 2 weak promotion)
                    fmt["palette"] = (
                        299 * pal[:, 2].astype(np.int64)
                        + 587 * pal[:, 1].astype(np.int64)
                        + 114 * pal[:, 0].astype(np.int64)
                        + 500
                    ) // 1000

    walk(12, len(blob))
    if "biW" not in fmt:
        raise ValueError("AVI without a vids strf header")
    return fmt, frames


def _decode_dib_frame(data: bytes, fmt: dict) -> np.ndarray:
    """Bottom-up DIB pixel block -> gray uint8 (8-bit palette or 24-bit
    BGR; rows padded to 4 bytes; negative biHeight = top-down)."""
    w, h, bits = fmt["biW"], abs(fmt["biH"]), fmt["bits"]
    if bits == 8:
        stride = (w + 3) & ~3
        rows = np.frombuffer(data, np.uint8, stride * h).reshape(h, stride)[:, :w]
        pal = fmt.get("palette")
        gray = pal[rows].astype(np.uint8) if pal is not None else rows.copy()
    elif bits == 24:
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(data, np.uint8, stride * h).reshape(h, stride)[
            :, : w * 3
        ].reshape(h, w, 3)
        b, g, r = (rows[..., i].astype(np.int64) for i in range(3))
        gray = ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)
    else:
        raise NotImplementedError(f"DIB bit depth {bits}")
    return gray if fmt["biH"] < 0 else gray[::-1]


def _iter_avi_frames(blob: bytes):
    """Decode an AVI's video frames to gray uint8 arrays: MJPEG chunks
    through the baseline-JPEG decoder, uncompressed chunks as DIBs."""
    from beyond_vector_search_spark.operators.jpeg import decode_jpeg

    fmt, frames = _parse_avi(blob)
    for fcc, off, sz in frames:
        data = blob[off : off + sz]
        if fmt.get("comp") == _MJPG or data[:2] == b"\xff\xd8":
            yield decode_jpeg(data)
        elif fmt.get("comp", 0) == 0:
            yield _decode_dib_frame(data, fmt)
        else:
            raise NotImplementedError(
                f"AVI compression 0x{fmt.get('comp', 0):08x} (only MJPG / BI_RGB)"
            )


def _avi_chunk(fourcc: bytes, data: bytes) -> bytes:
    return fourcc + _struct.pack("<I", len(data)) + data + (b"\x00" * (len(data) & 1))


def _avi_list(ltype: bytes, payload: bytes) -> bytes:
    return _avi_chunk(b"LIST", ltype + payload)


def encode_avi_gray8(
    frames: list, *, mjpeg: bool = True, fps: int = 10, quant_step: int = 1
) -> bytes:
    """Minimal spec-correct AVI from gray uint8 frames — MJPEG (each
    frame a baseline JPEG from operators/jpeg, '00dc' chunks) or
    uncompressed 8-bit grayscale-palette DIB ('00db', bottom-up,
    4-byte row padding).  The independent fixture source for the AVI
    decode path (same role as the other encode_* twins)."""
    from beyond_vector_search_spark.operators.jpeg import encode_jpeg_gray8

    h, w = frames[0].shape
    if mjpeg:
        payloads = [encode_jpeg_gray8(f, quant_step=quant_step) for f in frames]
        comp, bits, pal = _MJPG, 24, b""
    else:
        stride = (w + 3) & ~3
        payloads = []
        for f in frames:
            rows = np.zeros((h, stride), np.uint8)
            rows[:, :w] = f
            payloads.append(rows[::-1].tobytes())  # bottom-up
        comp, bits = 0, 8
        pal = b"".join(bytes((i, i, i, 0)) for i in range(256))  # gray RGBQUADs
    strf = (
        _struct.pack("<IiiHHIIiiII", 40 + len(pal), w, h, 1, bits, comp,
                     len(payloads[0]), 0, 0, 256 if pal else 0, 0) + pal
    )
    strh = _struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG" if mjpeg else b"DIB ", 0, 0, 0, 0,
        1, fps, 0, len(frames), max(len(p) for p in payloads), 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    avih = _struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1,
        max(len(p) for p in payloads), w, h, 0, 0, 0, 0,
    )
    hdrl = _avi_list(
        b"hdrl",
        _avi_chunk(b"avih", avih)
        + _avi_list(b"strl", _avi_chunk(b"strh", strh) + _avi_chunk(b"strf", strf)),
    )
    cid = b"00dc" if mjpeg else b"00db"
    movi = _avi_list(b"movi", b"".join(_avi_chunk(cid, p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + _struct.pack("<I", len(body)) + body


# --------------------- MP4 / ISO BMFF container -----------------------------
#
# Public spec ISO/IEC 14496-12 (ISO base media file format): length-
# prefixed box tree — ftyp, then moov(mvhd, trak(tkhd, mdia(mdhd, hdlr,
# minf(stbl(stsd, stts, stsc, stsz, stco))))), samples in mdat.  The
# box walk, track metadata, and sample-table resolution are REAL;
# frame pixels decode only for motion-JPEG sample entries ('jpeg' —
# each sample is a self-contained JPEG stream through operators/jpeg).
# H.264/H.265-class codecs genuinely need ffmpeg: _iter_mp4_frames
# raises NotImplementedError for them and frame_sample falls back to
# the metadata-driven fake, while video_metadata still reports their
# REAL container facts (codec fourcc, dims, sample count, duration).


def _mp4_boxes(buf: bytes, off: int, end: int):
    """Yield (fourcc, payload_start, box_end) for each box in a range."""
    while off + 8 <= end:
        size = int.from_bytes(buf[off : off + 4], "big")
        btype = buf[off + 4 : off + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            size = int.from_bytes(buf[off + 8 : off + 16], "big")
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - off
        if size < hdr or off + size > end:
            break
        yield btype, off + hdr, off + size
        off += size


def _mp4_find(buf: bytes, off: int, end: int, path: list) -> tuple | None:
    for btype, s, e in _mp4_boxes(buf, off, end):
        if btype == path[0]:
            return (s, e) if len(path) == 1 else _mp4_find(buf, s, e, path[1:])
    return None


def _mp4_samples(buf: bytes, stbl_s: int, stbl_e: int) -> list:
    """Resolve the sample tables to [(file_offset, size)] — stsz sizes,
    stsc chunk mapping, stco/co64 chunk offsets."""
    sizes: list[int] = []
    stsc: list[tuple[int, int]] = []  # (first_chunk, samples_per_chunk)
    offsets: list[int] = []
    for btype, s, e in _mp4_boxes(buf, stbl_s, stbl_e):
        if btype == b"stsz":
            uniform = int.from_bytes(buf[s + 4 : s + 8], "big")
            count = int.from_bytes(buf[s + 8 : s + 12], "big")
            if uniform:
                sizes = [uniform] * count
            else:
                sizes = [
                    int.from_bytes(buf[s + 12 + 4 * i : s + 16 + 4 * i], "big")
                    for i in range(count)
                ]
        elif btype == b"stsc":
            n = int.from_bytes(buf[s + 4 : s + 8], "big")
            stsc = [
                (
                    int.from_bytes(buf[s + 8 + 12 * i : s + 12 + 12 * i], "big"),
                    int.from_bytes(buf[s + 12 + 12 * i : s + 16 + 12 * i], "big"),
                )
                for i in range(n)
            ]
        elif btype in (b"stco", b"co64"):
            n = int.from_bytes(buf[s + 4 : s + 8], "big")
            wlen = 4 if btype == b"stco" else 8
            offsets = [
                int.from_bytes(buf[s + 8 + wlen * i : s + 8 + wlen * (i + 1)], "big")
                for i in range(n)
            ]
    out = []
    si = 0
    for ci, chunk_off in enumerate(offsets, start=1):
        spc = 1
        for first, per in stsc:
            if first <= ci:
                spc = per
            else:
                break
        pos = chunk_off
        for _ in range(spc):
            if si >= len(sizes):
                break
            out.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    return out


def _parse_mp4(blob: bytes) -> dict:
    """-> {'brand', 'duration_s', 'tracks': [{'handler', 'codec',
    'width', 'height', 'n_samples', 'samples', 'timescale',
    'duration_s'}]} from the moov tree."""
    n = len(blob)
    if len(blob) < 12 or blob[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF / MP4 file")
    info: dict = {"brand": blob[8:12].decode("latin-1"), "tracks": [], "duration_s": 0.0}
    moov = _mp4_find(blob, 0, n, [b"moov"])
    if moov is None:
        raise ValueError("MP4 has no moov box")
    for btype, s, e in _mp4_boxes(blob, *moov):
        if btype == b"mvhd":
            ver = blob[s]
            if ver == 1:
                ts = int.from_bytes(blob[s + 20 : s + 24], "big")
                dur = int.from_bytes(blob[s + 24 : s + 32], "big")
            else:
                ts = int.from_bytes(blob[s + 12 : s + 16], "big")
                dur = int.from_bytes(blob[s + 16 : s + 20], "big")
            info["duration_s"] = dur / ts if ts else 0.0
        elif btype == b"trak":
            tr: dict = {"handler": "", "codec": "", "width": 0, "height": 0}
            tkhd = _mp4_find(blob, s, e, [b"tkhd"])
            if tkhd:
                ts0 = tkhd[0]
                base = ts0 + (88 if blob[ts0] == 1 else 76)
                tr["width"] = int.from_bytes(blob[base : base + 4], "big") >> 16
                tr["height"] = int.from_bytes(blob[base + 4 : base + 8], "big") >> 16
            mdia = _mp4_find(blob, s, e, [b"mdia"])
            if not mdia:
                continue
            hdlr = _mp4_find(blob, *mdia, [b"hdlr"])
            if hdlr:
                tr["handler"] = blob[hdlr[0] + 8 : hdlr[0] + 12].decode("latin-1")
            mdhd = _mp4_find(blob, *mdia, [b"mdhd"])
            if mdhd:
                ms = mdhd[0]
                if blob[ms] == 1:
                    mts = int.from_bytes(blob[ms + 20 : ms + 24], "big")
                    mdur = int.from_bytes(blob[ms + 24 : ms + 32], "big")
                else:
                    mts = int.from_bytes(blob[ms + 12 : ms + 16], "big")
                    mdur = int.from_bytes(blob[ms + 16 : ms + 20], "big")
                tr["timescale"] = mts
                tr["duration_s"] = mdur / mts if mts else 0.0
            stbl = _mp4_find(blob, *mdia, [b"minf", b"stbl"])
            if not stbl:
                continue
            stsd = _mp4_find(blob, *stbl, [b"stsd"])
            if stsd:
                entry = stsd[0] + 8  # ver/flags + entry_count
                tr["codec"] = blob[entry + 4 : entry + 8].decode("latin-1")
                if tr["handler"] == "vide" and not tr["width"]:
                    tr["width"] = int.from_bytes(blob[entry + 32 : entry + 34], "big")
                    tr["height"] = int.from_bytes(blob[entry + 34 : entry + 36], "big")
            tr["samples"] = _mp4_samples(blob, *stbl)
            tr["n_samples"] = len(tr["samples"])
            info["tracks"].append(tr)
    return info


def _iter_mp4_frames(blob: bytes):
    """Decode an MP4's video samples to gray uint8 arrays — motion-JPEG
    sample entries only ('jpeg': each sample is a full JPEG stream);
    AVC/HEVC-class codecs raise (they need ffmpeg)."""
    from beyond_vector_search_spark.operators.jpeg import decode_jpeg

    info = _parse_mp4(blob)
    vids = [t for t in info["tracks"] if t["handler"] == "vide"]
    if not vids:
        raise ValueError("MP4 has no video track")
    tr = vids[0]
    if tr["codec"] not in ("jpeg", "mjpa", "MJPG"):
        raise NotImplementedError(
            f"MP4 codec '{tr['codec']}' needs ffmpeg (only motion-JPEG decodes here)"
        )
    for off, sz in tr["samples"]:
        yield decode_jpeg(blob[off : off + sz])


def _mp4_box(t: bytes, payload: bytes) -> bytes:
    return _struct.pack(">I", len(payload) + 8) + t + payload


def _mp4_full(t: bytes, ver: int, flags: int, payload: bytes) -> bytes:
    return _mp4_box(t, bytes([ver]) + flags.to_bytes(3, "big") + payload)


_MP4_UNITY = (
    _struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
)


def encode_mp4_mjpeg_gray8(
    frames: list, *, fps: int = 10, quant_step: int = 1
) -> bytes:
    """Minimal spec-correct MP4 (isom) from gray uint8 frames as a
    motion-JPEG track: one sample per frame (baseline JPEGs in mdat),
    full sample tables (stts/stsc/stsz/stco).  The independent fixture
    source for the MP4 parse/decode path."""
    from beyond_vector_search_spark.operators.jpeg import encode_jpeg_gray8

    h, w = frames[0].shape
    samples = [encode_jpeg_gray8(f, quant_step=quant_step) for f in frames]
    n = len(samples)
    timescale = 1000
    dur = timescale * n // fps

    def moov_bytes(chunk_offset: int) -> bytes:
        mvhd = _mp4_full(
            b"mvhd", 0, 0,
            _struct.pack(">IIII", 0, 0, timescale, dur)
            + _struct.pack(">iH", 0x00010000, 0x0100)
            + b"\x00" * 10 + _MP4_UNITY + b"\x00" * 24
            + _struct.pack(">I", 2),
        )
        tkhd = _mp4_full(
            b"tkhd", 0, 7,
            _struct.pack(">IIIII", 0, 0, 1, 0, dur)
            + b"\x00" * 8 + _struct.pack(">hhhh", 0, 0, 0, 0) + _MP4_UNITY
            + _struct.pack(">II", w << 16, h << 16),
        )
        mdhd = _mp4_full(
            b"mdhd", 0, 0,
            _struct.pack(">IIII", 0, 0, timescale, dur)
            + _struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _mp4_full(
            b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video handler\x00"
        )
        entry = (
            b"\x00" * 6 + _struct.pack(">H", 1)
            + _struct.pack(">HH", 0, 0) + b"\x00" * 12
            + _struct.pack(">HH", w, h)
            + _struct.pack(">II", 0x00480000, 0x00480000)
            + _struct.pack(">I", 0) + _struct.pack(">H", 1)
            + b"\x00" * 32
            + _struct.pack(">Hh", 24, -1)
        )
        stsd = _mp4_full(
            b"stsd", 0, 0,
            _struct.pack(">I", 1) + _mp4_box(b"jpeg", entry),
        )
        stts = _mp4_full(
            b"stts", 0, 0, _struct.pack(">III", 1, n, timescale // fps)
        )
        stsc = _mp4_full(b"stsc", 0, 0, _struct.pack(">IIII", 1, 1, n, 1))
        stsz = _mp4_full(
            b"stsz", 0, 0,
            _struct.pack(">II", 0, n) + b"".join(_struct.pack(">I", len(s)) for s in samples),
        )
        stco = _mp4_full(b"stco", 0, 0, _struct.pack(">II", 1, chunk_offset))
        stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = _mp4_full(b"vmhd", 0, 1, _struct.pack(">HHHH", 0, 0, 0, 0))
        dref = _mp4_full(b"dref", 0, 0, _struct.pack(">I", 1) + _mp4_full(b"url ", 0, 1, b""))
        dinf = _mp4_box(b"dinf", dref)
        minf = _mp4_box(b"minf", vmhd + dinf + stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        trak = _mp4_box(b"trak", tkhd + mdia)
        return _mp4_box(b"moov", mvhd + trak)

    ftyp = _mp4_box(b"ftyp", b"isom" + _struct.pack(">I", 0x200) + b"isomiso2")
    # stco holds an absolute file offset; the moov's LENGTH is invariant
    # to that value, so measure with 0 and rebuild with the real one
    moov_len = len(moov_bytes(0))
    mdat_payload = b"".join(samples)
    chunk_offset = len(ftyp) + moov_len + 8
    return ftyp + moov_bytes(chunk_offset) + _mp4_box(b"mdat", mdat_payload)


def video_metadata(videos: DataFrame) -> DataFrame:
    """(media_id, container, codec, width, height, n_frames,
    duration_s) — REAL container facts for MP4/ISO-BMFF (box walk: any
    codec, including ones whose pixels need ffmpeg), AVI (RIFF walk),
    and GIF (screen descriptor + frame count); other payloads fall back
    to the metadata struct with container 'unknown'.  One narrow Arrow
    pass, no shuffle — the schema-first multimodal contract."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                blob = bytes(content)
                try:
                    if len(blob) >= 12 and blob[4:8] == b"ftyp":
                        info = _parse_mp4(blob)
                        vids = [t for t in info["tracks"] if t["handler"] == "vide"]
                        tr = vids[0] if vids else (info["tracks"][0] if info["tracks"] else {})
                        rows.append(
                            (int(mid), "mp4", tr.get("codec", ""), tr.get("width", 0),
                             tr.get("height", 0), tr.get("n_samples", 0),
                             float(info["duration_s"])))
                        continue
                    if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
                        fmt, frames = _parse_avi(blob)
                        comp = fmt.get("comp", 0)
                        codec = "MJPG" if comp == _MJPG else ("raw" if comp == 0 else f"0x{comp:08x}")
                        fps = (
                            fmt["rate"] / fmt["scale"]
                            if fmt.get("rate") and fmt.get("scale")
                            else 0.0
                        )
                        rows.append(
                            (int(mid), "avi", codec, fmt.get("biW", 0),
                             abs(fmt.get("biH", 0)),
                             len(frames), len(frames) / fps if fps else 0.0))
                        continue
                    if blob[:6] in (b"GIF87a", b"GIF89a"):
                        w = int.from_bytes(blob[6:8], "little")
                        h = int.from_bytes(blob[8:10], "little")
                        nf = sum(1 for _ in _iter_gif_frames(blob))
                        rows.append((int(mid), "gif", "gif-lzw", w, h, nf, 0.0))
                        continue
                except Exception:  # noqa: BLE001 — corrupt container: fall through
                    pass
                rows.append(
                    (int(mid), "unknown", "",
                     _meta_int(meta, "width"), _meta_int(meta, "height"),
                     _meta_int(meta, "n_frames"), 0.0))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "container", "codec", "width", "height",
                         "n_frames", "duration_s"],
            )

    return videos.mapInPandas(
        kernel,
        schema=(
            "media_id BIGINT, container STRING, codec STRING, width INT, "
            "height INT, n_frames INT, duration_s DOUBLE"
        ),
    )


def frame_sample(
    videos: DataFrame, *, every_n: int = 10
) -> DataFrame:
    """Sample every Nth frame of a 'video' into image rows — the
    explode-shaped multimodal op.

    REAL frame extraction for animated GIF payloads (frames compose
    onto the logical screen via :func:`_iter_gif_frames`), for AVI
    containers (:func:`_iter_avi_frames` — MJPEG chunks through the
    JPEG decoder, uncompressed 8/24-bit DIB chunks directly), and for
    MP4/ISO-BMFF with a motion-JPEG track (:func:`_iter_mp4_frames` —
    sample-table walk, one JPEG per sample); sampled snapshots
    re-encode as single-frame GIFs (decodable by every downstream
    kernel).  Other payloads — including MP4s whose codec needs ffmpeg
    (H.264/H.265) — byte-chunk by the ``n_frames`` metadata (the fake
    path).

    Input:  (media_id, content BINARY, meta STRUCT<format, n_frames INT,
             width INT, height INT>)
    Output: IMAGE_SCHEMA rows, one per sampled frame, media_id shifted
            to (video_id * 100000 + frame_no).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                if len(content) >= 12 and bytes(content[4:8]) == b"ftyp":
                    try:
                        mp4_frames = list(_iter_mp4_frames(bytes(content)))
                    except NotImplementedError:
                        mp4_frames = None  # ffmpeg-class codec: fake path below
                    if mp4_frames is not None:
                        for f, frame in enumerate(mp4_frames):
                            if f % every_n:
                                continue
                            rows.append(
                                (
                                    int(mid) * 100000 + f,
                                    bytearray(encode_gif_gray8(frame)),
                                    {
                                        "format": "gif",
                                        "width": frame.shape[1],
                                        "height": frame.shape[0],
                                    },
                                )
                            )
                        continue
                if bytes(content[:4]) == b"RIFF" and bytes(content[8:12]) == b"AVI ":
                    for f, frame in enumerate(_iter_avi_frames(bytes(content))):
                        if f % every_n:
                            continue
                        rows.append(
                            (
                                int(mid) * 100000 + f,
                                bytearray(encode_gif_gray8(frame)),
                                {
                                    "format": "gif",
                                    "width": frame.shape[1],
                                    "height": frame.shape[0],
                                },
                            )
                        )
                    continue
                if bytes(content[:6]) in (b"GIF87a", b"GIF89a"):
                    for f, frame in enumerate(_iter_gif_frames(bytes(content))):
                        if f % every_n:
                            continue
                        rows.append(
                            (
                                int(mid) * 100000 + f,
                                bytearray(encode_gif_gray8(frame)),
                                {
                                    "format": "gif",
                                    "width": frame.shape[1],
                                    "height": frame.shape[0],
                                },
                            )
                        )
                    continue
                n, w, h = _meta_int(meta, "n_frames"), _meta_int(meta, "width"), _meta_int(meta, "height")
                frame_bytes = max(1, len(content) // max(1, n))
                for f in range(0, n, every_n):
                    chunk = content[f * frame_bytes : (f + 1) * frame_bytes]
                    rows.append(
                        (
                            int(mid) * 100000 + f,
                            chunk,
                            {"format": "raw8", "width": w, "height": h},
                        )
                    )
            yield pd.DataFrame(rows, columns=["media_id", "content", "meta"])

    return videos.mapInPandas(kernel, schema=IMAGE_SCHEMA)


AUDIO_SCHEMA = (
    "media_id BIGINT, content BINARY, "
    "meta STRUCT<format: STRING, sample_rate: INT, n_samples: INT>"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id BIGINT, sample_rate INT, n_samples INT, duration_s DOUBLE, "
    "rms DOUBLE, zero_crossing_rate DOUBLE, peak INT, loudness ARRAY<DOUBLE>"
)


def encode_wav_pcm16(wave_arr: np.ndarray, sample_rate: int) -> bytes:
    """Encode a 1-D int16 array as a mono PCM WAV (stdlib ``wave`` — no
    codec needed)."""
    import io
    import wave as wavmod

    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.asarray(wave_arr, dtype="<i2").tobytes())
    return buf.getvalue()


def _ulaw_expand(code: np.ndarray) -> np.ndarray:
    """G.711 mu-law byte -> linear 14-bit-range sample (vectorized; the
    exact segment/mantissa expansion, bit-identical to audioop)."""
    u = (~code.astype(np.int64)) & 0xFF
    sign, exp, mant = u & 0x80, (u >> 4) & 0x07, u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign != 0, -mag, mag)


def _alaw_expand(code: np.ndarray) -> np.ndarray:
    """G.711 A-law byte -> linear sample (vectorized, even-bit toggle +
    segment expansion, bit-identical to audioop)."""
    a = code.astype(np.int64) ^ 0x55
    sign, exp, mant = a & 0x80, (a >> 4) & 0x07, a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    # A-law's sign convention is inverted vs mu-law: set bit = positive
    return np.where(sign != 0, mag, -mag)


def _parse_wav_chunks(content: bytes) -> tuple[tuple[int, int, int, int], bytes]:
    """Minimal RIFF walk: returns ((format_code, channels, sample_rate,
    bits_per_sample), data payload).  Exists because stdlib ``wave``
    refuses everything but integer PCM — the G.711 payloads route
    through here."""
    import struct

    fmt = data = None
    pos = 12
    while pos + 8 <= len(content):
        cid, ln = struct.unpack_from("<4sI", content, pos)
        body = content[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            code, nch, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            fmt = (code, nch, sr, bits)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return fmt, data


def _decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """REAL decode of WAV: integer PCM via stdlib ``wave`` (16-bit, any
    channel count averaged to mono with integer mean; unsigned 8-bit
    recentred to signed) plus G.711 mu-law/A-law (format codes 7/6) via
    the numpy segment expansions above.  Returns (samples, header
    sample rate)."""
    import io
    import wave as wavmod

    (code, nch, sr, _bits), data = _parse_wav_chunks(bytes(content))
    if code in (6, 7):
        raw = np.frombuffer(data, dtype=np.uint8)
        wave_arr = (_alaw_expand if code == 6 else _ulaw_expand)(raw)
        if nch > 1:
            wave_arr = (
                wave_arr[: (wave_arr.size // nch) * nch].reshape(-1, nch).sum(axis=1) // nch
            )
        return wave_arr.astype(np.int64), sr

    with wavmod.open(io.BytesIO(bytes(content)), "rb") as f:
        nch, sw, sr, nframes = (
            f.getnchannels(), f.getsampwidth(), f.getframerate(), f.getnframes(),
        )
        frames = f.readframes(nframes)
    if sw == 2:
        wave_arr = np.frombuffer(frames, dtype="<i2").astype(np.int64)
    elif sw == 1:
        wave_arr = np.frombuffer(frames, dtype=np.uint8).astype(np.int64) - 128
    else:
        raise NotImplementedError(f"WAV decode supports 8/16-bit PCM, got sampwidth={sw}")
    if nch > 1:
        wave_arr = wave_arr[: (wave_arr.size // nch) * nch].reshape(-1, nch).sum(axis=1) // nch
    return wave_arr, sr


def _fake_audio(content: bytes, n_samples: int) -> np.ndarray:
    usable = len(content) - (len(content) % 2)
    buf = (
        np.frombuffer(content[:usable], dtype="<i2")
        if usable
        else np.zeros(1, dtype="<i2")
    )
    reps = int(np.ceil(n_samples / buf.size))
    return np.tile(buf, reps)[:n_samples].astype(np.int64)


def _decode_audio(content: bytes, n_samples: int) -> tuple[np.ndarray, int | None]:
    """Decode dispatcher: REAL stdlib decode for PCM WAV (RIFF/WAVE
    magic); deterministic fake for everything else.  Returns
    (samples, header sample rate) — rate is None on the fake path
    (caller falls back to metadata).

    A payload with the WAV magic that fails the real decode (24-bit or
    float PCM, truncated/corrupt headers) falls back to the fake when
    metadata carries n_samples — one undecodable file must not fail a
    100 TB job — and re-raises only when no fallback is possible.

    Compressed formats would be ``librosa.load(BytesIO(content))`` /
    ``soundfile.read`` — not in this container, so the fallback derives
    a deterministic int16 waveform from the payload bytes
    (little-endian pairs, tiled to n_samples).  Keeps every downstream
    shape/statistic real.
    """
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        try:
            return _decode_wav(bytes(content))
        except Exception:  # noqa: BLE001 — variant/corrupt: fall back if we can
            if n_samples > 0:
                return _fake_audio(content, n_samples), None
            raise
    if n_samples <= 0:
        raise NotImplementedError(
            "real decode of non-WAV formats requires librosa/soundfile (not "
            "in this container); metadata must carry n_samples for the fake"
        )
    return _fake_audio(content, n_samples), None


# ------------------ audio container/header parsing --------------------------
#
# Real HEADER parsing for the codec-bound audio formats (the audio twin
# of video_metadata): MPEG audio frame headers (public spec ISO/IEC
# 11172-3 / 13818-3 — sync walk, bitrate/samplerate tables, frame
# counting, ID3v2 skip) and FLAC STREAMINFO (public spec RFC 9639).
# Waveform decode for these stays librosa territory (deterministic
# fake); the container facts — codec, rate, channels, duration — are
# real, which is what pipeline filtering/routing actually needs.

_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}
_MP3_BR = {  # kbps rows indexed 1..14; (version_group, layer)
    ("v1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("v1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("v1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("v2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("v2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("v2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}


def _parse_mp3(blob: bytes) -> dict:
    """Walk MPEG audio frames: -> {'codec', 'sample_rate', 'channels',
    'n_frames', 'n_samples', 'duration_s', 'bitrate_kbps' (of the first
    frame)}.  Skips a leading ID3v2 tag (syncsafe size)."""
    pos = 0
    if blob[:3] == b"ID3" and len(blob) >= 10:
        size = 0
        for b in blob[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    n_frames = 0
    n_samples = 0
    dur = 0.0
    first: dict = {}
    while pos + 4 <= len(blob):
        h = int.from_bytes(blob[pos : pos + 4], "big")
        if (h >> 21) != 0x7FF:
            break
        ver_bits = (h >> 19) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer_bits = (h >> 17) & 0x3  # 3=L1, 2=L2, 1=L3
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        mode = (h >> 6) & 0x3
        if ver_bits == 1 or layer_bits == 0 or br_idx in (0, 15) or sr_idx == 3:
            break  # reserved / free-format: stop the walk
        layer = 4 - layer_bits
        group = "v1" if ver_bits == 3 else "v2"
        kbps = _MP3_BR[(group, layer)][br_idx - 1]
        rate = _MP3_RATES[ver_bits][sr_idx]
        if layer == 1:
            spf = 384
            flen = (12 * kbps * 1000 // rate + padding) * 4
        else:
            spf = 1152 if (layer == 2 or ver_bits == 3) else 576
            coef = 144 if (layer == 2 or ver_bits == 3) else 72
            flen = coef * kbps * 1000 // rate + padding
        if flen <= 4 or pos + flen > len(blob):
            break
        if not first:
            version = {3: "1", 2: "2", 0: "2.5"}[ver_bits]
            first = {
                "codec": f"mpeg{version}-layer{layer}",
                "sample_rate": rate,
                "channels": 1 if mode == 3 else 2,
                "bitrate_kbps": kbps,
            }
        n_frames += 1
        n_samples += spf
        dur += spf / rate
        pos += flen
    if not n_frames:
        raise ValueError("no MPEG audio frames found")
    first.update(n_frames=n_frames, n_samples=n_samples, duration_s=dur)
    return first


def _parse_flac(blob: bytes) -> dict:
    """FLAC STREAMINFO (first metadata block, 34 bytes): -> {'codec',
    'sample_rate', 'channels', 'bits', 'n_samples', 'duration_s'}."""
    if blob[:4] != b"fLaC" or len(blob) < 4 + 4 + 34:
        raise ValueError("not a FLAC stream")
    btype = blob[4] & 0x7F
    if btype != 0:
        raise ValueError("first FLAC metadata block is not STREAMINFO")
    s = 8
    packed = int.from_bytes(blob[s + 10 : s + 18], "big")  # 64 bits
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    return {
        "codec": "flac",
        "sample_rate": int(rate),
        "channels": int(channels),
        "bits": int(bits),
        "n_samples": int(total),
        "duration_s": total / rate if rate else 0.0,
    }


_WAV_FORMAT_NAMES = {1: "pcm", 3: "ieee-float", 6: "g711-alaw", 7: "g711-ulaw"}


def audio_metadata(audios: DataFrame) -> DataFrame:
    """(media_id, container, codec, sample_rate, channels, bits,
    n_samples, duration_s) — REAL header facts for WAV (RIFF fmt/data
    chunks, all format codes), MP3/MPEG audio (frame-header walk,
    ID3v2-aware), and FLAC (STREAMINFO); other payloads fall back to
    the metadata struct with container 'unknown'.  The audio twin of
    :func:`video_metadata`: one narrow Arrow pass, no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                blob = bytes(content)
                try:
                    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
                        (fmt_code, ch, rate, bits), data = _parse_wav_chunks(blob)
                        frame = max(1, ch * max(bits // 8, 1))
                        ns = len(data) // frame
                        rows.append(
                            (int(mid), "wav",
                             _WAV_FORMAT_NAMES.get(fmt_code, f"fmt-{fmt_code}"),
                             rate, ch, bits, ns, ns / rate if rate else 0.0))
                        continue
                    if blob[:4] == b"fLaC":
                        f = _parse_flac(blob)
                        rows.append(
                            (int(mid), "flac", f["codec"], f["sample_rate"],
                             f["channels"], f["bits"], f["n_samples"],
                             float(f["duration_s"])))
                        continue
                    if blob[:3] == b"ID3" or (
                        len(blob) >= 2 and blob[0] == 0xFF and (blob[1] & 0xE0) == 0xE0
                    ):
                        m = _parse_mp3(blob)
                        rows.append(
                            (int(mid), "mp3", m["codec"], m["sample_rate"],
                             m["channels"], 0, m["n_samples"], float(m["duration_s"])))
                        continue
                except Exception:  # noqa: BLE001 — corrupt header: fall through
                    pass
                rate = _meta_int(meta, "sample_rate")
                ns = _meta_int(meta, "n_samples")
                rows.append(
                    (int(mid), "unknown", "", rate, 0, 0, ns,
                     ns / rate if rate else 0.0))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "container", "codec", "sample_rate",
                         "channels", "bits", "n_samples", "duration_s"],
            )

    return audios.mapInPandas(
        kernel,
        schema=(
            "media_id BIGINT, container STRING, codec STRING, sample_rate INT, "
            "channels INT, bits INT, n_samples INT, duration_s DOUBLE"
        ),
    )


def audio_features(audios: DataFrame, *, n_windows: int = 8) -> DataFrame:
    """Decode + per-clip acoustic statistics in Arrow batches: duration,
    RMS, zero-crossing rate, peak, and an ``n_windows``-bucket loudness
    (windowed RMS) contour — the audio analogue of image_features, same
    mapInPandas batching, numpy-vectorized per clip.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                wave, hdr_sr = _decode_audio(content, _meta_int(meta, "n_samples"))
                # header rate is authoritative for real WAV; metadata
                # serves the fake path (0/None-safe: duration 0.0)
                sr = hdr_sr if hdr_sr else _meta_int(meta, "sample_rate")
                n = int(wave.size)  # decoded length is authoritative (WAV carries its own)
                signs = np.sign(wave)
                nz = signs != 0
                zc = (
                    float(np.mean(np.abs(np.diff(signs[nz])) > 0))
                    if nz.sum() > 1
                    else 0.0
                )
                bounds = np.linspace(0, wave.size, n_windows + 1).astype(int)
                loud = [
                    float(np.sqrt(np.mean(np.square(wave[a:b], dtype=np.float64))))
                    if b > a
                    else 0.0
                    for a, b in zip(bounds[:-1], bounds[1:])
                ]
                out.append(
                    (
                        int(mid), sr, n, (n / sr) if sr > 0 else 0.0,
                        float(np.sqrt(np.mean(np.square(wave, dtype=np.float64)))),
                        zc,
                        int(np.abs(wave).max()),
                        loud,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_s",
                    "rms", "zero_crossing_rate", "peak", "loudness",
                ],
            )

    return audios.mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


AUDIO_SPECTRUM_SCHEMA = (
    "media_id BIGINT, sample_rate INT, spectral_centroid_hz DOUBLE, "
    "dominant_hz DOUBLE, band_energy ARRAY<DOUBLE>"
)


def audio_spectrum(audios: DataFrame, *, n_bands: int = 8) -> DataFrame:
    """Real frequency-domain features per clip (numpy rFFT — no codec or
    DSP library): spectral centroid, dominant frequency, and an
    ``n_bands``-band energy distribution over [0, Nyquist] — the signal
    half of audio quality filtering (speech/music/noise triage) in a
    curation pipeline.

    Magnitudes exclude the DC term (a constant offset is level, not
    pitch).  ``band_energy`` sums |X|^2 into equal-width bands and
    normalizes to fractions (sums to 1 for any non-silent clip);
    silence returns centroid/dominant 0.0 and zero bands.  Same
    mapInPandas batching as audio_features; the FFT is O(n log n)
    C-speed per clip, rows stay independent.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                wave, hdr_sr = _decode_audio(content, _meta_int(meta, "n_samples"))
                sr = hdr_sr if hdr_sr else _meta_int(meta, "sample_rate")
                mag = np.abs(np.fft.rfft(wave.astype(np.float64)))
                freqs = (
                    np.fft.rfftfreq(wave.size, 1.0 / sr) if sr > 0 else np.zeros_like(mag)
                )
                mag[0] = 0.0  # drop DC
                power = mag * mag
                total = float(power.sum())
                if total > 0.0 and sr > 0:
                    centroid = float((freqs * power).sum() / total)
                    dominant = float(freqs[int(np.argmax(power))])
                    edges = np.linspace(0.0, sr / 2.0, n_bands + 1)
                    which = np.clip(
                        np.searchsorted(edges, freqs, side="right") - 1, 0, n_bands - 1
                    )
                    bands = np.zeros(n_bands)
                    np.add.at(bands, which, power)
                    bands = (bands / total).tolist()
                else:
                    centroid, dominant, bands = 0.0, 0.0, [0.0] * n_bands
                out.append((int(mid), sr, centroid, dominant, bands))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "spectral_centroid_hz",
                    "dominant_hz", "band_energy",
                ],
            )

    return audios.mapInPandas(kernel, schema=AUDIO_SPECTRUM_SCHEMA)


def synthetic_audio(spark, n: int = 32, *, seed: int = 11, sample_rate: int = 8000) -> DataFrame:
    """Deterministic fake audio table for tests/demos (no codec needed)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.to_binary(
                F.repeat(F.md5(F.concat(F.lit(seed), F.col("id"))), 16), F.lit("hex")
            ).alias("content"),
            F.struct(
                F.lit("fake-pcm16").alias("format"),
                F.lit(sample_rate).cast("int").alias("sample_rate"),
                ((F.col("id") % 4 + 1) * sample_rate).cast("int").alias("n_samples"),
            ).alias("meta"),
        )
    )


def synthetic_media(spark, n: int = 32, *, seed: int = 7) -> DataFrame:
    """Deterministic fake image table for tests/demos (no codec needed).

    Bytes derive from md5-seeded per-row expressions JVM-side, so the
    table is reproducible without shipping binaries.
    """
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.to_binary(
                F.repeat(F.md5(F.concat(F.lit(seed), F.col("id"))), 8), F.lit("hex")
            ).alias("content"),
            F.struct(
                F.lit("fake").alias("format"),
                (F.col("id") % 7 * 16 + 16).cast("int").alias("width"),
                (F.col("id") % 5 * 16 + 16).cast("int").alias("height"),
            ).alias("meta"),
        )
    )
