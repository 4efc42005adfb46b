"""Baseline JPEG codec in pure numpy + stdlib — no PIL/libjpeg.

Decoder: baseline sequential DCT JFIF (SOF0) — marker walk, 8-bit
quantization tables, Huffman entropy decode with byte-unstuffing and
restart markers, dequantize -> inverse zigzag -> orthonormal IDCT.
The LUMA channel is reconstructed as the grayscale output (luma IS the
standards-grade gray reduction); chroma blocks are entropy-decoded to
keep the bit stream in sync but not reconstructed, which makes any
sampling layout (4:4:4 / 4:2:2 / 4:2:0) decodable without an
upsampling stage.  Progressive (SOF2) and arithmetic coding raise
NotImplementedError — the multimodal dispatcher falls back to its
deterministic fake when metadata allows.

Encoder: grayscale baseline JFIF with the codec's shared Huffman
tables and a flat-or-scaled quantization table — exists so roundtrip
tests exercise the decoder against an independently-produced stream
(the container has no other JPEG writer).  JPEG is lossy by
construction; at quantization step 1 the only loss is DCT rounding,
so tests pin a tight absolute error bound (and exact equality for
DC-only images).

The Huffman tables are ITU T.81 Annex K's typical luminance tables;
correctness of the ROUNDTRIP does not depend on them being the
standard ones (encoder and decoder share the definitions), and their
shape is validated at import (code counts vs value counts).
"""

from __future__ import annotations

import struct

import numpy as np

# --- ITU T.81 Annex K typical tables ---------------------------------------

# DC luminance: category (0..11) code lengths
_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_VALS = tuple(range(12))

# AC luminance: (run, size) symbols
_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_AC_VALS = tuple(
    int(h, 16)
    for h in (
        "01 02 03 00 04 11 05 12 21 31 41 06 13 51 61 07 22 71 14 32 81 91 a1 08 "
        "23 42 b1 c1 15 52 d1 f0 24 33 62 72 82 09 0a 16 17 18 19 1a 25 26 27 28 "
        "29 2a 34 35 36 37 38 39 3a 43 44 45 46 47 48 49 4a 53 54 55 56 57 58 59 "
        "5a 63 64 65 66 67 68 69 6a 73 74 75 76 77 78 79 7a 83 84 85 86 87 88 89 "
        "8a 92 93 94 95 96 97 98 99 9a a2 a3 a4 a5 a6 a7 a8 a9 aa b2 b3 b4 b5 b6 "
        "b7 b8 b9 ba c2 c3 c4 c5 c6 c7 c8 c9 ca d2 d3 d4 d5 d6 d7 d8 d9 da e1 e2 "
        "e3 e4 e5 e6 e7 e8 e9 ea f1 f2 f3 f4 f5 f6 f7 f8 f9 fa"
    ).split()
)

for _bits, _vals in ((_DC_BITS, _DC_VALS), (_AC_BITS, _AC_VALS)):
    if sum(_bits) != len(_vals):  # pragma: no cover — import-time guard
        raise AssertionError("JPEG Huffman table shape mismatch")


def _zigzag_order() -> np.ndarray:
    """The 8x8 zigzag scan as (row, col) pairs — generated, not
    hardcoded (one fewer transcription to get wrong)."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        order.extend(diag if s % 2 else diag[::-1])
    return np.array(order)


_ZZ = _zigzag_order()
_ZZ_FLAT = _ZZ[:, 0] * 8 + _ZZ[:, 1]

# Orthonormal DCT-II matrix: forward F = C @ B @ C.T, inverse B = C.T @ F @ C
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _build_codes(bits, vals):
    """(symbol -> (code, length)) per T.81 C.2: codes assigned in value
    order, lengths ascending."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_ENC = _build_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _build_codes(_AC_BITS, _AC_VALS)


# ------------------------------- encoder -----------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg_gray8(
    img: np.ndarray, *, quant_step: int = 1, restart_interval: int = 0
) -> bytes:
    """Encode a 2-D uint8 array as a baseline grayscale JFIF.

    ``quant_step`` fills the whole quantization table (1 = near-lossless,
    DCT rounding only; larger = coarser).  Edge-replicated padding to
    8x8 blocks, standard DC-diff + AC run-length Huffman coding.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's resynchronization path).
    """
    h, w = img.shape
    q = np.full((8, 8), int(quant_step), dtype=np.int32)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")

    bw = _BitWriter()
    prev_dc = 0
    mcu_index = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + ((mcu_index // restart_interval - 1) % 8)])
                prev_dc = 0
            mcu_index += 1
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coeffs = _C @ block @ _C.T
            quant = np.round(coeffs / q).astype(np.int64)
            zz = quant.reshape(-1)[_ZZ_FLAT]
            # DC
            diff = int(zz[0] - prev_dc)
            prev_dc = int(zz[0])
            t = _category(diff)
            code, ln = _DC_ENC[t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            # AC
            run = 0
            last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
            for i in range(1, last_nz + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _AC_ENC[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                t = _category(v)
                code, ln = _AC_ENC[(run << 4) | t]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << t) - 1, t)
                run = 0
            if last_nz < 63:
                code, ln = _AC_ENC[0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(tc_th: int, bits, vals) -> bytes:
        return bytes([tc_th]) + bytes(bits) + bytes(vals)

    dqt = bytes([0]) + bytes(int(q.reshape(-1)[i]) for i in _ZZ_FLAT)
    sof0 = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00]) + bytes([0, 63, 0])
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8"  # SOI
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xFFDB, dqt)
        + seg(0xFFC0, sof0)
        + seg(0xFFC4, dht(0x00, _DC_BITS, _DC_VALS))
        + seg(0xFFC4, dht(0x10, _AC_BITS, _AC_VALS))
        + dri
        + seg(0xFFDA, sos)
        + bytes(bw.out)
        + b"\xff\xd9"  # EOI
    )


# ------------------------------- decoder -----------------------------------


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers
    (restart markers are consumed by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"marker 0xff{nxt:02x} inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def bit(self) -> int:
        return self.bits(1)

    def sync_to_restart(self) -> None:
        """Drop partial bits and consume the RSTn marker."""
        self.acc = self.nbits = 0
        while self.data[self.pos] != 0xFF or not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _build_decode_table(bits, vals):
    """((length, code) -> symbol) walk table."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_huffman(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 luma plane (see module docstring)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    comps = None  # [(cid, h, v, tq)]
    h = w = 0
    while True:
        if content[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("JPEG has no scan")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", content, pos)
        body = content[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq:
                    raise NotImplementedError("16-bit quantization tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZZ_FLAT] = np.frombuffer(body[i : i + 64], np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = tuple(body[i + 1 : i + 17])
                n = sum(bits)
                vals = tuple(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = [
                (body[6 + 3 * i], body[7 + 3 * i] >> 4, body[7 + 3 * i] & 0x0F, body[8 + 3 * i])
                for i in range(nc)
            ]
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG (SOF marker 0xff{marker:02x})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F) for i in range(ns)]
            return _decode_scan(
                content, pos, h, w, comps, scan, qtables, htables, restart_interval
            )
        # else: APPn/COM — skipped


def _decode_scan(data, pos, h, w, comps, scan, qtables, htables, restart_interval):
    if comps is None:
        raise ValueError("SOS before SOF")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    by_id = {c[0]: c for c in comps}
    if len(scan) == 1:
        # T.81 A.2: a NON-INTERLEAVED scan's MCU is one data unit — the
        # frame sampling factors size the component, they do not build
        # ch x cv MCU clusters.  (A grayscale JPEG declaring 2x2
        # factors decodes block-by-block here; treating it as
        # interleaved would read 4 blocks per MCU and desync the
        # entropy stream.)
        cid, td, ta = scan[0]
        _, ch, cv, ctq = by_id[cid]
        cw = -(-(w * ch) // hmax)
        chh = -(-(h * cv) // vmax)
        bx, by = -(-cw // 8), -(-chh // 8)
        out = np.zeros((by * 8, bx * 8))
        br = _BitReader(data, pos)
        prev_dc = {cid: 0}
        for idx in range(by * bx):
            if restart_interval and idx and idx % restart_interval == 0:
                br.sync_to_restart()
                prev_dc = {cid: 0}
            yb, xb = divmod(idx, bx)
            block = _decode_block(br, htables[(0, td)], htables[(1, ta)], prev_dc, cid)
            px = (_C.T @ (block * qtables[ctq]) @ _C) + 128.0
            out[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8] = px
        return np.clip(np.round(out[:chh, :cw]), 0, 255).astype(np.uint8)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # luma = the first scan component's frame entry
    luma_id = scan[0][0]
    _, lh, lv, ltq = by_id[luma_id]
    luma = np.zeros((mcuy * lv * 8, mcux * lh * 8))

    br = _BitReader(data, pos)
    prev_dc = {cid: 0 for cid, _, _ in scan}
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                br.sync_to_restart()
                prev_dc = {cid: 0 for cid, _, _ in scan}
            try:
                for cid, td, ta in scan:
                    _, ch, cv, ctq = by_id[cid]
                    for v in range(cv):
                        for u in range(ch):
                            block = _decode_block(
                                br, htables[(0, td)], htables[(1, ta)], prev_dc, cid
                            )
                            if cid == luma_id:
                                px = (
                                    _C.T @ (block * qtables[ctq]) @ _C
                                ) + 128.0
                                y0 = (my * cv + v) * 8
                                x0 = (mx * ch + u) * 8
                                luma[y0 : y0 + 8, x0 : x0 + 8] = px
            except _RestartMarker:
                # tolerated only exactly at a restart boundary handled above
                raise ValueError("unexpected restart marker mid-MCU") from None
            mcu_index += 1
    return np.clip(np.round(luma[:h, :w]), 0, 255).astype(np.uint8)


def _decode_block(br, dc_table, ac_table, prev_dc, cid) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    t = _read_huffman(br, dc_table)
    diff = _extend(br.bits(t), t) if t else 0
    prev_dc[cid] += diff
    zz[0] = prev_dc[cid]
    i = 1
    while i < 64:
        sym = _read_huffman(br, ac_table)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        i += run
        if i > 63 or size == 0:
            raise ValueError("corrupt AC coefficient stream")
        zz[i] = _extend(br.bits(size), size)
        i += 1
    block = np.zeros(64, dtype=np.float64)
    block[_ZZ_FLAT] = zz
    return block.reshape(8, 8)
