"""Baseline JPEG codec in pure numpy + stdlib — no PIL/libjpeg.

Decoder: sequential baseline (SOF0/1) AND progressive (SOF2, T.81
Annex G: spectral selection + successive approximation with EOB runs
and AC refinement correction bits) — marker walk, 8-bit quantization
tables, Huffman entropy decode with byte-unstuffing and restart
markers, dequantize -> inverse zigzag -> orthonormal IDCT.  The LUMA
channel is reconstructed as the grayscale output (luma IS the
standards-grade gray reduction); chroma blocks are entropy-decoded
(sequential / interleaved-DC scans) or marker-skipped (progressive
single-component chroma scans are self-contained entropy segments) to
keep the stream in sync but not reconstructed, which makes any
sampling layout (4:4:4 / 4:2:2 / 4:2:0) decodable without an
upsampling stage.  Hierarchical/lossless SOFs and arithmetic coding
raise NotImplementedError — the multimodal dispatcher falls back to
its deterministic fake when metadata allows.

Encoders: grayscale baseline JFIF and grayscale PROGRESSIVE JFIF (DC
then two AC bands, each approximated at Al=1 and refined at Al=0)
with the codec's shared Huffman tables and a flat-or-scaled
quantization table — they exist so roundtrip tests exercise both
decoders against independently-produced streams (the container has no
other JPEG writer).  JPEG is lossy by construction; at quantization
step 1 the only loss is DCT rounding, so tests pin a tight absolute
error bound (and exact equality for DC-only images).

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
    prog: _ProgressiveState | None = None
    while True:
        if pos + 1 >= len(content):
            raise ValueError("truncated JPEG (no EOI)")
        if content[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if prog is not None and prog.any_scans:
                return prog.reconstruct(qtables)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential) / SOF2 (progressive)
            progressive = marker == 0xC2
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = [
                (body[6 + 3 * i], body[7 + 3 * i] >> 4, body[7 + 3 * i] & 0x0F, body[8 + 3 * i])
                for i in range(nc)
            ]
            if progressive:
                prog = _ProgressiveState(h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"unsupported JPEG (SOF marker 0xff{marker:02x})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F) for i in range(ns)]
            if prog is None:
                return _decode_scan(
                    content, pos, h, w, comps, scan, qtables, htables, restart_interval
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            pos = prog.decode_scan(
                content, pos, scan, ss, se, ah, al, htables, restart_interval
            )
        # else: APPn/COM/DNL — skipped


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


# -------------------------- progressive (SOF2) ------------------------------


def _skip_entropy(data: bytes, pos: int) -> int:
    """Position of the next REAL marker at/after ``pos``: skips entropy
    bytes, stuffed 0xFF00 pairs, fill 0xFFs, and restart markers."""
    n = len(data)
    while pos < n - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00:
            pos += 2  # stuffed
        elif nxt == 0xFF:
            pos += 1  # fill byte
        elif 0xD0 <= nxt <= 0xD7:
            pos += 2  # restart marker inside the scan
        else:
            return pos
    raise ValueError("unterminated entropy segment")


class _ProgressiveState:
    """Per-image coefficient accumulator for progressive JPEG (T.81
    Annex G: spectral selection + successive approximation).

    LUMA coefficients are accumulated across scans (zigzag order, one
    row per block); other components' scans keep the bit stream in sync
    — interleaved DC scans are entropy-decoded (their bits interleave
    with luma's), while single-component chroma AC scans are skipped by
    marker scan (each scan is a self-contained entropy segment, so
    skipping loses nothing the luma plane needs).  Mirrors the baseline
    decoder's luma-only contract.
    """

    def __init__(self, h: int, w: int, comps):
        self.h, self.w = h, w
        self.comps = comps  # [(cid, ch, cv, tq)]
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.by_id = {c[0]: c for c in comps}
        self.luma_id = comps[0][0]
        _, lh, lv, ltq = self.by_id[self.luma_id]
        self.luma_tq = ltq
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        # grid padded to the INTERLEAVED size (covers the non-interleaved
        # ceil-size, which is never larger)
        self.gby = self.mcuy * lv
        self.gbx = self.mcux * lh
        self.coef = np.zeros((self.gby, self.gbx, 64), dtype=np.int64)
        # non-interleaved luma block counts (T.81 A.2: ceil of the
        # component's own sample size, NOT the MCU-padded grid)
        cw = -(-(w * lh) // self.hmax)
        chh = -(-(h * lv) // self.vmax)
        self.nbx = -(-cw // 8)
        self.nby = -(-chh // 8)
        self.any_scans = False

    # -- scan dispatch --

    def decode_scan(
        self, data, pos, scan, ss, se, ah, al, htables, restart_interval
    ) -> int:
        self.any_scans = True
        luma_in_scan = any(cid == self.luma_id for cid, _, _ in scan)
        if ss == 0:  # DC scan (interleaved or not; refinement or first)
            end = self._decode_dc_scan(data, pos, scan, ah, al, htables, restart_interval)
        elif not luma_in_scan:
            # chroma-only AC scan: self-contained entropy segment -> skip
            end = pos
        else:
            if len(scan) != 1:
                raise ValueError("progressive AC scan must be non-interleaved")
            cid, _td, ta = scan[0]
            if ah == 0:
                end = self._decode_ac_first(
                    data, pos, htables[(1, ta)], ss, se, al, restart_interval
                )
            else:
                end = self._decode_ac_refine(
                    data, pos, htables[(1, ta)], ss, se, al, restart_interval
                )
        return _skip_entropy(data, end)

    # -- DC scans --

    def _dc_blocks(self, scan):
        """Yield (cid, store, yb, xb, restart_unit_index) in scan order."""
        if len(scan) > 1:  # interleaved: MCU traversal over all comps
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    unit = my * self.mcux + mx
                    for cid, _td, _ta in scan:
                        _, ch, cv, _tq = self.by_id[cid]
                        for v in range(cv):
                            for u in range(ch):
                                yield cid, cid == self.luma_id, my * cv + v, mx * ch + u, unit
        else:
            cid = scan[0][0]
            store = cid == self.luma_id
            _, ch, cv, _tq = self.by_id[cid]
            cw = -(-(self.w * ch) // self.hmax)
            chh = -(-(self.h * cv) // self.vmax)
            nbx, nby = -(-cw // 8), -(-chh // 8)
            for i in range(nby * nbx):
                yield cid, store, i // nbx, i % nbx, i

    def _decode_dc_scan(self, data, pos, scan, ah, al, htables, ri) -> int:
        br = _BitReader(data, pos)
        pred = {cid: 0 for cid, _, _ in scan}
        dc_tbl = {cid: htables[(0, td)] for cid, td, _ta in scan}
        last_unit = -1
        for cid, store, yb, xb, unit in self._dc_blocks(scan):
            if ri and unit != last_unit and unit and unit % ri == 0:
                br.sync_to_restart()
                pred = {c: 0 for c in pred}
            last_unit = unit
            if ah == 0:  # first DC scan: Huffman diff, point-transformed
                t = _read_huffman(br, dc_tbl[cid])
                diff = _extend(br.bits(t), t) if t else 0
                pred[cid] += diff
                if store:
                    self.coef[yb, xb, 0] = pred[cid] << al
            else:  # refinement: one bit per block (two's-complement OR)
                bit = br.bit()
                if store and bit:
                    self.coef[yb, xb, 0] |= 1 << al
        return br.pos

    # -- AC scans (luma, non-interleaved) --

    def _ac_blocks(self):
        for i in range(self.nby * self.nbx):
            yield i, i // self.nbx, i % self.nbx

    def _decode_ac_first(self, data, pos, ac_tbl, ss, se, al, ri) -> int:
        br = _BitReader(data, pos)
        eobrun = 0
        for i, yb, xb in self._ac_blocks():
            if ri and i and i % ri == 0:
                br.sync_to_restart()
                eobrun = 0
            if eobrun:
                eobrun -= 1
                continue
            coef = self.coef[yb, xb]
            k = ss
            while k <= se:
                sym = _read_huffman(br, ac_tbl)
                r, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC coefficient past band end")
                coef[k] = _extend(br.bits(s), s) << al
                k += 1
        return br.pos

    def _decode_ac_refine(self, data, pos, ac_tbl, ss, se, al, ri) -> int:
        br = _BitReader(data, pos)
        p1, m1 = 1 << al, -1 << al
        eobrun = 0

        def correct(coef, k):
            """Read one correction bit for a nonzero-history coefficient."""
            if br.bit() and not (coef[k] & p1):
                coef[k] += p1 if coef[k] >= 0 else m1

        for i, yb, xb in self._ac_blocks():
            if ri and i and i % ri == 0:
                br.sync_to_restart()
                eobrun = 0
            coef = self.coef[yb, xb]
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _read_huffman(br, ac_tbl)
                    r, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if r != 15:  # EOBn: rest of band is correction-only
                            # n = (1<<r)+extra covers THIS block's
                            # remainder plus n-1 following blocks; the
                            # shared correction region below decrements
                            # once for this block
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            break
                        val = 0  # ZRL: 16 zero-history positions, no new coef
                    elif s == 1:
                        val = p1 if br.bit() else m1
                    else:
                        raise ValueError("refinement symbol with size > 1")
                    # advance over r zero-history positions, correcting
                    # nonzero-history coefficients passed on the way
                    while k <= se:
                        if coef[k] != 0:
                            correct(coef, k)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        coef[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:  # EOB region: corrections only
                    if coef[k] != 0:
                        correct(coef, k)
                    k += 1
                eobrun -= 1
        return br.pos

    # -- final reconstruction --

    def reconstruct(self, qtables) -> np.ndarray:
        q = qtables[self.luma_tq].reshape(-1)[_ZZ_FLAT].astype(np.float64)
        out = np.zeros((self.gby * 8, self.gbx * 8))
        for yb in range(self.gby):
            for xb in range(self.gbx):
                block = np.zeros(64, dtype=np.float64)
                block[_ZZ_FLAT] = self.coef[yb, xb] * q
                px = (_C.T @ block.reshape(8, 8) @ _C) + 128.0
                out[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8] = px
        _, lh, lv, _tq = self.by_id[self.luma_id]
        cw = -(-(self.w * lh) // self.hmax)
        chh = -(-(self.h * lv) // self.vmax)
        # luma is full-resolution in every real layout (lh=hmax, lv=vmax
        # => cw=w); the crop uses the component size for generality
        return np.clip(np.round(out[:chh, :cw]), 0, 255).astype(np.uint8)


# ------------------------ progressive encoder -------------------------------


class _RefineBits:
    """Correction-bit buffer + EOB-run state shared across the blocks of
    one AC refinement (or first) scan — the encoder-side mirror of the
    decoder's ``eobrun``: EOBn symbols are batched and the correction
    bits gathered while skipping are emitted right after the flushed
    symbol (T.81 G.1.2.3)."""

    def __init__(self, bw: _BitWriter, ac_enc):
        self.bw = bw
        self.ac_enc = ac_enc
        self.eobrun = 0
        self.pending: list[int] = []

    def flush_eob(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, ln = self.ac_enc[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []


def _encode_dc_first(bw, zz_blocks, al, prev_dc_holder):
    for zz in zz_blocks:
        v = int(zz[0]) >> al  # DC point transform: arithmetic shift
        diff = v - prev_dc_holder[0]
        prev_dc_holder[0] = v
        t = _category(diff)
        code, ln = _DC_ENC[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _encode_ac_first(state: _RefineBits, zz, ss, se, al):
    bw, ac = state.bw, state.ac_enc
    r = 0
    wrote = False
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al  # AC point transform: magnitude shift
        if t == 0:
            r += 1
            continue
        state.flush_eob()
        while r > 15:
            code, ln = ac[0xF0]
            bw.write(code, ln)
            r -= 16
        s = t.bit_length()
        code, ln = ac[(r << 4) | s]
        bw.write(code, ln)
        sv = t if v >= 0 else -t
        bw.write(sv if sv >= 0 else sv + (1 << s) - 1, s)
        r = 0
        wrote = True
    del wrote  # a block ending exactly on a coded coefficient needs no EOB
    if r > 0:
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            state.flush_eob()


def _encode_ac_refine(state: _RefineBits, zz, ss, se, al):
    bw, ac = state.bw, state.ac_enc
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    r = 0
    block_bits: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        if i <= eob:
            while r > 15:
                state.flush_eob()
                code, ln = ac[0xF0]
                bw.write(code, ln)
                for b in block_bits:
                    bw.write(b, 1)
                block_bits = []
                r -= 16
        if t > 1:  # history coefficient: buffer its correction bit
            block_bits.append(t & 1)
            continue
        # newly significant (t == 1)
        state.flush_eob()
        code, ln = ac[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
        for b in block_bits:
            bw.write(b, 1)
        block_bits = []
        r = 0
    if r > 0 or block_bits:
        state.eobrun += 1
        state.pending.extend(block_bits)
        if state.eobrun == 0x7FFF:
            state.flush_eob()


# Progressive AC scans need EOBn symbols (r<<4, r=1..14) that Annex K's
# sequential table does not define; real encoders emit per-scan custom
# tables.  Ours: every needed (run,size) + EOBn + ZRL symbol at a
# uniform 10-bit length — a valid prefix code (208 of 1024 slots, the
# all-ones code unused per T.81 C.2), carried in the stream's DHT so
# the decoder still learns it from the bytes, not from shared state.
_PROG_AC_SYMS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 13)]
)
_PROG_AC_BITS = tuple(0 if i != 9 else len(_PROG_AC_SYMS) for i in range(16))
_PROG_AC_ENC = _build_codes(_PROG_AC_BITS, _PROG_AC_SYMS)


def encode_jpeg_gray8_progressive(
    img: np.ndarray, *, quant_step: int = 1, restart_interval: int = 0
) -> bytes:
    """Encode a 2-D uint8 array as a PROGRESSIVE grayscale JFIF (SOF2)
    exercising both Annex-G dimensions: spectral selection (DC scan,
    then AC bands 1-5 and 6-63) and successive approximation (every
    band coded at Al=1 first, then a refinement scan at Al=0 — DC
    bit-append, AC correction-bit algorithm with EOB-run batching).
    Same quantization/Huffman machinery as :func:`encode_jpeg_gray8`;
    exists so roundtrip tests drive the progressive decoder with an
    independently produced stream.  ``restart_interval`` > 0 emits DRI
    + per-scan RSTn markers (resetting DC predictors / EOB runs).
    """
    h, w = img.shape
    q = np.full((8, 8), int(quant_step), dtype=np.int32)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = []
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            quant = np.round((_C @ block @ _C.T) / q).astype(np.int64)
            blocks.append(quant.reshape(-1)[_ZZ_FLAT])

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def sos(ss, se, ah, al) -> bytes:
        return seg(0xFFDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    def run_scan(encode_block, *, dc: bool) -> bytes:
        bw = _BitWriter()
        state = _RefineBits(bw, _PROG_AC_ENC)
        prev = [0]
        for i, zz in enumerate(blocks):
            if restart_interval and i and i % restart_interval == 0:
                state.flush_eob()
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + ((i // restart_interval - 1) % 8)]
                )
                prev[0] = 0
            encode_block(bw, state, prev, zz)
        state.flush_eob()
        bw.flush()
        return bytes(bw.out)

    def dc_first(bw, state, prev, zz):
        _encode_dc_first(bw, [zz], 1, prev)

    def dc_refine(bw, state, prev, zz):
        bw.write(int(zz[0]) & 1, 1)

    scans = [
        (sos(0, 0, 0, 1), run_scan(dc_first, dc=True)),
        (sos(1, 5, 0, 1), run_scan(lambda bw, st, p, zz: _encode_ac_first(st, zz, 1, 5, 1), dc=False)),
        (sos(6, 63, 0, 1), run_scan(lambda bw, st, p, zz: _encode_ac_first(st, zz, 6, 63, 1), dc=False)),
        (sos(0, 0, 1, 0), run_scan(dc_refine, dc=True)),
        (sos(1, 5, 1, 0), run_scan(lambda bw, st, p, zz: _encode_ac_refine(st, zz, 1, 5, 0), dc=False)),
        (sos(6, 63, 1, 0), run_scan(lambda bw, st, p, zz: _encode_ac_refine(st, zz, 6, 63, 0), dc=False)),
    ]
    dqt = bytes([0]) + bytes(int(q.reshape(-1)[i]) for i in _ZZ_FLAT)
    sof2 = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    out = bytearray(
        b"\xff\xd8"
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xFFDB, dqt)
        + seg(0xFFC2, sof2)
        + seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        + seg(0xFFC4, bytes([0x10]) + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_SYMS))
        + dri
    )
    for header, entropy in scans:
        out += header + entropy
    out += b"\xff\xd9"
    return bytes(out)
