"""Pure-Python/numpy baseline JPEG codec (no image libraries).

Implements the baseline sequential DCT process of the public JPEG spec
(ITU-T T.81 / ISO 10918-1): marker segment parsing (SOI/APPn/DQT/SOF0/
DHT/DRI/SOS/EOI), canonical Huffman decoding per Annex F (MINCODE/MAXCODE/
VALPTR), byte-unstuffing and restart markers in the entropy stream, DC
prediction with EXTEND, AC run-length/EOB/ZRL, zigzag + dequantization,
a separable floating-point 8x8 IDCT, chroma upsampling for 4:2:0/4:2:2,
and YCbCr→RGB per the JFIF convention.  Progressive (SOF2), arithmetic
coding and 12-bit precision raise ``JpegUnsupported``.

A matching baseline encoder (4:4:4, Annex-K quantization tables scaled by
a quality factor, the spec's typical Huffman tables) exists so tests are
hermetic: encode → decode roundtrips are asserted by PSNR (JPEG is lossy)
and exactly for flat blocks at quality 100.  As with the FLAC codec, the
self-tested pair is documented: correctness is proven against the written
spec + roundtrip, not against libjpeg output.
"""

from __future__ import annotations

import numpy as np


class JpegError(Exception):
    """Malformed JPEG stream."""


class JpegUnsupported(Exception):
    """Outside the baseline subset (progressive, arithmetic, 12-bit...)."""


# zigzag scan order: ZIGZAG[k] = (row, col) linear index of the k-th coeff
_ZZ = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8-point DCT-II basis: C[u, x] = a(u) cos((2x+1) u pi / 16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _a = np.sqrt(0.125) if _u == 0 else 0.5
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficient blocks → spatial blocks (separable IDCT)."""
    return np.einsum("ux,nuv,vy->nxy", _C, blocks, _C, optimize=True)


def _dct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)


# ---------------------------------------------------------------------------
# Huffman tables (canonical, Annex C/F)
# ---------------------------------------------------------------------------


class _Huff:
    def __init__(self, bits: list[int], values: bytes):
        # bits[i] = number of codes of length i+1 (i = 0..15)
        self.values = values
        code = 0
        k = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        for length in range(1, 17):
            n = bits[length - 1]
            self.valptr[length] = k
            self.mincode[length] = code
            code += n
            k += n
            self.maxcode[length] = code - 1 if n else -1
            code <<= 1
        if k != len(values):
            raise JpegError("huffman table count mismatch")
        # encoder side: value → (code, length)
        self.enc: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.enc[values[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1


class _ScanReader:
    """Bit reader over the entropy-coded segment: 0xFF00 unstuffing; RST
    markers reset DC predictors (handled by the caller via ``at_rst``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos          # byte position
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad with zeros past the end
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: caller consumes via skip_rst
                else:
                    break  # EOI or next segment
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                raise JpegError("truncated entropy stream")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        out = 0
        for _ in range(n):
            out = (out << 1) | self.read_bit()
        return out

    def skip_rst(self) -> None:
        """Align to byte boundary and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise JpegError("missing restart marker")

    def decode_huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if table.maxcode[length] >= 0 and code <= table.maxcode[length]:
                return table.values[table.valptr[length] + code - table.mincode[length]]
        raise JpegError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    # Annex F EXTEND: v is t bits; leading 0 bit → negative branch
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(buf: bytes) -> np.ndarray:
    """JPEG bytes → uint8 image: (h, w) for grayscale, (h, w, 3) RGB."""
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        raise JpegUnsupported("not a jpeg stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0

    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise JpegError("marker sync lost")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(buf):
            raise JpegError("truncated segment length")
        seg_len = int.from_bytes(buf[pos : pos + 2], "big")
        seg = buf[pos + 2 : pos + seg_len]
        if len(seg) != seg_len - 2:
            raise JpegError("truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    raise JpegError("bad quant precision")
                if len(tbl) != 64:
                    raise JpegError("truncated quant table")
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                values = seg[p + 17 : p + 17 + n]
                if len(bits) != 16 or len(values) != n:
                    raise JpegError("truncated huffman table")
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, bytes(values))
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise JpegUnsupported(f"{prec}-bit precision")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc not in (1, 3):
                raise JpegUnsupported(f"{nc} components")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegUnsupported(f"SOF{marker - 0xC0} process")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(buf, pos + seg_len, frame, sel, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += seg_len
    raise JpegError("no scan data")


def _decode_scan(buf, pos, frame, sel, qt, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    if h == 0 or w == 0 or h * w > 64_000_000:
        raise JpegError("bad dimensions")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise JpegUnsupported("sampling factors > 2")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    for c in comps:
        if c["tq"] not in qt:
            raise JpegError("missing quant table")
        if c["id"] not in sel:
            raise JpegError("SOF component has no SOS selector entry")
        dc_id, ac_id = sel[c["id"]]
        if dc_id not in huff_dc or ac_id not in huff_ac:
            raise JpegError("missing huffman table")
        c["dc"], c["ac"] = huff_dc[dc_id], huff_ac[ac_id]
        c["q"] = qt[c["tq"]]
        c["bw"] = mcux * c["h"]            # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0

    r = _ScanReader(buf, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.skip_rst()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk_row = my * c["v"] + by
                        blk_col = mx * c["h"] + bx
                        _decode_block(r, c, blk_row * c["bw"] + blk_col)
            mcu_count += 1

    planes = []
    for c in comps:
        coef = (c["coef"] * c["q"][None, :]).astype(np.float64)
        blocks = np.zeros((len(coef), 8, 8))
        blocks.reshape(len(coef), 64)[:, _ZZ] = coef
        spat = _idct2(blocks) + 128.0
        plane = (
            spat.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution (nearest; JFIF allows any filter)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(r: _ScanReader, c: dict, idx: int) -> None:
    out = c["coef"][idx]
    t = r.decode_huff(c["dc"])
    if t > 11:
        raise JpegError("bad DC category")
    diff = _extend(r.read_bits(t), t)
    c["pred"] += diff
    out[0] = c["pred"]
    k = 1
    while k < 64:
        rs = r.decode_huff(c["ac"])
        rrrr, ssss = rs >> 4, rs & 0x0F
        if ssss == 0:
            if rrrr == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += rrrr
        if k > 63:
            raise JpegError("AC index overflow")
        out[k] = _extend(r.read_bits(ssss), ssss)
        k += 1


# ---------------------------------------------------------------------------
# encoder (baseline 4:4:4, Annex-K tables; hermetic-test counterpart)
# ---------------------------------------------------------------------------

# Annex K.1 luminance / K.2 chrominance quantization tables (zigzag order
# applied at write time; stored here in natural row order)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables
_DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_VALS = bytes(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = bytes(range(12))
_AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_L_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per spec


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(w: _BitWriter, coef_zz: np.ndarray, pred: int,
                  dc: _Huff, ac: _Huff) -> int:
    dc_v = int(coef_zz[0])
    diff = dc_v - pred
    t = _category(diff)
    code, ln = dc.enc[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(coef_zz)[0])) if np.any(coef_zz[1:]) else 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = ac.enc[0x00]  # EOB
                w.write(code, ln)
                break
            run += 1
            if run == 16:
                code, ln = ac.enc[0xF0]  # ZRL
                w.write(code, ln)
                run = 0
            continue
        s = _category(v)
        code, ln = ac.enc[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return dc_v


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JPEG (4:4:4)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64) - 128.0]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    ql = _scale_q(_QL, quality)
    qc = _scale_q(_QC, quality)
    out = bytearray(b"\xff\xd8")
    # DQT
    for tq, tbl in ([(0, ql)] if gray else [(0, ql), (1, qc)]):
        seg = bytes([tq]) + bytes(int(tbl[_ZZ[k]]) for k in range(64))
        out += b"\xff\xdb" + (len(seg) + 2).to_bytes(2, "big") + seg
    # SOF0
    nc = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    # DHT
    tables = [(0x00, _DC_L_BITS, _DC_L_VALS), (0x10, _AC_L_BITS, _AC_L_VALS)]
    if not gray:
        tables += [(0x01, _DC_C_BITS, _DC_C_VALS), (0x11, _AC_C_BITS, _AC_C_VALS)]
    for tid, bits, vals in tables:
        seg = bytes([tid]) + bytes(bits) + vals
        out += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg
    # SOS
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    dc_l, ac_l = _Huff(_DC_L_BITS, _DC_L_VALS), _Huff(_AC_L_BITS, _AC_L_VALS)
    dc_c, ac_c = _Huff(_DC_C_BITS, _DC_C_VALS), _Huff(_AC_C_BITS, _AC_C_VALS)

    bw, bh = (w + 7) // 8, (h + 7) // 8
    quant_blocks = []
    for ci, plane in enumerate(planes):
        padded = np.zeros((bh * 8, bw * 8))
        padded[:h, :w] = plane
        padded[h:, :w] = plane[-1:, :]       # edge-replicate padding
        padded[:, w:] = padded[:, w - 1 : w]
        blocks = (
            padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coefs = _dct2(blocks)
        qzz = np.zeros((len(coefs), 64), dtype=np.int32)
        qn = np.round(coefs.reshape(-1, 64)[:, _ZZ] / (ql if ci == 0 else qc)[_ZZ][None, :])
        qzz[:, :] = qn.astype(np.int32)
        quant_blocks.append(qzz)

    bwri = _BitWriter()
    preds = [0] * len(planes)
    for by in range(bh):
        for bx in range(bw):
            idx = by * bw + bx
            for ci in range(len(planes)):
                dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                preds[ci] = _encode_block(bwri, quant_blocks[ci][idx], preds[ci], dc, ac)
    bwri.flush()
    out += bytes(bwri.buf)
    out += b"\xff\xd9"
    return bytes(out)
