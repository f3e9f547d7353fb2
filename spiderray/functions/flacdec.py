"""Pure-Python FLAC subset codec (no external audio libraries).

Upgrades the engine's flac path from a stub to a real decode for the
common archival case: the container + bitstream layers of the public FLAC
format (https://xiph.org/flac/format.html) — STREAMINFO parse, frame
headers with CRC-8, and CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes
with Rice-coded residuals — for mono AND stereo streams up to 24-bit.
Stereo covers all four channel layouts: independent L/R and the three
decorrelated modes (left/side, right/side, mid/side — the side subframe
carries bps+1 bits per the spec).  >2 channels and >24-bit raise
``FlacUnsupported`` (the caller's DecodeUnsupported path).

A minimal encoder (VERBATIM / CONSTANT / FIXED frames; all four stereo
layouts; 16/24-bit) exists so tests are hermetic: encode → decode must be
bit-exact.  The encoder writes fully spec-conformant streams — any
compliant decoder reads them — but the pair being self-tested is
documented: correctness is proven against the written spec and the
roundtrip, not against libFLAC output.
"""

from __future__ import annotations

import numpy as np

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


class FlacUnsupported(Exception):
    """Feature outside the implemented subset (LPC, stereo, >16 bit...)."""


class FlacError(Exception):
    """Malformed stream."""


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8  # absolute bit position

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise FlacError("truncated stream")
        out = 0
        pos = self.pos
        while n > 0:
            byte = self.data[pos >> 3]
            bit_off = pos & 7
            take = min(8 - bit_off, n)
            shift = 8 - bit_off - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return out

    def read_unary(self) -> int:
        count = 0
        while self.read(1) == 0:
            count += 1
        return count

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        # q zeros then a one
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# CRCs (FLAC: CRC-8 poly 0x07, CRC-16 poly 0x8005, both init 0)
# ---------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int) -> list[int]:
    table = []
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# ---------------------------------------------------------------------------
# frame-number UTF-8-style coding
# ---------------------------------------------------------------------------


def _encode_utf8_number(n: int) -> bytes:
    """FLAC's extended-UTF-8 frame-number coding: an nbytes sequence
    carries (7 - nbytes) + 6*(nbytes - 1) payload bits (nbytes ≥ 2)."""
    if n < 0x80:
        return bytes([n])
    nbytes = 2
    while nbytes < 7 and n >= (1 << ((7 - nbytes) + 6 * (nbytes - 1))):
        nbytes += 1
    out = []
    first_prefix = (0xFF << (8 - nbytes)) & 0xFF
    shifts = 6 * (nbytes - 1)
    out.append(first_prefix | (n >> shifts))
    for _ in range(nbytes - 1):
        shifts -= 6
        out.append(0x80 | ((n >> shifts) & 0x3F))
    return bytes(out)


def _decode_utf8_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise FlacError("bad utf8 frame number")
    n = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise FlacError("bad utf8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# ---------------------------------------------------------------------------
# Rice residual coding
# ---------------------------------------------------------------------------


def _zigzag(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, x.astype(np.int64) << 1, ((-x.astype(np.int64)) << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _read_rice_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise FlacError("bad residual method")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise FlacError("bad partition order")
    out: list[int] = []
    for p in range(n_parts):
        n = block_size // n_parts - (order if p == 0 else 0)
        param = r.read(param_bits)
        if param == escape:
            raw_bits = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << param) | (r.read(param) if param else 0)
                out.append(_unzigzag(u))
    return out


def _write_rice_residual(w: _BitWriter, resid: np.ndarray, param: int) -> None:
    w.write(0, 2)        # method 0 (4-bit params)
    w.write(0, 4)        # partition order 0 → one partition
    w.write(param, 4)
    zz = _zigzag(resid)
    for u in zz:
        u = int(u)
        w.write_unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """bytes → (samples, sample_rate) — compat wrapper over
    ``decode_flac_info``.  Mono ≤16-bit returns 1-D int16 (the historical
    contract); stereo returns (n, 2) and 24-bit returns int32."""
    samples, sr, _bps = decode_flac_info(data)
    return samples, sr


def decode_flac_info(data: bytes) -> tuple[np.ndarray, int, int]:
    """bytes → (samples, sample_rate, bits_per_sample).  Mono → 1-D array,
    stereo → (n, 2); dtype int16 for ≤16-bit, int32 for 17-24-bit."""
    if data[:4] != b"fLaC":
        raise FlacUnsupported("not a flac stream")
    pos = 4
    sample_rate = 0
    bits_per_sample = 0
    n_channels = 0
    total_samples = 0
    while True:
        if pos + 4 > len(data):
            raise FlacError("truncated metadata")
        header = data[pos]
        last = bool(header & 0x80)
        btype = header & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:  # STREAMINFO
            r = _BitReader(body)
            r.read(16)  # min block size
            r.read(16)  # max block size
            r.read(24)  # min frame size
            r.read(24)  # max frame size
            sample_rate = r.read(20)
            n_channels = r.read(3) + 1
            bits_per_sample = r.read(5) + 1
            total_samples = r.read(36)
        pos += 4 + length
        if last:
            break
    if n_channels not in (1, 2):
        raise FlacUnsupported(f"{n_channels} channels (mono/stereo subset)")
    if bits_per_sample > 24:
        raise FlacUnsupported(f"{bits_per_sample}-bit depth (<=24 subset)")

    chunks: list[np.ndarray] = []
    n_done = 0
    while pos < len(data):
        frame, pos = _decode_frame(data, pos, sample_rate, bits_per_sample)
        # a frame whose channel layout contradicts STREAMINFO is corrupt:
        # without this check np.concatenate mixes (n,) and (n, 2) chunks
        # and raises ValueError PAST the callers' FlacError catch lists
        if (frame.ndim == 1) != (n_channels == 1):
            raise FlacError("frame channel layout contradicts STREAMINFO")
        chunks.append(frame)  # (block,) mono or (block, 2) stereo
        n_done += len(frame)
        if total_samples and n_done >= total_samples:
            break
    dtype = np.int16 if bits_per_sample <= 16 else np.int32
    if not chunks:
        shape = (0,) if n_channels == 1 else (0, 2)
        return np.zeros(shape, dtype=dtype), sample_rate, bits_per_sample
    out = np.concatenate(chunks, axis=0)
    if total_samples:
        out = out[:total_samples]
    return out.astype(dtype), sample_rate, bits_per_sample


_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768,
}


def _decode_frame(data: bytes, pos: int, sr: int, bps: int):
    r = _BitReader(data, pos)
    sync = r.read(14)
    if sync != 0b11111111111110:
        raise FlacError("lost frame sync")
    r.read(1)  # reserved
    r.read(1)  # blocking strategy
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_code = r.read(4)
    ss_code = r.read(3)
    r.read(1)  # reserved
    # channel assignment: 0 = mono, 1 = 2 independent channels,
    # 8 = left/side, 9 = right/side, 10 = mid/side (side carries bps+1)
    if ch_code not in (0, 1, 8, 9, 10):
        raise FlacUnsupported("channel layout (mono/stereo subset)")
    _decode_utf8_number(r)  # frame number (unused; sequential decode)
    if bs_code == 6:
        block_size = r.read(8) + 1
    elif bs_code == 7:
        block_size = r.read(16) + 1
    elif bs_code in _BLOCKSIZE_TABLE:
        block_size = _BLOCKSIZE_TABLE[bs_code]
    else:
        raise FlacError("reserved block size code")
    if sr_code == 12:
        r.read(8)
    elif sr_code in (13, 14):
        r.read(16)
    # CRC-8 covers the header bytes up to (not incl.) the crc byte itself
    r.align()
    crc_offset = r.byte_pos()
    expect_crc8 = r.read(8)
    if crc8(data[pos:crc_offset]) != expect_crc8:
        raise FlacError("frame header crc8 mismatch")

    if ch_code == 0:
        samples = np.array(_decode_subframe(r, block_size, bps), dtype=np.int64)
    else:
        # per-channel effective bps: the SIDE subframe carries one extra bit
        # (left/side: ch1 is side; right/side: ch0 is side; mid/side: ch1)
        extra = {1: (0, 0), 8: (0, 1), 9: (1, 0), 10: (0, 1)}[ch_code]
        ch0 = np.array(_decode_subframe(r, block_size, bps + extra[0]), dtype=np.int64)
        ch1 = np.array(_decode_subframe(r, block_size, bps + extra[1]), dtype=np.int64)
        if ch_code == 1:      # independent
            left, right = ch0, ch1
        elif ch_code == 8:    # left/side: right = left - side
            left, right = ch0, ch0 - ch1
        elif ch_code == 9:    # right/side: left = right + side
            left, right = ch0 + ch1, ch1
        else:                 # mid/side (spec reconstruction):
            mid, side = ch0, ch1
            m2 = (mid << 1) | (side & 1)
            left = (m2 + side) >> 1
            right = (m2 - side) >> 1
        samples = np.stack([left, right], axis=1)

    r.align()
    crc_pos = r.byte_pos()
    expect_crc16 = r.read(16)
    if crc16(data[pos:crc_pos]) != expect_crc16:
        raise FlacError("frame crc16 mismatch")
    return samples, r.byte_pos()


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> list[int]:
    if r.read(1) != 0:
        raise FlacError("bad subframe padding bit")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    eff_bps = bps - wasted
    if stype == 0:  # CONSTANT
        v = r.read_signed(eff_bps)
        out = [v] * block_size
    elif stype == 1:  # VERBATIM
        out = [r.read_signed(eff_bps) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [r.read_signed(eff_bps) for _ in range(order)]
        resid = _read_rice_residual(r, block_size, order)
        coeffs = _FIXED_COEFFS[order]
        out = list(warm)
        for e in resid:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coeffs))
            out.append(pred + e)
    elif stype & 0x20:  # LPC, order = (type & 0x1F) + 1
        order = (stype & 0x1F) + 1
        warm = [r.read_signed(eff_bps) for _ in range(order)]
        precision = r.read(4)
        if precision == 0b1111:
            raise FlacError("invalid qlp precision")
        precision += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise FlacError("negative qlp shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        resid = _read_rice_residual(r, block_size, order)
        out = list(warm)
        for e in resid:
            pred = sum(c * out[-j - 1] for j, c in enumerate(coefs)) >> shift
            out.append(pred + e)
    else:
        raise FlacError("reserved subframe type")
    if wasted:
        out = [v << wasted for v in out]
    return out


# ---------------------------------------------------------------------------
# encode (VERBATIM / CONSTANT / FIXED, mono 16-bit, fixed 4096 blocks)
# ---------------------------------------------------------------------------


def encode_flac(samples: np.ndarray, sample_rate: int, block_size: int = 4096,
                mode: str = "auto", bits_per_sample: int = 16,
                stereo_mode: str = "independent") -> bytes:
    """mono (n,) or stereo (n, 2) int samples → FLAC bytes.

    mono mode: 'verbatim' | 'constant-ok' ('auto': constant frames for flat
    blocks, fixed order-2 when it wins, else verbatim).  Stereo frames are
    VERBATIM subframes in the chosen ``stereo_mode`` ('independent' |
    'left-side' | 'right-side' | 'mid-side' — the decorrelated layouts per
    the spec, side subframe at bps+1).  ``bits_per_sample``: 16 or 24."""
    samples = np.asarray(samples, dtype=np.int64)
    stereo = samples.ndim == 2
    if stereo and samples.shape[1] != 2:
        raise ValueError("stereo input must be (n, 2)")
    if bits_per_sample not in (16, 24):
        raise ValueError("bits_per_sample must be 16 or 24")
    n = len(samples)
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(1 if stereo else 0, 3)       # channels - 1
    si.write(bits_per_sample - 1, 5)
    si.write(n, 36)
    si.write(0, 128)      # md5 (unset)
    si_bytes = si.bytes()
    out.append(0x80)      # last block, type 0
    out += len(si_bytes).to_bytes(3, "big")
    out += si_bytes

    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        block = samples[start : start + block_size]
        if len(block) == 0:
            break
        if stereo:
            out += _encode_stereo_frame(block, frame_no, bits_per_sample, stereo_mode)
        else:
            out += _encode_frame(block, sample_rate, frame_no, block_size, mode,
                                 bits_per_sample)
        frame_no += 1
    return bytes(out)


# frame-header sample-size codes (subset): bps → 3-bit code
_SS_CODE = {16: 4, 24: 6}


def _encode_frame(block: np.ndarray, sr: int, frame_no: int, nominal_bs: int,
                  mode: str, bps: int = 16) -> bytes:
    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)   # reserved
    w.write(0, 1)   # fixed blocking
    w.write(7, 4)   # block size: 16-bit field follows
    w.write(0, 4)   # sample rate: from STREAMINFO
    w.write(0, 4)   # mono
    w.write(_SS_CODE[bps], 3)
    w.write(0, 1)
    for b in _encode_utf8_number(frame_no):
        w.write(b, 8)
    w.write(len(block) - 1, 16)
    w.align()
    header = w.bytes()
    header += bytes([crc8(header)])

    body = _BitWriter()
    const = bool((block == block[0]).all())
    use_fixed = False
    if mode == "auto" and not const and len(block) > 8:
        resid2 = block[2:] - 2 * block[1:-1] + block[:-2]
        use_fixed = int(np.abs(resid2).mean()) < int(np.abs(block).mean())
    if const and mode != "verbatim":
        body.write(0, 1)
        body.write(0, 6)       # CONSTANT
        body.write(0, 1)
        body.write(int(block[0]), bps)
    elif use_fixed:
        body.write(0, 1)
        body.write(8 + 2, 6)   # FIXED order 2
        body.write(0, 1)
        body.write(int(block[0]), bps)
        body.write(int(block[1]), bps)
        resid = block[2:] - 2 * block[1:-1] + block[:-2]
        mean_abs = max(float(np.abs(resid).mean()), 1.0)
        param = min(max(int(np.log2(mean_abs)) + 1, 0), 14)
        _write_rice_residual(body, resid, param)
    else:
        body.write(0, 1)
        body.write(1, 6)       # VERBATIM
        body.write(0, 1)
        for v in block:
            body.write(int(v), bps)
    body.align()
    frame = header + body.bytes()
    return frame + crc16(frame).to_bytes(2, "big")


def _write_verbatim_subframe(body: _BitWriter, ch: np.ndarray, eff_bps: int) -> None:
    body.write(0, 1)
    body.write(1, 6)   # VERBATIM
    body.write(0, 1)   # no wasted bits
    for v in ch:
        body.write(int(v), eff_bps)


def _encode_stereo_frame(block: np.ndarray, frame_no: int, bps: int,
                         stereo_mode: str) -> bytes:
    """One stereo frame, VERBATIM subframes in the requested channel layout
    (the hermetic counterpart of the stereo decode paths)."""
    left = block[:, 0].astype(np.int64)
    right = block[:, 1].astype(np.int64)
    if stereo_mode == "independent":
        ch_code, ch0, ch1, extra = 1, left, right, (0, 0)
    elif stereo_mode == "left-side":
        ch_code, ch0, ch1, extra = 8, left, left - right, (0, 1)
    elif stereo_mode == "right-side":
        ch_code, ch0, ch1, extra = 9, left - right, right, (1, 0)
    elif stereo_mode == "mid-side":
        ch_code, ch0, ch1, extra = 10, (left + right) >> 1, left - right, (0, 1)
    else:
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")

    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)   # reserved
    w.write(0, 1)   # fixed blocking
    w.write(7, 4)   # block size: 16-bit field follows
    w.write(0, 4)   # sample rate: from STREAMINFO
    w.write(ch_code, 4)
    w.write(_SS_CODE[bps], 3)
    w.write(0, 1)
    for b in _encode_utf8_number(frame_no):
        w.write(b, 8)
    w.write(len(block) - 1, 16)
    w.align()
    header = w.bytes()
    header += bytes([crc8(header)])

    body = _BitWriter()
    _write_verbatim_subframe(body, ch0, bps + extra[0])
    _write_verbatim_subframe(body, ch1, bps + extra[1])
    body.align()
    frame = header + body.bytes()
    return frame + crc16(frame).to_bytes(2, "big")
