"""GIF87a/89a codec — from the public GIF specification (CompuServe
GIF89a spec, 1990) and the LZW variable-code-width scheme it mandates.

Decode: header + logical screen descriptor, global/local color tables,
Graphic Control Extensions (disposal methods 0-3, transparency), image
descriptors with 4-pass interlacing, and the 3..12-bit LZW-compressed
index stream.  Frames COMPOSE onto the logical screen per the spec's
disposal model, so the decoder returns the sequence of full canvases —
what a frame-sampling stage wants.

Encode (for tests and corpus synthesis): palette-quantized single- or
multi-frame GIF with a real LZW compressor (dictionary reset at 4096,
same variable-width rules).
"""

from __future__ import annotations

import numpy as np


class GifError(ValueError):
    pass


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, clear/end codes, 4096-entry cap)
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    if not 2 <= min_code_size <= 11:
        raise GifError(f"lzw min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    # bit reader over the concatenated sub-block payload, LSB first
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         bitorder="little")
    pos = 0
    width = min_code_size + 1
    dict_: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None

    def read_code() -> int:
        nonlocal pos
        if pos + width > len(bits):
            raise GifError("lzw stream truncated")
        chunk = bits[pos : pos + width]
        pos += width
        return int(chunk @ (1 << np.arange(width, dtype=np.int64)))

    while len(out) < n_pixels:
        code = read_code()
        if code == clear:
            dict_ = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(dict_):
                raise GifError("lzw first code out of range")
            entry = dict_[code]
        elif code < len(dict_):
            entry = dict_[code]
            if len(dict_) < 4096:
                dict_.append(prev + entry[:1])
        elif code == len(dict_):
            entry = prev + prev[:1]
            if len(dict_) < 4096:
                dict_.append(entry)
        else:
            raise GifError("lzw code out of range")
        out += entry
        prev = entry
        if len(dict_) >= (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise GifError(f"lzw short: {len(out)} of {n_pixels} pixels")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[int] = []
    width = min_code_size + 1

    def emit(code: int):
        nonlocal width
        for b in range(width):
            out_bits.append((code >> b) & 1)

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    w = b""
    for px in indices.tobytes():
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([px])
    if w:
        emit(table[w])
    emit(end)
    arr = np.array(out_bits, dtype=np.uint8)
    return np.packbits(arr, bitorder="little").tobytes()


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) per pass


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE:
        for r in range(start, h, step):
            out[r] = rows[src]
            src += 1
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def decode_gif(buf: bytes, max_frames: int = 256) -> list[np.ndarray]:
    """GIF bytes → list of (H, W, 3) uint8 canvases (one per frame,
    composed per the disposal model)."""
    if len(buf) < 13 or buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    W = int.from_bytes(buf[6:8], "little")
    H = int.from_bytes(buf[8:10], "little")
    packed = buf[10]
    bg_idx = buf[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) < 3 * n:
            raise GifError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    if W == 0 or H == 0 or W * H > 64_000_000:
        raise GifError(f"bad logical screen {W}x{H}")

    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    frames: list[np.ndarray] = []
    disposal, transparent = 0, -1
    prev_canvas = None

    def read_subblocks(p: int) -> tuple[bytes, int]:
        parts = []
        while True:
            if p >= len(buf):
                raise GifError("truncated sub-blocks")
            n = buf[p]
            p += 1
            if n == 0:
                return b"".join(parts), p
            parts.append(buf[p : p + n])
            if len(buf[p : p + n]) < n:
                raise GifError("truncated sub-block payload")
            p += n

    while pos < len(buf):
        b = buf[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= len(buf):
                raise GifError("truncated extension")
            label = buf[pos]
            pos += 1
            data, pos = read_subblocks(pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                disposal = (data[0] >> 2) & 0x07
                transparent = data[3] if data[0] & 0x01 else -1
            continue
        if b != 0x2C:
            raise GifError(f"unknown block 0x{b:02x}")
        # image descriptor
        if pos + 9 > len(buf):
            raise GifError("truncated image descriptor")
        left = int.from_bytes(buf[pos : pos + 2], "little")
        top = int.from_bytes(buf[pos + 2 : pos + 4], "little")
        fw = int.from_bytes(buf[pos + 4 : pos + 6], "little")
        fh = int.from_bytes(buf[pos + 6 : pos + 8], "little")
        ipacked = buf[pos + 8]
        pos += 9
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8)
            if len(lct) < 3 * n:
                raise GifError("truncated local color table")
            lct = lct.reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise GifError("no color table")
        if left + fw > W or top + fh > H:
            raise GifError("frame exceeds logical screen")
        if pos >= len(buf):
            raise GifError("truncated image data")
        mcs = buf[pos]
        pos += 1
        data, pos = read_subblocks(pos)
        idx = _lzw_decode(data, mcs, fw * fh)
        if ipacked & 0x40:
            idx = _deinterlace(idx, fh, fw)
        if int(idx.max(initial=0)) >= len(lct):
            raise GifError("palette index out of range")
        if disposal == 3:
            prev_canvas = canvas.copy()
        region = canvas[top : top + fh, left : left + fw]
        rgb = lct[idx].reshape(fh, fw, 3)
        if transparent >= 0:
            mask = (idx != transparent).reshape(fh, fw)
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if len(frames) >= max_frames:
            break
        # disposal AFTER the frame is shown
        if disposal == 2:
            # the background color index references the GLOBAL color table
            # (GIF89a spec §18; local tables apply only to their own image
            # data) — round-3 ADVICE finding: using lct here composed wrong
            # canvases for foreign GIFs carrying local tables
            if gct is not None and bg_idx < len(gct):
                bg = gct[bg_idx]
            else:
                bg = 0
            canvas[top : top + fh, left : left + fw] = bg
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        disposal, transparent = 0, -1
    if not frames:
        raise GifError("no frames")
    return frames


def _quantize(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact palette from unique colors (≤256 required)."""
    flat = img.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise GifError(f"{len(pal)} colors exceed GIF's 256-entry palette")
    return pal.astype(np.uint8), inv.astype(np.uint8)


def encode_gif(frames: list[np.ndarray], interlace_first: bool = False) -> bytes:
    """Frames (each (H, W, 3) uint8, same size, ≤256 distinct colors
    across all) → GIF89a bytes.  Lossless for palette-sized content."""
    if not frames:
        raise GifError("no frames")
    H, W = frames[0].shape[:2]
    allpix = np.concatenate([f.reshape(-1, 3) for f in frames])
    pal, _ = _quantize(allpix.reshape(-1, 1, 3))
    n_pal = max(len(pal), 2)
    size_field = max(int(np.ceil(np.log2(n_pal))), 1)
    table_n = 1 << size_field
    lut = {tuple(c): i for i, c in enumerate(pal)}
    out = bytearray(b"GIF89a")
    out += W.to_bytes(2, "little") + H.to_bytes(2, "little")
    out += bytes([0x80 | (size_field - 1), 0, 0])
    out += pal.tobytes() + b"\x00" * (3 * (table_n - len(pal)))
    mcs = max(size_field, 2)
    for fi, f in enumerate(frames):
        if f.shape[:2] != (H, W):
            raise GifError("frame size mismatch")
        out += bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])  # GCE, no transparency
        inter = interlace_first and fi == 0
        out += b"\x2c" + (0).to_bytes(2, "little") * 2
        out += W.to_bytes(2, "little") + H.to_bytes(2, "little")
        out += bytes([0x40 if inter else 0x00])
        idx = np.array([lut[tuple(px)] for px in f.reshape(-1, 3)],
                       dtype=np.uint8)
        if inter:
            rows = idx.reshape(H, W)
            order = [r for start, step in _INTERLACE
                     for r in range(start, H, step)]
            idx = rows[order].reshape(-1)
        out += bytes([mcs])
        payload = _lzw_encode(idx, mcs)
        for off in range(0, len(payload), 255):
            blk = payload[off : off + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
