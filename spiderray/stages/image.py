"""Image / video columns as opaque bytes + typed metadata (engine
additions; the multimodal plumbing contract of SURVEY §2.9 extended from
audio to the remaining modalities).

Decoders implemented from the public formats, no external libraries:
binary PPM (P6) / PGM (P5), uncompressed 24-bit BMP, 8-bit
non-interlaced PNG (zlib inflate + the five per-row filters), baseline
JPEG (functions/jpegdec.py — T.81 markers/Huffman/IDCT/chroma
upsampling), and lossless WebP (functions/webpdec.py — VP8L huffman +
LZ77 + color cache + all four transforms).  Progressive JPEG, lossy
(VP8) WebP, PNG palette/16-bit/Adam7 raise ``ImageDecodeUnsupported`` —
rows flow through with ``decode_ok=False`` (mark, don't crash).

Video containers: **YUV4MPEG2 (Y4M)** — the real, public uncompressed
video interchange format (mjpegtools/ffmpeg ``-f yuv4mpeg``; plain-text
stream header ``YUV4MPEG2 W.. H.. F..`` then ``FRAME\n`` + planar YUV per
frame) — decoded from the spec with vectorized BT.601 YUV→RGB and 4:2:0
chroma upsampling (C420/C420jpeg/C420mpeg2/C420paldv, C422, C444, Cmono);
plus the deterministic toy ``RAWV`` container (header + concatenated P6
frames) kept for plumbing tests.  ``_iter_video_frames`` dispatches on the
magic and yields uniform P6 frame bytes either way; compressed codecs
(h264/vp9/...) would slot in at the same seam.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig


class ImageDecodeUnsupported(NotImplementedError):
    """Format outside the no-library subset (png/jpeg/webp/...)."""


# ---------------------------------------------------------------------------
# decoders (pure numpy)
# ---------------------------------------------------------------------------


def _parse_pnm_header(buf: bytes) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, data_offset) for P5/P6."""
    parts = []
    i = 0
    while len(parts) < 4 and i < len(buf):
        # skip whitespace and comments
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        parts.append(buf[i:j])
        i = j
    if len(parts) < 4:
        raise ImageDecodeUnsupported("truncated pnm header")
    magic = parts[0]
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    return magic, w, h, maxval, i + 1  # single whitespace after maxval


def decode_image(buf: bytes, fmt: str) -> np.ndarray:
    """bytes → (h, w, 3) uint8 RGB.  ppm/pgm/bmp real; rest stubbed."""
    fmt = (fmt or "").lower()
    if fmt in ("ppm", "pgm"):
        magic, w, h, maxval, off = _parse_pnm_header(buf)
        if maxval > 255:
            raise ImageDecodeUnsupported("16-bit pnm")
        if magic == b"P6":
            if len(buf) < off + w * h * 3:
                raise ImageDecodeUnsupported("truncated ppm payload")
            arr = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=off)
            return arr.reshape(h, w, 3).copy()
        if magic == b"P5":
            if len(buf) < off + w * h:
                raise ImageDecodeUnsupported("truncated pgm payload")
            arr = np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=off)
            return np.repeat(arr.reshape(h, w, 1), 3, axis=2)
        raise ImageDecodeUnsupported(f"pnm magic {magic!r}")
    if fmt == "bmp":
        if buf[:2] != b"BM":
            raise ImageDecodeUnsupported("bad bmp magic")
        data_off = int.from_bytes(buf[10:14], "little")
        w = int.from_bytes(buf[18:22], "little", signed=True)
        h = int.from_bytes(buf[22:26], "little", signed=True)
        bpp = int.from_bytes(buf[28:30], "little")
        comp = int.from_bytes(buf[30:34], "little")
        if bpp != 24 or comp != 0:
            raise ImageDecodeUnsupported(f"bmp bpp={bpp} comp={comp}")
        row_bytes = (w * 3 + 3) & ~3  # 4-byte aligned rows
        if len(buf) < data_off + row_bytes * abs(h):
            raise ImageDecodeUnsupported("truncated bmp payload")
        out = np.empty((abs(h), w, 3), dtype=np.uint8)
        flip = h > 0  # positive height = bottom-up
        for r in range(abs(h)):
            start = data_off + r * row_bytes
            row = np.frombuffer(buf, dtype=np.uint8, count=w * 3, offset=start).reshape(w, 3)
            out[abs(h) - 1 - r if flip else r] = row[:, ::-1]  # BGR → RGB
        return out
    if fmt == "png":
        return _decode_png(buf)
    if fmt in ("jpeg", "jpg"):
        # from-scratch baseline JPEG (functions/jpegdec.py): T.81 markers,
        # Annex-F Huffman, dequant + IDCT, 4:2:0/4:2:2 chroma upsampling.
        # Progressive/arithmetic/12-bit stay unsupported.
        from ..functions.jpegdec import JpegError, JpegUnsupported, decode_jpeg

        try:
            img = decode_jpeg(buf)
        except (JpegError, JpegUnsupported, IndexError, ValueError):
            raise ImageDecodeUnsupported("jpeg") from None
        if img.ndim == 2:
            return np.repeat(img[:, :, None], 3, axis=2)
        return img
    if fmt == "webp":
        # from-scratch VP8L lossless decode (functions/webpdec.py: RIFF +
        # canonical huffman + LZ77 + color cache + all four transforms).
        # Lossy VP8 stays unsupported (DCT+loop-filter codec).
        from ..functions.webpdec import WebpError, WebpUnsupported, decode_webp_lossless

        try:
            rgba = decode_webp_lossless(buf)
        except (WebpError, WebpUnsupported, IndexError, ValueError):
            raise ImageDecodeUnsupported("webp") from None
        return rgba[..., :3].copy()
    if fmt == "gif":
        # from-scratch GIF87a/89a (functions/gifdec.py: variable-width
        # LZW, interlace, disposal/transparency composition); still
        # images take frame 0.
        from ..functions.gifdec import GifError, decode_gif

        try:
            return decode_gif(buf, max_frames=1)[0]
        except (GifError, IndexError, ValueError):
            raise ImageDecodeUnsupported("gif") from None
    raise ImageDecodeUnsupported(fmt)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-row PNG filters (0 None, 1 Sub, 2 Up, 3 Average,
    4 Paeth).  Sequential by nature (each row depends on the previous);
    rows are numpy-vectorized across their width where the filter allows."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ftype = int(raw[pos])
        row = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        if ftype == 0:
            cur = row
        elif ftype == 2:  # Up — fully vectorized
            cur = (row + prev) & 0xFF
        elif ftype == 1:  # Sub — per-lane cumulative sum mod 256
            lanes = row.reshape(-1, bpp)
            cur = (np.cumsum(lanes, axis=0) & 0xFF).reshape(-1)
        elif ftype in (3, 4):  # Average / Paeth: per-PIXEL channel-vector scan
            cur = np.empty(stride, dtype=np.int32)
            n_px = stride // bpp
            row2 = row.reshape(n_px, bpp)
            prev2 = prev.reshape(n_px, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            out2 = cur.reshape(n_px, bpp)
            for i in range(n_px):
                up = prev2[i]
                if ftype == 3:
                    out2[i] = (row2[i] + ((left + up) >> 1)) & 0xFF
                else:
                    pp = left + up - ul
                    pa_ = np.abs(pp - left)
                    pb = np.abs(pp - up)
                    pc_ = np.abs(pp - ul)
                    pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                                    np.where(pb <= pc_, up, ul))
                    out2[i] = (row2[i] + pred) & 0xFF
                left = out2[i]
                ul = up
        else:
            raise ImageDecodeUnsupported(f"png filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def _decode_png(buf: bytes) -> np.ndarray:
    """Real PNG decode for the non-interlaced subset: gray (0, depths
    1/2/4/8/16), RGB (2, 8/16), palette (3, depths 1/2/4/8 via PLTE),
    gray+alpha (4) and RGBA (6) at 8/16 bit.  16-bit samples downconvert
    by high byte (the spec's 8-bit reduction).  Adam7 interlacing raises
    ImageDecodeUnsupported."""
    import struct
    import zlib

    if buf[:8] != _PNG_MAGIC:
        raise ImageDecodeUnsupported("bad png magic")
    pos = 8
    w = h = 0
    bit_depth = color_type = interlace = 0
    idat = bytearray()
    plte = None
    while pos + 8 <= len(buf):
        length = int.from_bytes(buf[pos : pos + 4], "big")
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ImageDecodeUnsupported("truncated png chunk")
        if ctype == b"IHDR":
            if len(data) != 13:
                raise ImageDecodeUnsupported("bad IHDR length")
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"PLTE":
            if length % 3 or length == 0 or length > 768:
                raise ImageDecodeUnsupported("bad PLTE length")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if w == 0 or h == 0:
        raise ImageDecodeUnsupported("png missing IHDR")
    if interlace != 0:
        raise ImageDecodeUnsupported("png Adam7 interlace")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ImageDecodeUnsupported(f"png color type {color_type}")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ImageDecodeUnsupported(f"png depth {bit_depth}")
    if bit_depth < 8 and color_type not in (0, 3):
        raise ImageDecodeUnsupported(
            f"png depth {bit_depth} invalid for color type {color_type}")
    if bit_depth == 16 and color_type == 3:
        raise ImageDecodeUnsupported("png 16-bit palette is not a PNG")
    if color_type == 3 and plte is None:
        raise ImageDecodeUnsupported("png palette image missing PLTE")
    stride = (w * channels * bit_depth + 7) // 8
    bpp = max(1, (channels * bit_depth) // 8)  # filter offset, per spec
    expected = h * (stride + 1)
    if expected > (1 << 31):
        raise ImageDecodeUnsupported("png dimensions exceed decode budget")
    try:
        # bounded inflate: a decompression bomb must not allocate past the
        # size IHDR implies (+1 to detect overruns)
        d = zlib.decompressobj()
        inflated = d.decompress(bytes(idat), expected + 1)
        if len(inflated) > expected:
            raise ImageDecodeUnsupported("png inflated size exceeds IHDR")
        raw = np.frombuffer(inflated, dtype=np.uint8)
    except zlib.error as e:
        raise ImageDecodeUnsupported(f"png inflate: {e}") from None
    if len(raw) < expected:
        raise ImageDecodeUnsupported("truncated png pixel data")
    rows = _png_unfilter(raw, h, stride, bpp).reshape(h, stride)
    if bit_depth == 16:
        px = rows.reshape(h, w * channels, 2)[..., 0].reshape(h, w, channels)
    elif bit_depth == 8:
        px = rows.reshape(h, w, channels)
    else:
        # 1/2/4-bit packed samples, MSB-first within each byte, rows padded
        bits = np.unpackbits(rows, axis=1)[:, : w * bit_depth]
        weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint8)
        px = (bits.reshape(h, w, bit_depth) * weights).sum(
            axis=2).astype(np.uint8).reshape(h, w, 1)
        if color_type == 0:  # scale to full 8-bit range (255/85/17 exact)
            px = px * np.uint8(255 // ((1 << bit_depth) - 1))
    if color_type == 3:
        idx = px[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ImageDecodeUnsupported("png palette index out of range")
        return np.ascontiguousarray(plte[idx])
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:
        return np.repeat(px[..., :1], 3, axis=2)
    if channels == 4:
        return np.ascontiguousarray(px[..., :3])
    return px


def encode_png(img: np.ndarray) -> bytes:
    """Minimal conformant 8-bit RGB PNG writer (filter 0 rows) — hermetic
    test counterpart of _decode_png."""
    import struct
    import zlib

    h, w = img.shape[:2]
    raw = bytearray()
    for r in range(h):
        raw.append(0)  # filter None
        raw += np.ascontiguousarray(img[r], dtype=np.uint8).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized nearest-neighbour resize (index maps, no loops)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def image_stats(img: np.ndarray) -> dict:
    lum = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    return {
        "width": int(img.shape[1]),
        "height": int(img.shape[0]),
        "mean_lum": float(lum.mean()),
        "std_lum": float(lum.std()),
    }


# ---------------------------------------------------------------------------
# toy video container: b"RAWV" + uint32 n_frames + n × (uint32 len + P6 bytes)
# ---------------------------------------------------------------------------


def encode_rawv(frames: list[np.ndarray]) -> bytes:
    out = bytearray(b"RAWV")
    out += len(frames).to_bytes(4, "little")
    for f in frames:
        p = encode_ppm(f)
        out += len(p).to_bytes(4, "little")
        out += p
    return bytes(out)


def _iter_video_frames(buf: bytes):
    """Uniform frame iterator: dispatches on the container magic and yields
    P6 (PPM) frame bytes for every supported container — Y4M (real format,
    decoded YUV→RGB) and the RAWV test container alike."""
    if buf.startswith(_Y4M_MAGIC):
        for rgb in _iter_y4m_frames(buf):
            yield encode_ppm(rgb)
        return
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        # animated GIF is a real multi-frame container: composed canvases
        from ..functions.gifdec import GifError, decode_gif

        try:
            frames = decode_gif(buf)
        except (GifError, IndexError, ValueError):
            raise ImageDecodeUnsupported("gif video") from None
        for rgb in frames:
            yield encode_ppm(rgb)
        return
    if buf[:4] != b"RAWV":
        raise ImageDecodeUnsupported("video container")
    n = int.from_bytes(buf[4:8], "little")
    # a corrupt header count must not drive a multi-billion empty-frame
    # loop: every frame needs >= 4 header bytes, so cap n by the payload
    if n > max((len(buf) - 8) // 4, 0):
        raise ImageDecodeUnsupported("video frame count exceeds payload")
    pos = 8
    for _ in range(n):
        if pos + 4 > len(buf):
            raise ImageDecodeUnsupported("truncated video frame table")
        ln = int.from_bytes(buf[pos : pos + 4], "little")
        pos += 4
        if pos + ln > len(buf):
            raise ImageDecodeUnsupported("truncated video frame payload")
        yield buf[pos : pos + ln]
        pos += ln


# ---------------------------------------------------------------------------
# YUV4MPEG2 (Y4M): the real, public uncompressed video interchange format
# (mjpegtools; what `ffmpeg -f yuv4mpeg` writes).  Stream header
# b"YUV4MPEG2" + space-separated tagged params (W H F I A C X) up to \n,
# then per frame b"FRAME"[params]\n + planar YUV bytes.  Chroma math is the
# full-range BT.601 (JPEG/JFIF) matrix for every colorspace — the canonical
# C420jpeg case; limited-range siting variants (C420mpeg2/C420paldv) decode
# with the same matrix, a documented deviation that keeps the codec
# deterministic and library-free.
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"
_Y4M_MAX_PIXELS = 1 << 26  # 64 Mpx/frame: a corrupt header must not OOM

# colorspace tag -> (chroma x-subsample, y-subsample); "mono" is special
_Y4M_CS = {
    "420": (2, 2), "420jpeg": (2, 2), "420mpeg2": (2, 2), "420paldv": (2, 2),
    "422": (2, 1), "444": (1, 1),
}


def _parse_y4m_header(buf: bytes) -> tuple[int, int, str, int]:
    """(width, height, colorspace, data_offset); raises on anything that is
    not a well-formed YUV4MPEG2 stream header."""
    if not buf.startswith(_Y4M_MAGIC):
        raise ImageDecodeUnsupported("y4m magic")
    nl = buf.find(b"\n", 0, 4096)
    if nl < 0:
        raise ImageDecodeUnsupported("y4m header unterminated")
    w = h = 0
    cs = "420"  # spec default when no C tag
    for tok in buf[len(_Y4M_MAGIC):nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        try:
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"C":
                cs = val.decode("ascii")
            elif tag == b"F":
                num, den = val.split(b":")
                if int(num) <= 0 or int(den) <= 0:
                    raise ValueError("non-positive frame rate")
            # I (interlace), A (aspect), X (extension) are legal; ignored
        except (ValueError, UnicodeDecodeError) as exc:
            raise ImageDecodeUnsupported(f"y4m header tag {tok[:16]!r}") from exc
    if w <= 0 or h <= 0 or w * h > _Y4M_MAX_PIXELS:
        raise ImageDecodeUnsupported("y4m dimensions")
    return w, h, cs, nl + 1


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Full-range BT.601 inverse (JFIF matrix), vectorized over the frame."""
    yf = y.astype(np.float64)
    uf = u.astype(np.float64) - 128.0
    vf = v.astype(np.float64) - 128.0
    rgb = np.stack(
        [yf + 1.402 * vf,
         yf - 0.344136 * uf - 0.714136 * vf,
         yf + 1.772 * uf], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _iter_y4m_frames(buf: bytes):
    """Yield decoded RGB uint8 (h, w, 3) frames from a Y4M stream."""
    w, h, cs, pos = _parse_y4m_header(buf)
    mono = cs == "mono"
    if mono:
        fsize = w * h
    else:
        if cs not in _Y4M_CS:
            raise ImageDecodeUnsupported(f"y4m colorspace {cs[:16]}")
        sx, sy = _Y4M_CS[cs]
        if w % sx or h % sy:
            raise ImageDecodeUnsupported("y4m odd dims for subsampling")
        cw, ch = w // sx, h // sy
        fsize = w * h + 2 * cw * ch
    while pos < len(buf):
        if not buf.startswith(b"FRAME", pos):
            raise ImageDecodeUnsupported("y4m frame marker")
        nl = buf.find(b"\n", pos, pos + 256)
        if nl < 0:
            raise ImageDecodeUnsupported("y4m frame header unterminated")
        pos = nl + 1
        if pos + fsize > len(buf):
            raise ImageDecodeUnsupported("truncated y4m frame payload")
        data = np.frombuffer(buf, np.uint8, fsize, pos)
        pos += fsize
        yp = data[: w * h].reshape(h, w)
        if mono:
            yield np.repeat(yp[..., None], 3, axis=2)
            continue
        up = data[w * h : w * h + cw * ch].reshape(ch, cw)
        vp = data[w * h + cw * ch :].reshape(ch, cw)
        if sx > 1:
            up = np.repeat(up, sx, axis=1)
            vp = np.repeat(vp, sx, axis=1)
        if sy > 1:
            up = np.repeat(up, sy, axis=0)
            vp = np.repeat(vp, sy, axis=0)
        yield _yuv_to_rgb(yp, up, vp)


def encode_y4m(frames: list[np.ndarray], colorspace: str = "420jpeg",
               fps: tuple[int, int] = (25, 1)) -> bytes:
    """RGB uint8 frames → a YUV4MPEG2 stream (full-range BT.601 forward
    matrix; chroma subsampled by block mean).  All frames must share the
    first frame's dimensions.  Gray frames (R=G=B) round-trip bit-exactly
    (U=V=128, Y=R)."""
    if not frames:
        raise ValueError("encode_y4m needs at least one frame")
    h, w = frames[0].shape[:2]
    if colorspace == "mono":
        sx = sy = 1
    elif colorspace in _Y4M_CS:
        sx, sy = _Y4M_CS[colorspace]
        if w % sx or h % sy:
            raise ValueError(f"dims {w}x{h} not divisible for C{colorspace}")
    else:
        raise ValueError(f"unsupported y4m colorspace {colorspace!r}")
    out = bytearray(
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n"
        % (w, h, fps[0], fps[1], colorspace.encode("ascii")))
    for img in frames:
        if img.shape[:2] != (h, w):
            raise ValueError("frame dimensions differ within one stream")
        f = img.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        out += b"FRAME\n"
        out += np.clip(np.rint(y), 0, 255).astype(np.uint8).tobytes()
        if colorspace == "mono":
            continue
        u = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        v = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        for plane in (u, v):
            if sx > 1 or sy > 1:
                plane = plane.reshape(h // sy, sy, w // sx, sx).mean(axis=(1, 3))
            out += np.clip(np.rint(plane), 0, 255).astype(np.uint8).tobytes()
    return bytes(out)


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------


class ImageFeatureActor:
    """Actor-pool stage: decode + stats (+ optional resize emitting new
    bytes).  Columns in: (bytes, format); out adds decode_ok, width,
    height, mean_lum, std_lum [, bytes/format replaced by the resized
    PPM]."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 resize_to: tuple[int, int] | None = None):
        self.cfg = cfg or PipelineConfig()
        self.resize_to = resize_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        fmts = batch.column("format").to_pylist()
        ok, ws, hs, means, stds = [], [], [], [], []
        new_bytes, new_fmt = [], []
        for buf, fmt in zip(bufs, fmts):
            try:
                img = decode_image(buf or b"", fmt or "")
            except (ImageDecodeUnsupported, ValueError, IndexError,
                    MemoryError):
                # malformed headers can slip numeric errors past the format
                # checks; corrupt input must mark the row, never kill a task
                ok.append(False)
                ws.append(0)
                hs.append(0)
                means.append(0.0)
                stds.append(0.0)
                new_bytes.append(buf)
                new_fmt.append(fmt)
                continue
            ok.append(True)
            if self.resize_to is not None:
                img = resize_nearest(img, *self.resize_to)
                new_bytes.append(encode_ppm(img))
                new_fmt.append("ppm")
            else:
                new_bytes.append(buf)
                new_fmt.append(fmt)
            s = image_stats(img)
            ws.append(s["width"])
            hs.append(s["height"])
            means.append(s["mean_lum"])
            stds.append(s["std_lum"])
        names = batch.column_names
        batch = batch.set_column(names.index(self.cfg.bytes_col), self.cfg.bytes_col,
                                 pa.array(new_bytes, pa.binary()))
        batch = batch.set_column(names.index("format"), "format",
                                 pa.array(new_fmt, pa.string()))
        batch = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        batch = batch.append_column("width", pa.array(ws, pa.int32()))
        batch = batch.append_column("height", pa.array(hs, pa.int32()))
        batch = batch.append_column("mean_lum", pa.array(means, pa.float32()))
        return batch.append_column("std_lum", pa.array(stds, pa.float32()))


def image_features_stage(ds, cfg: PipelineConfig,
                         resize_to: tuple[int, int] | None = None,
                         concurrency: int | tuple[int, int] = 4):
    from .taskmap import stateless_map

    return stateless_map(ds, ImageFeatureActor, (cfg, resize_to),
                         batch_size=min(cfg.batch_size or 128, 128),
                         concurrency=concurrency)


def frame_sample_batch(batch: pa.Table, id_col: str, bytes_col: str,
                       every_k: int) -> pa.Table:
    """One videos batch → one sampled-frames batch (pure; shared by the
    distributed stage and the serial oracle path)."""
    ids_out, fidx, frames, ok = [], [], [], []
    for vid, buf in zip(batch.column(id_col).to_pylist(),
                        batch.column(bytes_col).to_pylist()):
        # buffer per video: a mid-stream truncation must not leave the
        # video both sampled AND marked failed — discard partial frames
        pend_i, pend_f = [], []
        try:
            for i, frame in enumerate(_iter_video_frames(buf or b"")):
                if i % every_k == 0:
                    pend_i.append(i)
                    pend_f.append(frame)
        except ImageDecodeUnsupported:
            ids_out.append(vid)
            fidx.append(-1)
            frames.append(b"")
            ok.append(False)
            continue
        ids_out.extend([vid] * len(pend_i))
        fidx.extend(pend_i)
        frames.extend(pend_f)
        ok.extend([True] * len(pend_i))
    return pa.table(
        {
            id_col: pa.array(ids_out, pa.string()),
            "frame_index": pa.array(fidx, pa.int32()),
            "bytes": pa.array(frames, pa.binary()),
            "decode_ok": pa.array(ok, pa.bool_()),
        }
    )


def frame_sample_stage(ds, cfg: PipelineConfig, every_k: int = 5,
                       concurrency: int | tuple[int, int] = 4):
    """Video frame sampling: one row per SAMPLED frame (flat-map shape) —
    (video_id, frame_index, bytes='ppm' frame).  Unsupported containers emit
    zero frames with a decode_ok=False marker row."""
    from .perplexity_stage import _adaptive_tasks

    id_col = cfg.id_col
    bytes_col = cfg.bytes_col

    return ds.map_batches(
        lambda b: frame_sample_batch(b, id_col, bytes_col, every_k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=min(cfg.batch_size or 32, 32),  # video rows are very wide
        concurrency=_adaptive_tasks(concurrency),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# perceptual-hash near-duplicate detection
# ---------------------------------------------------------------------------


class ImageHashActor:
    """Actor-pool stage: decode + 64-bit perceptual hash per image.

    Columns in: (id, bytes, format); out: (id, hash64:uint64,
    decode_ok:bool).  ``hash_kind`` picks ``dhash`` (integer-exact
    difference hash, the conformance default) or ``phash`` (DCT hash,
    robust to mild tonal edits).  Corrupt input marks the row
    (decode_ok=False, hash64=0), never kills the task — the near-dup
    caller filters the marks out before pair collection."""

    def __init__(self, cfg: PipelineConfig | None = None,
                 hash_kind: str = "dhash"):
        from ..functions import imagehash as ih

        self.cfg = cfg or PipelineConfig()
        if hash_kind not in ("dhash", "phash"):
            raise ValueError(f"unknown hash_kind {hash_kind!r}")
        self._hash = ih.dhash64 if hash_kind == "dhash" else ih.phash64

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        fmts = batch.column("format").to_pylist()
        ids = batch.column(self.cfg.id_col)
        ok, hashes = [], []
        for buf, fmt in zip(bufs, fmts):
            try:
                img = decode_image(buf or b"", fmt or "")
            except (ImageDecodeUnsupported, ValueError, IndexError,
                    MemoryError):
                ok.append(False)
                hashes.append(0)
                continue
            ok.append(True)
            hashes.append(self._hash(img))
        return pa.table({
            self.cfg.id_col: ids,
            "hash64": pa.array(np.asarray(hashes, dtype=np.uint64),
                               pa.uint64()),
            "decode_ok": pa.array(ok, pa.bool_()),
        })


def image_hash_stage(ds, cfg: PipelineConfig, hash_kind: str = "dhash",
                     concurrency: int | tuple[int, int] = 4):
    from .taskmap import stateless_map

    return stateless_map(ds, ImageHashActor, (cfg, hash_kind),
                         batch_size=min(cfg.batch_size or 128, 128),
                         concurrency=concurrency)


def image_near_dup_pairs(ds, cfg: PipelineConfig | None = None,
                         hash_kind: str = "dhash", max_hamming: int = 3,
                         concurrency: int | tuple[int, int] = 4):
    """Near-duplicate IMAGE pairs: perceptual 64-bit hash per image
    (actor-pool decode, functions/imagehash.py) -> the shared 4-chunk
    pigeonhole hamming LSH (stages/dedup.hamming64_pairs, exact for
    max_hamming <= 3).  The image near-dup analog of the text SimHash
    family and the acoustic-fingerprint audio family — re-encodes,
    tiny retouches and format conversions of the same picture collapse
    to pairs while payload bytes never shuffle (only (bucket, id,
    hash64) rows move).

    Returns (id_a, id_b, score=hamming distance) — feed into
    ``dup_connected_components`` / ``near_dedup`` exactly like the text
    pair families."""
    from .dedup import hamming64_pairs

    cfg = cfg or PipelineConfig()
    hashed = image_hash_stage(ds, cfg, hash_kind=hash_kind,
                              concurrency=concurrency)
    decoded = hashed.map_batches(
        lambda b: b.filter(b.column("decode_ok")),
        batch_format="pyarrow", zero_copy_batch=True,
    ).select_columns([cfg.id_col, "hash64"])
    return hamming64_pairs(decoded, id_col=cfg.id_col, hash_col="hash64",
                           max_hamming=max_hamming)


def scene_cut_stats(buf: bytes, min_abs_milli: int = 30_000,
                    rel_factor: int = 4) -> dict:
    """Scene-cut signals for one video container — the shot segmenter a
    video corpus pipeline runs before per-scene sampling/captioning: a
    CUT is an adjacent-frame mean-absolute-luma jump exceeding BOTH an
    absolute floor (``min_abs_milli`` milli-levels — compression breath
    and dither sit far below 30 levels) and ``rel_factor``× the median
    inter-frame difference (so slow pans with a high base motion level
    do not fire on every frame).  Luma = integer mean of R+G+B; all
    arithmetic exact integers (per-frame diff = 1000·SAD // n_pixels).
    Returns n_frames, n_cuts, first_cut_frame (-1 when none),
    max_diff_milli.  Raises ImageDecodeUnsupported for containers the
    iterator rejects (callers mark, never crash)."""
    prev = None
    diffs: list[int] = []
    n = 0
    for ppm in _iter_video_frames(buf or b""):
        rgb = decode_image(ppm, "ppm").astype(np.int64)
        luma = rgb.sum(axis=2)  # 3x luma, integer — scale cancels in SAD
        if prev is not None:
            sad = int(np.abs(luma - prev).sum())
            diffs.append(1000 * sad // (3 * luma.size))
        prev = luma
        n += 1
    out = {"n_frames": n, "n_cuts": 0, "first_cut_frame": -1,
           "max_diff_milli": 0}
    if not diffs:
        return out
    med = int(np.median(np.asarray(diffs, dtype=np.int64)))
    thr = max(min_abs_milli, rel_factor * med)
    cuts = [i + 1 for i, d in enumerate(diffs) if d >= thr]
    out["n_cuts"] = len(cuts)
    out["first_cut_frame"] = cuts[0] if cuts else -1
    out["max_diff_milli"] = max(diffs)
    return out


_SCENE_COLS = ("n_frames", "n_cuts", "first_cut_frame", "max_diff_milli")


class SceneCutActor:
    """Decode + scene-cut columns and the ``has_cuts`` flag (kernel:
    scene_cut_stats) — flags multi-shot videos for per-scene processing;
    single-shot clips skip the splitter.  Undecodable containers mark
    ``decode_ok=False`` and never flag."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column(self.cfg.bytes_col).to_pylist()
        ids = batch.column("clip_id")
        ok, flag = [], []
        cols: dict[str, list] = {k: [] for k in _SCENE_COLS}
        for buf in bufs:
            try:
                stats = scene_cut_stats(buf or b"")
                ok.append(True)
            except ImageDecodeUnsupported:
                stats = {"n_frames": 0, "n_cuts": 0,
                         "first_cut_frame": -1, "max_diff_milli": 0}
                ok.append(False)
            for k in _SCENE_COLS:
                cols[k].append(stats[k])
            flag.append(ok[-1] and stats["n_cuts"] > 0)
        out = pa.table({
            "clip_id": ids,
            "decode_ok": pa.array(ok, pa.bool_()),
            **{k: pa.array(cols[k], pa.int64()) for k in _SCENE_COLS},
            "has_cuts": pa.array(flag, pa.bool_()),
        })
        return out


def scene_cut_stage(ds, cfg: PipelineConfig,
                    concurrency: int | tuple[int, int] = 4):
    from .taskmap import stateless_map

    return stateless_map(ds, SceneCutActor, (cfg,),
                         batch_size=min(cfg.batch_size or 32, 32),
                         concurrency=concurrency)
