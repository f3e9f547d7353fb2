"""Image/video multimodal plumbing (stages/image.py): real PPM/PGM/BMP
decodes, vectorized resize, toy-container frame sampling, stub path."""

import numpy as np
import pytest

from spiderray.stages import image as im


def _grad_img(h=40, w=60):
    y = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    x = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = y
    img[..., 1] = x
    img[..., 2] = 128
    return img


def _bmp_bytes(img):
    """Minimal bottom-up 24-bit BMP writer (test-only)."""
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    data = bytearray()
    for r in range(h - 1, -1, -1):
        row = img[r][:, ::-1].tobytes()  # RGB → BGR
        data += row + b"\x00" * (row_bytes - len(row))
    header_size = 14 + 40
    total = header_size + len(data)
    out = bytearray(b"BM")
    out += total.to_bytes(4, "little") + b"\x00\x00\x00\x00"
    out += header_size.to_bytes(4, "little")
    out += (40).to_bytes(4, "little")
    out += w.to_bytes(4, "little") + h.to_bytes(4, "little")
    out += (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
    out += (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
    out += b"\x00" * 16
    return bytes(out) + bytes(data)


class TestDecoders:
    def test_ppm_roundtrip(self):
        img = _grad_img()
        dec = im.decode_image(im.encode_ppm(img), "ppm")
        assert (dec == img).all()

    def test_ppm_with_comment(self):
        img = _grad_img(4, 4)
        raw = im.encode_ppm(img)
        commented = raw[:3] + b"# a comment\n" + raw[3:]
        assert (im.decode_image(commented, "ppm") == img).all()

    def test_pgm_gray(self):
        gray = np.arange(0, 250, 10, dtype=np.uint8).reshape(5, 5)
        buf = b"P5\n5 5\n255\n" + gray.tobytes()
        dec = im.decode_image(buf, "pgm")
        assert dec.shape == (5, 5, 3)
        assert (dec[..., 0] == gray).all() and (dec[..., 1] == gray).all()

    def test_bmp_roundtrip(self):
        img = _grad_img(10, 7)  # odd width exercises row padding
        dec = im.decode_image(_bmp_bytes(img), "bmp")
        assert (dec == img).all()

    def test_stub_formats(self):
        for fmt in ("jpeg", "webp", ""):
            with pytest.raises(im.ImageDecodeUnsupported):
                im.decode_image(b"\xff\xd8\xff", fmt)

    def test_resize(self):
        img = _grad_img(40, 60)
        small = im.resize_nearest(img, 10, 15)
        assert small.shape == (10, 15, 3)
        assert (small[0, 0] == img[0, 0]).all()
        assert small[..., 2].min() == small[..., 2].max() == 128  # flat plane survives


class TestImageStageRay:
    def test_features_and_resize(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig

        img = _grad_img()
        rows = [
            {"clip_id": "ok", "bytes": im.encode_ppm(img), "format": "ppm"},
            {"clip_id": "stub", "bytes": b"\x89PNG", "format": "png"},
        ]
        out = im.image_features_stage(
            rd.from_items(rows), PipelineConfig(), resize_to=(8, 12), concurrency=1
        ).to_pandas().set_index("clip_id")
        assert bool(out.loc["ok", "decode_ok"])
        # stats are computed on the RESIZED image (8x12)
        assert out.loc["ok", "width"] == 12 and out.loc["ok", "height"] == 8
        dec = im.decode_image(out.loc["ok", "bytes"], "ppm")
        assert dec.shape == (8, 12, 3)
        assert not bool(out.loc["stub", "decode_ok"])
        assert out.loc["stub", "bytes"] == b"\x89PNG"  # untouched passthrough

    def test_frame_sampling(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig

        frames = [_grad_img(6, 6) + i for i in range(12)]
        video = im.encode_rawv([f.astype(np.uint8) for f in frames])
        rows = [
            {"clip_id": "v1", "bytes": video},
            {"clip_id": "bad", "bytes": b"not a video"},
        ]
        out = im.frame_sample_stage(
            rd.from_items(rows), PipelineConfig(), every_k=5, concurrency=1
        ).to_pandas()
        v1 = out[out.clip_id == "v1"]
        assert v1.frame_index.tolist() == [0, 5, 10]
        f0 = im.decode_image(v1.iloc[0]["bytes"], "ppm")
        assert f0.shape == (6, 6, 3)
        bad = out[out.clip_id == "bad"]
        assert len(bad) == 1 and not bool(bad.iloc[0]["decode_ok"])


class TestImageRobustness:
    def test_truncated_and_garbage_mark_not_crash(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig

        rows = [
            {"clip_id": "trunc", "bytes": b"P6\n100 100\n255\n\x00\x01", "format": "ppm"},
            {"clip_id": "empty", "bytes": b"", "format": "ppm"},
            {"clip_id": "badhdr", "bytes": b"P6\nxx yy\n255\n", "format": "ppm"},
        ]
        out = im.image_features_stage(
            rd.from_items(rows), PipelineConfig(), concurrency=1
        ).to_pandas()
        assert not out.decode_ok.any()
        assert (out.width == 0).all()

    def test_zero_frame_video(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig

        out = im.frame_sample_stage(
            rd.from_items([{"clip_id": "v0", "bytes": im.encode_rawv([])}]),
            PipelineConfig(), every_k=2, concurrency=1,
        ).to_pandas()
        assert len(out) == 0


class TestPng:
    def test_rgb_roundtrip(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(30, 45, 3)).astype(np.uint8)
        assert (im.decode_image(im.encode_png(img), "png") == img).all()

    def test_gray_and_alpha_channels(self):
        import struct
        import zlib

        def make(color_type, channels, w=6, h=4):
            rng = np.random.default_rng(color_type)
            px = rng.integers(0, 256, size=(h, w, channels)).astype(np.uint8)
            raw = bytearray()
            for r in range(h):
                raw.append(0)
                raw += px[r].tobytes()
            def chunk(ctype, data):
                return (len(data).to_bytes(4, "big") + ctype + data
                        + zlib.crc32(ctype + data).to_bytes(4, "big"))
            ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
            buf = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
            return px, buf

        px, buf = make(0, 1)  # gray
        dec = im.decode_image(buf, "png")
        assert (dec[..., 0] == px[..., 0]).all() and dec.shape[2] == 3
        px, buf = make(6, 4)  # RGBA → alpha dropped
        dec = im.decode_image(buf, "png")
        assert (dec == px[..., :3]).all()
        px, buf = make(4, 2)  # gray+alpha
        dec = im.decode_image(buf, "png")
        assert (dec[..., 0] == px[..., 0]).all()

    def test_unsupported_variants(self):
        import struct
        import zlib

        def ihdr_only(bit_depth=8, color_type=3, interlace=0):
            def chunk(ctype, data):
                return (len(data).to_bytes(4, "big") + ctype + data
                        + zlib.crc32(ctype + data).to_bytes(4, "big"))
            ihdr = struct.pack(">IIBBBBB", 4, 4, bit_depth, color_type, 0, 0, interlace)
            return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")

        for buf in (ihdr_only(color_type=3), ihdr_only(bit_depth=16),
                    ihdr_only(interlace=1), b"\x89PNG\r\n\x1a\n", b"not png"):
            with pytest.raises(im.ImageDecodeUnsupported):
                im.decode_image(buf, "png")

    def test_truncated_idat(self):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        enc = bytearray(im.encode_png(img))
        with pytest.raises(im.ImageDecodeUnsupported):
            im.decode_image(bytes(enc[:40]), "png")


def _png_with_filters(img, ftypes):
    """Spec-filtered PNG writer (test-only): encodes each row with the
    requested filter so decode exercises Sub/Up/Average/Paeth for real."""
    import struct
    import zlib

    h, w = img.shape[:2]
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.int32)
    for r in range(h):
        ftype = ftypes[r % len(ftypes)]
        cur = img[r].reshape(-1).astype(np.int32)
        row = np.zeros(w * 3, dtype=np.int32)
        for i in range(w * 3):
            left = cur[i - 3] if i >= 3 else 0
            up = prev[i]
            ul = prev[i - 3] if i >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                pp = left + up - ul
                pa_, pb, pc_ = abs(pp - left), abs(pp - up), abs(pp - ul)
                pred = left if (pa_ <= pb and pa_ <= pc_) else (up if pb <= pc_ else ul)
            row[i] = (cur[i] - pred) & 0xFF
        raw.append(ftype)
        raw += row.astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype, data):
        return (len(data).to_bytes(4, "big") + ctype + data
                + zlib.crc32(ctype + data).to_bytes(4, "big"))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


class TestPngFilters:
    def test_all_five_filters_exact(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, size=(25, 33, 3)).astype(np.uint8)
        for ftypes in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            dec = im.decode_image(_png_with_filters(img, ftypes), "png")
            assert (dec == img).all(), ftypes

    def test_malformed_ihdr_marks_row(self, ray_session):
        import struct
        import zlib

        import ray.data as rd

        from spiderray.config import PipelineConfig

        def chunk(ctype, data):
            return (len(data).to_bytes(4, "big") + ctype + data
                    + zlib.crc32(ctype + data).to_bytes(4, "big"))

        bad = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", b"\x00" * 10) + chunk(b"IEND", b"")
        out = im.image_features_stage(
            rd.from_items([{"clip_id": "x", "bytes": bad, "format": "png"}]),
            PipelineConfig(), concurrency=1,
        ).to_pandas()
        assert not bool(out.decode_ok[0])

    def test_decompression_bomb_bounded(self):
        import struct
        import zlib

        def chunk(ctype, data):
            return (len(data).to_bytes(4, "big") + ctype + data
                    + zlib.crc32(ctype + data).to_bytes(4, "big"))

        # 4x4 image whose IDAT inflates to 100 MB of zeros
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
        bomb = zlib.compress(b"\x00" * (100 * 1024 * 1024))
        buf = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
        with pytest.raises(im.ImageDecodeUnsupported):
            im.decode_image(buf, "png")


class TestVideoPartialTruncation:
    def test_truncated_video_yields_only_marker(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig

        frames = [np.full((4, 4, 3), i, np.uint8) for i in range(8)]
        video = im.encode_rawv(frames)
        truncated = video[: len(video) - 30]  # cut inside the last frames
        out = im.frame_sample_stage(
            rd.from_items([{"clip_id": "t", "bytes": truncated}]),
            PipelineConfig(), every_k=2, concurrency=1,
        ).to_pandas()
        # either all-good (truncation after the needed frames) or ONLY the
        # failure marker — never both sampled rows and a failure row
        if (~out.decode_ok).any():
            assert len(out) == 1 and out.frame_index[0] == -1


class TestY4M:
    """YUV4MPEG2 — the real public uncompressed video format (mjpegtools /
    `ffmpeg -f yuv4mpeg`): header parse, FRAME iteration, YUV→RGB, chroma
    subsampling, and the uniform _iter_video_frames dispatch."""

    def _frames(self, n=5, h=16, w=24):
        rng = np.random.default_rng(7)
        return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                for _ in range(n)]

    def test_roundtrip_every_colorspace(self):
        frames = self._frames()
        for cs in ("420jpeg", "420", "420mpeg2", "420paldv", "422", "444",
                   "mono"):
            dec = list(im._iter_y4m_frames(im.encode_y4m(frames, colorspace=cs)))
            assert len(dec) == len(frames), cs
            assert dec[0].shape == (16, 24, 3), cs

    def test_444_is_rounding_exact(self):
        # no subsampling: the only loss is the forward+inverse BT.601
        # rounding, which is bounded by 1 count per channel
        frames = self._frames()
        dec = list(im._iter_y4m_frames(im.encode_y4m(frames, colorspace="444")))
        for d, f in zip(dec, frames):
            assert np.abs(d.astype(int) - f.astype(int)).max() <= 1

    def test_gray_frames_bit_exact(self):
        # R=G=B ⇒ U=V=128 and Y=R exactly, in every colorspace
        frames = [np.full((8, 8, 3), v, np.uint8) for v in (0, 17, 128, 255)]
        for cs in ("420jpeg", "422", "444", "mono"):
            dec = list(im._iter_y4m_frames(im.encode_y4m(frames, colorspace=cs)))
            for d, f in zip(dec, frames):
                assert (d == f).all(), cs

    def test_header_extras_ignored(self):
        # interlace/aspect/extension tags and FRAME params are legal noise
        buf = im.encode_y4m([np.full((4, 4, 3), 9, np.uint8)], colorspace="444")
        buf = buf.replace(b" Ip A1:1 ", b" Ip A4:3 Xcustom ", 1)
        buf = buf.replace(b"FRAME\n", b"FRAME Ix\n", 1)
        dec = list(im._iter_y4m_frames(buf))
        assert len(dec) == 1 and (dec[0] == 9).all()

    def test_corrupt_streams_raise(self):
        ok = im.encode_y4m([np.full((8, 8, 3), 1, np.uint8)], colorspace="444")
        bad = [
            b"YUV4MPEG3" + ok[9:],                     # wrong magic
            ok[:-10],                                   # truncated payload
            ok.replace(b"C444", b"C999"),               # unknown colorspace
            ok.replace(b"W8", b"W0"),                   # zero width
            ok.replace(b"W8", b"W99999999"),            # pixel-count bomb
            ok.replace(b"F25:1", b"F0:1"),              # bad frame rate
            ok.replace(b"FRAME", b"FRAMX"),             # bad frame marker
            b"YUV4MPEG2 W8 H7 C420\n" + b"\0" * 84,     # odd dims for 4:2:0
            b"YUV4MPEG2 W8 H8 C444" + b" " * 5000,      # unterminated header
        ]
        for buf in bad:
            with pytest.raises(im.ImageDecodeUnsupported):
                list(im._iter_y4m_frames(buf))

    def test_dispatch_and_sampling_stage(self, ray_session):
        import ray.data as rd

        from spiderray.config import PipelineConfig

        frames = [np.full((6, 6, 3), 10 * i, np.uint8) for i in range(12)]
        rows = [
            {"clip_id": "y4m", "bytes": im.encode_y4m(frames)},
            {"clip_id": "rawv", "bytes": im.encode_rawv(frames)},
            {"clip_id": "junk", "bytes": b"YUV4MPEG2 W6 H6 C420\nFRAME"},
        ]
        out = im.frame_sample_stage(
            rd.from_items(rows), PipelineConfig(), every_k=5, concurrency=1
        ).to_pandas()
        for cid in ("y4m", "rawv"):
            part = out[out.clip_id == cid]
            assert part.frame_index.tolist() == [0, 5, 10], cid
            # gray frames: both containers decode to identical PPM bytes
            f5 = part[part.frame_index == 5].iloc[0]["bytes"]
            assert (im.decode_image(f5, "ppm") == 50).all(), cid
        junk = out[out.clip_id == "junk"]
        assert len(junk) == 1 and not bool(junk.iloc[0]["decode_ok"])


class TestPngExtendedSubset:
    """Palette / sub-8-bit / 16-bit PNG decode, hermetically built chunks
    (independent of encode_png — a differential against the spec layout)."""

    @staticmethod
    def _chunk(ctype, data):
        import struct
        import zlib

        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    @classmethod
    def _png(cls, w, h, depth, ct, raw_rows, plte=None):
        import struct
        import zlib

        out = (b"\x89PNG\r\n\x1a\n"
               + cls._chunk(b"IHDR",
                            struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, 0)))
        if plte is not None:
            out += cls._chunk(b"PLTE", plte.tobytes())
        return (out + cls._chunk(b"IDAT", zlib.compress(raw_rows))
                + cls._chunk(b"IEND", b""))

    def test_palette_8bit(self):
        import numpy as np

        from spiderray.stages.image import decode_image

        rng = np.random.default_rng(0)
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        idx = rng.integers(0, 16, (5, 7)).astype(np.uint8)
        raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(5))
        img = decode_image(self._png(7, 5, 8, 3, raw, pal), "png")
        assert (img == pal[idx]).all()

    def test_palette_4bit_packed(self):
        import numpy as np

        from spiderray.stages.image import decode_image

        rng = np.random.default_rng(1)
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        idx = rng.integers(0, 16, (3, 5)).astype(np.uint8)
        rows = []
        for r in range(3):
            b_ = bytearray()
            for i in range(0, 5, 2):
                lo = idx[r, i + 1] if i + 1 < 5 else 0
                b_.append((idx[r, i] << 4) | lo)
            rows.append(b"\x00" + bytes(b_))
        img = decode_image(self._png(5, 3, 4, 3, b"".join(rows), pal), "png")
        assert (img == pal[idx]).all()

    def test_gray_1bit_scales_to_255(self):
        import numpy as np

        from spiderray.stages.image import decode_image

        g1 = np.array([[1, 0, 1, 0, 1, 1, 0, 0, 1], [0] * 9], dtype=np.uint8)
        raw = b"".join(b"\x00" + np.packbits(g1[r]).tobytes() for r in range(2))
        img = decode_image(self._png(9, 2, 1, 0, raw), "png")
        assert (img[..., 0] == g1 * 255).all()

    def test_16bit_high_byte(self):
        from spiderray.stages.image import decode_image

        img = decode_image(self._png(4, 1, 16, 0, b"\x00" + b"\xab\xcd" * 4),
                           "png")
        assert (img == 0xAB).all()
        rgb = decode_image(
            self._png(2, 1, 16, 2,
                      b"\x00" + b"\x11\x00\x22\x00\x33\x00" * 2), "png")
        assert (rgb[0, 0] == [0x11, 0x22, 0x33]).all()

    def test_palette_index_out_of_range_raises(self):
        import numpy as np
        import pytest

        from spiderray.stages.image import ImageDecodeUnsupported, decode_image

        pal = np.zeros((4, 3), dtype=np.uint8)
        with pytest.raises(ImageDecodeUnsupported):
            decode_image(self._png(3, 1, 8, 3, b"\x00" + bytes([200] * 3),
                                   pal), "png")

    def test_missing_plte_raises(self):
        import pytest

        from spiderray.stages.image import ImageDecodeUnsupported, decode_image

        with pytest.raises(ImageDecodeUnsupported):
            decode_image(self._png(3, 1, 8, 3, b"\x00\x00\x01\x02"), "png")


class TestSceneCuts:
    def test_planted_cuts_and_guards(self):
        import numpy as np

        from spiderray.stages.image import (
            encode_rawv,
            scene_cut_stats,
        )

        def vid(bases, dither=0):
            frames = []
            for f, b in enumerate(bases):
                val = (b + (f % 3 - 1) * dither) % 256
                frames.append(np.full((8, 8, 3), val, dtype=np.uint8))
            return encode_rawv(frames)

        # two hard cuts
        s = scene_cut_stats(vid([30] * 4 + [140] * 4 + [250] * 4))
        assert s["n_cuts"] == 2 and s["first_cut_frame"] == 4
        # slow pan: every diff equals the median -> relative guard holds
        s = scene_cut_stats(vid(list(range(40, 40 + 12 * 3, 3))))
        assert s["n_cuts"] == 0
        # static with dither: below the absolute floor
        s = scene_cut_stats(vid([128] * 12, dither=2))
        assert s["n_cuts"] == 0
        # single frame: no diffs at all
        s = scene_cut_stats(vid([99]))
        assert s["n_frames"] == 1 and s["n_cuts"] == 0

    def test_stage_marks_truncated(self, ray_session):
        import numpy as np
        import ray.data as rd

        from spiderray.config import PipelineConfig
        from spiderray.stages.image import encode_rawv, scene_cut_stage

        frames = [np.full((8, 8, 3), v, dtype=np.uint8)
                  for v in (10, 10, 200, 200)]
        good = encode_rawv(frames)
        import pyarrow as pa

        t = pa.table({
            "clip_id": pa.array(["ok", "trunc"], pa.string()),
            "bytes": pa.array([good, good[: len(good) // 2]], pa.binary()),
        })
        out = (scene_cut_stage(rd.from_arrow(t), PipelineConfig(),
                               concurrency=1)
               .to_pandas().set_index("clip_id"))
        assert bool(out.loc["ok"].has_cuts)
        assert int(out.loc["ok"].n_cuts) == 1
        assert not bool(out.loc["trunc"].decode_ok)
        assert not bool(out.loc["trunc"].has_cuts)
