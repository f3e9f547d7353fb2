"""From-scratch baseline JPEG codec (functions/jpegdec.py): hermetic
encode→decode roundtrips (PSNR — JPEG is lossy), flat-block exactness,
marker/stream robustness, and the image-stage integration.  Correctness is
proven against the public T.81 spec + roundtrip (no libjpeg here;
documented in the module docstring)."""

import numpy as np
import pytest

from spiderray.functions import jpegdec as J


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h=40, w=56):
    y = np.arange(h)[:, None] * 3
    x = np.arange(w)[None, :] * 2
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = (y + x) % 256
    img[..., 1] = (2 * y) % 256
    img[..., 2] = (x * 3) % 256
    return img


class TestRoundtrip:
    def test_rgb_gradient_psnr(self):
        img = _gradient()
        for q in (75, 90, 95):
            out = J.decode_jpeg(J.encode_jpeg(img, quality=q))
            assert out.shape == img.shape
            assert _psnr(img, out) > 28 + q / 10, q

    def test_grayscale(self):
        img = ((np.arange(32)[:, None] * 7 + np.arange(48)[None, :] * 3) % 256).astype(np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(img, quality=92))
        assert out.shape == img.shape
        assert _psnr(img, out) > 35

    def test_flat_image_near_exact(self):
        img = np.full((24, 24, 3), 130, dtype=np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(img, quality=95))
        assert int(np.abs(out.astype(int) - 130).max()) <= 1

    def test_noise_image_decodes(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)  # non-multiple of 8
        out = J.decode_jpeg(J.encode_jpeg(img, quality=85))
        assert out.shape == img.shape
        assert _psnr(img, out) > 18  # noise is the worst case for DCT

    def test_smooth_photo_like(self):
        h, w = 64, 64
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            128 + 100 * np.sin(xx / 9.0) * np.cos(yy / 11.0),
            128 + 80 * np.cos(xx / 7.0),
            128 + 60 * np.sin((xx + yy) / 13.0),
        ], axis=-1).clip(0, 255).astype(np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(img, quality=90))
        assert _psnr(img, out) > 38


class TestRobustness:
    def test_not_jpeg(self):
        with pytest.raises(J.JpegUnsupported):
            J.decode_jpeg(b"\x89PNG\r\n\x1a\nxxxx")

    def test_truncation_rejected(self):
        buf = J.encode_jpeg(_gradient(), quality=80)
        for cut in (4, 30, len(buf) // 2):
            with pytest.raises((J.JpegError, J.JpegUnsupported)):
                J.decode_jpeg(buf[:cut])

    def test_progressive_marker_unsupported(self):
        buf = bytearray(J.encode_jpeg(_gradient(), quality=80))
        idx = buf.find(b"\xff\xc0")
        buf[idx + 1] = 0xC2  # claim SOF2 progressive
        with pytest.raises(J.JpegUnsupported, match="SOF2"):
            J.decode_jpeg(bytes(buf))

    def test_garbage_entropy_marked_not_crash(self):
        # image-stage contract: corrupt input marks the row, never raises out
        import pyarrow as pa

        from spiderray.config import PipelineConfig
        from spiderray.stages.image import ImageFeatureActor

        buf = bytearray(J.encode_jpeg(_gradient(), quality=80))
        buf[len(buf) // 2 :] = b"\x00" * (len(buf) - len(buf) // 2)
        batch = pa.table({
            "clip_id": ["bad"], "bytes": [bytes(buf)], "format": ["jpeg"],
        })
        out = ImageFeatureActor(PipelineConfig())(batch)
        assert out.column("decode_ok")[0].as_py() in (True, False)  # no crash


class TestStageIntegration:
    def test_jpeg_rows_now_decode(self, ray_session):
        """The q_image_features synthesis marks every 3rd row 'jpeg' — with
        the real decoder wired the stage must decode REAL jpeg bytes."""
        import pyarrow as pa

        from spiderray.config import PipelineConfig
        from spiderray.stages.image import ImageFeatureActor

        img = _gradient(24, 32)
        batch = pa.table({
            "clip_id": ["j1"], "bytes": [J.encode_jpeg(img, 90)], "format": ["jpeg"],
        })
        out = ImageFeatureActor(PipelineConfig())(batch)
        assert out.column("decode_ok")[0].as_py() is True
        assert out.column("width")[0].as_py() == 32
        assert out.column("height")[0].as_py() == 24
        lum = out.column("mean_lum")[0].as_py()
        exp = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]).mean()
        assert abs(lum - exp) < 4.0


class TestReviewR3Regressions:
    def test_sos_component_mismatch_marked_not_crash(self):
        """SOS selecting a component id absent from SOF must raise
        JpegError (not KeyError escaping every catch list — round-3 review
        finding)."""
        buf = bytearray(J.encode_jpeg(_gradient(), quality=80))
        idx = buf.find(b"\xff\xda")
        # SOS layout: marker(2) len(2) ns(1) then (id, tables) pairs
        buf[idx + 5] = 9  # component id 9 never declared in SOF
        with pytest.raises((J.JpegError, J.JpegUnsupported)):
            J.decode_jpeg(bytes(buf))
        from spiderray.stages.image import ImageDecodeUnsupported, decode_image

        with pytest.raises(ImageDecodeUnsupported):
            decode_image(bytes(buf), "jpeg")
