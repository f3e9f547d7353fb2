"""GIF87a/89a codec (functions/gifdec.py) — LZW, interlace, disposal."""

import numpy as np
import pytest

from spiderray.functions.gifdec import (GifError, _lzw_decode, _lzw_encode,
                                        decode_gif, encode_gif)


def _pal_img(seed, h=20, w=31, n_colors=12):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, (h, w))]


class TestLzw:
    def test_roundtrip_random_indices(self):
        rng = np.random.default_rng(1)
        idx = rng.integers(0, 16, 10_000, dtype=np.uint8)
        dec = _lzw_decode(_lzw_encode(idx, 4), 4, len(idx))
        assert np.array_equal(dec, idx)

    def test_dictionary_reset_path(self):
        # long repetitive stream forces the 4096-entry reset
        idx = np.tile(np.arange(8, dtype=np.uint8), 20_000)
        dec = _lzw_decode(_lzw_encode(idx, 3), 3, len(idx))
        assert np.array_equal(dec, idx)

    def test_truncated_stream_refused(self):
        idx = np.arange(16, dtype=np.uint8)
        buf = _lzw_encode(idx, 4)
        with pytest.raises(GifError):
            _lzw_decode(buf[:2], 4, len(idx))


class TestGifContainer:
    def test_single_frame_lossless(self):
        img = _pal_img(2)
        dec = decode_gif(encode_gif([img]))
        assert len(dec) == 1 and np.array_equal(dec[0], img)

    def test_interlaced_lossless(self):
        img = _pal_img(3, h=29)  # odd height exercises all 4 passes
        dec = decode_gif(encode_gif([img], interlace_first=True))
        assert np.array_equal(dec[0], img)

    def test_animation_frames_compose(self):
        frames = [_pal_img(s, n_colors=6) for s in range(5)]
        dec = decode_gif(encode_gif(frames))
        assert len(dec) == 5
        for d, f in zip(dec, frames):
            assert np.array_equal(d, f)

    def test_too_many_colors_refused_on_encode(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        with pytest.raises(GifError, match="palette"):
            encode_gif([img])

    def test_corrupt_refused(self):
        buf = encode_gif([_pal_img(5)])
        with pytest.raises(GifError):
            decode_gif(buf[:15])
        with pytest.raises(GifError):
            decode_gif(b"NOTAGIF" + buf)

    def test_through_image_stage(self):
        from spiderray.config import PipelineConfig
        from spiderray.stages.image import ImageFeatureActor

        import pyarrow as pa
        img = _pal_img(6)
        batch = pa.table({
            "clip_id": ["a", "b"],
            "bytes": [encode_gif([img]), encode_gif([img])[:18]],
            "format": ["gif", "gif"],
        })
        out = ImageFeatureActor(PipelineConfig())(batch).to_pandas()
        assert bool(out.loc[0, "decode_ok"])
        assert (out.loc[0, "width"], out.loc[0, "height"]) == (31, 20)
        assert not bool(out.loc[1, "decode_ok"])

    def test_animated_through_frame_iterator(self):
        from spiderray.stages.image import _iter_video_frames

        frames = [np.full((8, 8, 3), c, np.uint8) for c in (10, 20, 30)]
        ppms = list(_iter_video_frames(encode_gif(frames)))
        assert len(ppms) == 3
        assert all(p.startswith(b"P6") for p in ppms)
