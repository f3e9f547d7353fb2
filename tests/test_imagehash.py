"""Perceptual image hashing + image near-dup pair collection.

The image analog of the SimHash near-dup family: integer-exact dHash /
DCT pHash (functions/imagehash.py) feeding the shared 4-chunk pigeonhole
hamming LSH (stages/dedup.hamming64_pairs).
"""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.config import PipelineConfig
from spiderray.functions.imagehash import (
    box_mean,
    dhash64,
    hamming64_u64,
    luma_u8,
    phash64,
)
from spiderray.stages.image import (
    ImageHashActor,
    encode_png,
    encode_ppm,
    image_near_dup_pairs,
)


def _rand_img(seed: int, h: int = 24, w: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)


def _perturb(img: np.ndarray) -> np.ndarray:
    dup = img.copy()
    for r, c in ((3, 5), (10, 20), (17, 9), (22, 30)):
        dup[r % dup.shape[0], c % dup.shape[1], 1] = min(
            int(dup[r % dup.shape[0], c % dup.shape[1], 1]) + 1, 255)
    return dup


class TestHashFunctions:
    def test_box_mean_matches_naive(self):
        rng = np.random.default_rng(7)
        for h, w, oh, ow in ((24, 32, 8, 9), (17, 13, 8, 9), (40, 40, 32, 32),
                             (9, 10, 8, 9)):
            g = rng.integers(0, 256, (h, w)).astype(np.int64)
            got = box_mean(g, oh, ow)
            rb = (np.arange(oh + 1) * h) // oh
            cb = (np.arange(ow + 1) * w) // ow
            naive = np.array(
                [[g[rb[r]:rb[r + 1], cb[c]:cb[c + 1]].sum()
                  // ((rb[r + 1] - rb[r]) * (cb[c + 1] - cb[c]))
                  for c in range(ow)] for r in range(oh)])
            assert (got == naive).all()

    def test_luma_range_and_gray_passthrough(self):
        img = _rand_img(1)
        lum = luma_u8(img)
        assert lum.min() >= 0 and lum.max() <= 255
        gray = np.full((8, 9), 42, dtype=np.uint8)
        assert (luma_u8(gray) == 42).all()

    def test_dhash_deterministic_and_discriminative(self):
        a = _rand_img(10)
        assert dhash64(a) == dhash64(a.copy())
        b = _rand_img(11)
        assert hamming64_u64(dhash64(a), dhash64(b)) > 10

    def test_planted_perturbation_within_pigeonhole_window(self):
        dists_d, dists_p = [], []
        for seed in range(60):
            img = _rand_img(seed)
            dup = _perturb(img)
            dists_d.append(hamming64_u64(dhash64(img), dhash64(dup)))
            dists_p.append(hamming64_u64(phash64(img), phash64(dup)))
        assert max(dists_d) <= 3
        assert max(dists_p) <= 3

    def test_tiny_image_upscale_path(self):
        tiny = _rand_img(5, h=4, w=3)
        h = dhash64(tiny)
        assert 0 <= h < 2 ** 64
        assert phash64(tiny) >= 0

    def test_png_reencode_is_hash_identical(self):
        from spiderray.stages.image import decode_image

        img = _rand_img(3)
        rt = decode_image(encode_png(img), "png")
        assert dhash64(rt) == dhash64(img)  # lossless → same pixels → same hash


class TestImageHashActor:
    def test_marks_corrupt_rows(self):
        img = _rand_img(2)
        good = encode_ppm(img)
        bad = encode_png(img)[:20]
        batch = pa.table({
            "clip_id": pa.array(["a", "b"], pa.string()),
            "bytes": pa.array([good, bad], pa.binary()),
            "format": pa.array(["ppm", "png"], pa.string()),
        })
        out = ImageHashActor(PipelineConfig())(batch)
        assert out.column("decode_ok").to_pylist() == [True, False]
        assert out.column("hash64").to_pylist()[0] == dhash64(img)

    def test_phash_kind(self):
        img = _rand_img(4)
        batch = pa.table({
            "clip_id": pa.array(["a"], pa.string()),
            "bytes": pa.array([encode_ppm(img)], pa.binary()),
            "format": pa.array(["ppm"], pa.string()),
        })
        out = ImageHashActor(PipelineConfig(), "phash")(batch)
        assert out.column("hash64").to_pylist()[0] == phash64(img)

    def test_bad_kind_raises(self):
        with pytest.raises(ValueError):
            ImageHashActor(PipelineConfig(), "ahash")


class TestImageNearDupPairs:
    def test_pairs_match_brute_force(self, ray_session):
        import ray.data as rd

        ids, bufs, fmts, hashes = [], [], [], {}
        for i in range(40):
            img = _rand_img(i)
            ids.append(2 * i)
            bufs.append(encode_ppm(img))
            fmts.append("ppm")
            hashes[2 * i] = dhash64(img)
            if i % 4 == 1:  # planted near-dup, PNG re-encode + retouch
                dup = _perturb(img)
                ids.append(2 * i + 1)
                bufs.append(encode_png(dup))
                fmts.append("png")
                hashes[2 * i + 1] = dhash64(dup)
            if i % 9 == 2:  # corrupt stratum
                ids.append(1000 + i)
                bufs.append(b"P6 garbage")
                fmts.append("ppm")
        ds = rd.from_arrow(pa.table({
            "img_id": pa.array(ids, pa.int64()),
            "bytes": pa.array(bufs, pa.binary()),
            "format": pa.array(fmts, pa.string()),
        }))
        cfg = PipelineConfig(id_col="img_id")
        pairs = image_near_dup_pairs(ds, cfg, max_hamming=3).to_pandas()
        got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))

        keys = sorted(hashes)
        want = {
            (a, b)
            for ai, a in enumerate(keys) for b in keys[ai + 1:]
            if hamming64_u64(hashes[a], hashes[b]) <= 3
        }
        assert got == want
        assert len(want) >= 8  # the planted dups are actually in there

    def test_max_hamming_guard(self, ray_session):
        import ray.data as rd

        from spiderray.stages.dedup import hamming64_pairs

        ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                     "sim": pa.array([0], pa.uint64())}))
        with pytest.raises(ValueError):
            hamming64_pairs(ds, max_hamming=4)


class TestPrepareImageCorpus:
    def _corpus(self):
        import ray.data as rd

        rows = []
        for i in range(30):
            img = _rand_img(i)
            rows.append({"img_id": 2 * i, "bytes": encode_ppm(img),
                         "format": "ppm"})
            if i % 5 == 1:  # planted near-dup: higher id loses
                rows.append({"img_id": 2 * i + 1,
                             "bytes": encode_png(_perturb(img)),
                             "format": "png"})
        rows.append({"img_id": 900, "bytes": b"corrupt", "format": "png"})
        blank = np.full((16, 16, 3), 7, dtype=np.uint8)
        rows.append({"img_id": 901, "bytes": encode_ppm(blank), "format": "ppm"})
        tiny = _rand_img(99, h=4, w=4)
        rows.append({"img_id": 902, "bytes": encode_ppm(tiny), "format": "ppm"})
        return rd.from_items(rows)

    def test_gates_and_dedup(self, ray_session):
        from spiderray.pipelines.prepare_image import prepare_image_corpus

        cfg = PipelineConfig(id_col="img_id")
        out = prepare_image_corpus(self._corpus(), cfg, min_w=8, min_h=8,
                                   min_std_lum=1.0).to_pandas()
        ids = set(out.img_id)
        assert {900, 901, 902}.isdisjoint(ids)       # corrupt/blank/tiny gone
        for i in range(30):
            if i % 5 == 1:
                assert 2 * i in ids and 2 * i + 1 not in ids  # min-id wins
            else:
                assert 2 * i in ids

    def test_resize_and_shards(self, ray_session, tmp_path):
        from spiderray.pipelines.prepare_image import prepare_image_corpus

        cfg = PipelineConfig(id_col="img_id")
        kept, manifest = prepare_image_corpus(
            self._corpus(), cfg, min_std_lum=1.0, resize_to=(10, 12),
            shards_dir=str(tmp_path / "shards"), n_shards=4)
        man = manifest.to_pandas()
        df = kept.to_pandas()
        assert (df.width == 12).all() and (df.height == 10).all()
        assert man.n_samples.sum() == len(df)
