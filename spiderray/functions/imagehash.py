"""Perceptual image hashes for near-duplicate image detection.

Two public 64-bit hashes over decoded RGB frames:

- ``dhash64`` — difference hash (Krawetz, "Kind of Like That", 2013):
  integer BT.601 luma, EXACT box-mean downsample to 8 rows x 9 cols
  (integral-image sums, integer division), bit ``r*8+c`` set iff
  ``g[r, c] < g[r, c+1]``.  Every operation is integer arithmetic, so the
  hash is bit-deterministic across runs, processes and partitionings —
  the property the distributed pair machinery and the serial twin both
  rely on.
- ``phash64`` — DCT hash (Zauner, "Implementation and Benchmarking of
  Perceptual Image Hash Functions", 2010): luma -> exact 32x32 box mean
  -> float64 2-D DCT-II (explicit cosine-matrix products) -> the top-left
  8x8 low-frequency block compared against its median.

Near-dup role mirrors the text side's SimHash (stages/dedup.simhash_pairs):
hashes within hamming distance <= 3 are collected exactly by the 4-chunk
pigeonhole LSH (``stages.dedup.hamming64_pairs``).  The reference repo has
no image pipeline — this extends the engine's multimodal dedup families
(SURVEY.md "beyond the reference" scope) alongside the acoustic
fingerprint near-dup (stages/audiodedup.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["luma_u8", "box_mean", "dhash64", "phash64", "hamming64_u64"]


def luma_u8(img: np.ndarray) -> np.ndarray:
    """Integer BT.601 luma of an (h, w, 3) uint8 image -> (h, w) int64.

    Weights (77, 150, 29) sum to 256, so ``>> 8`` keeps the result in
    [0, 255] with pure integer arithmetic (no float rounding to diverge
    between hosts)."""
    if img.ndim == 2:  # already grayscale
        return img.astype(np.int64)
    r = img[..., 0].astype(np.int64)
    g = img[..., 1].astype(np.int64)
    b = img[..., 2].astype(np.int64)
    return (77 * r + 150 * g + 29 * b) >> 8


def box_mean(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact area box-mean downsample of an integer image to (out_h, out_w).

    Box boundaries are ``floor(k * H / out_h)`` so every source pixel lands
    in exactly one box; sums come from an int64 integral image and the mean
    is floor division — fully deterministic.  Upscaling (H < out_h) still
    works: empty boxes cannot occur because boundaries are strictly
    monotone only when H >= out_h, so tiny inputs are first pixel-repeated
    up to the target grid."""
    h, w = gray.shape
    if h < out_h or w < out_w:
        gray = np.repeat(np.repeat(gray, (out_h + h - 1) // h, axis=0),
                         (out_w + w - 1) // w, axis=1)
        h, w = gray.shape
    rb = (np.arange(out_h + 1, dtype=np.int64) * h) // out_h
    cb = (np.arange(out_w + 1, dtype=np.int64) * w) // out_w
    integ = np.zeros((h + 1, w + 1), dtype=np.int64)
    integ[1:, 1:] = gray.astype(np.int64).cumsum(axis=0).cumsum(axis=1)
    sums = (integ[rb[1:, None], cb[None, 1:]]
            - integ[rb[:-1, None], cb[None, 1:]]
            - integ[rb[1:, None], cb[None, :-1]]
            + integ[rb[:-1, None], cb[None, :-1]])
    counts = (rb[1:, None] - rb[:-1, None]) * (cb[None, 1:] - cb[None, :-1])
    return sums // counts


_BIT_WEIGHTS = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(8, 8)


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash of an (h, w, 3) uint8 (or 2-D grayscale)
    image.  Integer-exact end to end."""
    g = box_mean(luma_u8(img), 8, 9)
    bits = (g[:, :-1] < g[:, 1:]).astype(np.uint64)
    return int((bits * _BIT_WEIGHTS).sum(dtype=np.uint64))


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


_DCT32 = _dct_matrix(32)


def phash64(img: np.ndarray) -> int:
    """64-bit DCT hash: 32x32 luma box mean -> orthonormal 2-D DCT-II ->
    top-left 8x8 block (including DC, matching the widely-used imagehash
    convention) compared against its median.  Float64 throughout; the
    explicit matrix products make the reduction order fixed, so results
    are deterministic for a given BLAS."""
    g = box_mean(luma_u8(img), 32, 32).astype(np.float64)
    d = _DCT32 @ g @ _DCT32.T
    blk = d[:8, :8]
    med = np.median(blk)
    bits = (blk > med).astype(np.uint64)
    return int((bits * _BIT_WEIGHTS).sum(dtype=np.uint64))


def hamming64_u64(a: int, b: int) -> int:
    """Popcount of ``a ^ b`` for two 64-bit hashes (serial-oracle helper)."""
    return bin(int(a) ^ int(b)).count("1")
