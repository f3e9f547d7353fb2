"""Document fingerprints: md5 content hash, rolling hash, char-shingle
MinHash signatures, 64-bit SimHash.  All pure-numpy/hashlib, deterministic,
seed-free (signature parameters are fixed constants so any worker computes
identical signatures — the property that makes the dedup shuffles correct).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def md5_fingerprint(text: str) -> str:
    """Exact-dedup key: md5 of the normalized text (lower + space-trim).
    Matches DuckDB ``md5(lower(trim(text)))`` exactly — DuckDB trim() strips
    only U+0020, so this uses strip(' '), not the wider Python strip()."""
    return hashlib.md5(text.strip(" ").lower().encode("utf-8")).hexdigest()


def rolling_hashes(text: str, k: int = 5, base: int = 257, mod: int = _MERSENNE) -> np.ndarray:
    """Rabin-Karp rolling hashes of all k-char shingles (uint64)."""
    if len(text) < k:
        return np.zeros(0, dtype=np.uint64)
    codes = np.frombuffer(text.encode("utf-32-le", "surrogatepass"), dtype=np.uint32)
    codes = codes.astype(object)  # python ints: exact mod arithmetic
    n = len(codes)
    out = np.empty(n - k + 1, dtype=np.uint64)
    h = 0
    top = pow(base, k - 1, mod)
    for i in range(k):
        h = (h * base + int(codes[i])) % mod
    out[0] = h & _MAX_HASH
    for i in range(1, n - k + 1):
        h = ((h - int(codes[i - 1]) * top) * base + int(codes[i + k - 1])) % mod
    # note: python % keeps result non-negative
        out[i] = h & _MAX_HASH
    return out


# fixed universal-hash parameters for MinHash permutations (num_perm x 2),
# generated once from a fixed seed and inlined as constants at import — every
# worker derives identical values, so signatures are globally comparable.
_PERM_RNG = np.random.default_rng(123456789)
NUM_PERM = 128
_PERM_A = (_PERM_RNG.integers(1, 1 << 62, size=NUM_PERM, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
_PERM_B = _PERM_RNG.integers(0, 1 << 63, size=NUM_PERM, dtype=np.uint64)
# kept for ngram-band minhash (object-int path used on tiny gram sets)
_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)
_FNV = np.uint64(1099511628211)


def window_hashes(t: str, k: int) -> np.ndarray:
    """Vectorized k-char window hashes of ``t`` AS-IS (no lowering/
    normalisation, no unique): one UTF-32 decode, k-term polynomial window
    hash mod 2^64, fmix64.  Returns len(t)-k+1 uint64 values — the fast
    kernel behind char_shingles and cdc_chunks."""
    if len(t) < k:
        return np.zeros(0, dtype=np.uint64)
    codes = np.frombuffer(t.encode("utf-32-le", "surrogatepass"), dtype=np.uint32).astype(np.uint64)
    n = len(codes) - k + 1
    mask64 = (1 << 64) - 1
    pows = np.array(
        [pow(int(_FNV), i, 1 << 64) & mask64 for i in range(k)], dtype=np.uint64
    )
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc += codes[j : j + n] * pows[k - 1 - j]
    acc ^= acc >> np.uint64(33)
    acc *= _MIX1
    acc ^= acc >> np.uint64(33)
    acc *= _MIX2
    acc ^= acc >> np.uint64(33)
    return acc


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of the k-char shingles of the lowered,
    whitespace-normalized text: normalise, then the shared window_hashes
    kernel, then unique.  (One kernel for both call sites — a divergence
    would silently break cross-path fingerprint comparability.)"""
    t = " ".join(text.lower().split())
    if len(t) < k:
        t = t.ljust(k)
    return np.unique(window_hashes(t, k))


def minhash_signature(text: str, k: int = 5, num_perm: int = NUM_PERM) -> np.ndarray:
    """MinHash signature (uint32[num_perm]) over k-char shingles.  Universal
    hash h_p(x) = (A_p * x + B_p) mod 2^64 >> 32 (A odd), vectorized as one
    (num_perm, n_shingles) uint64 broadcast."""
    sh = char_shingles(text, k)
    if len(sh) == 0:
        return np.zeros(num_perm, dtype=np.uint32)
    prod = _PERM_A[:num_perm, None] * sh[None, :] + _PERM_B[:num_perm, None]
    return (prod >> np.uint64(32)).min(axis=1).astype(np.uint32)


def minhash_signature_batch(
    texts: list[str],
    k: int = 5,
    num_perm: int = NUM_PERM,
    chunk_rows: int = 512,
    perm_chunk: int = 32,
) -> np.ndarray:
    """Batch MinHash: (n, num_perm) uint32, bit-identical per row to
    ``minhash_signature`` (property-tested).

    The per-row path recomputes the universal-hash broadcast for every
    shingle of every row; real corpora share most shingles across the rows
    of a batch, so this kernel hashes each UNIQUE shingle of a row-chunk
    ONCE — ``H[u, p] = (A_p * u + B_p) >> 32`` over ``np.unique`` of the
    chunk's concatenated shingles — then takes each row's signature as a
    gather + ``np.minimum.reduceat`` over its segment.  Work drops from
    O(sum_rows |shingles_row| x perm) multiplies to O(|unique| x perm).

    ``chunk_rows`` x ``perm_chunk`` bound the transient matrices (~tens of
    MB at defaults) so a fat Arrow block cannot blow a worker heap."""
    n = len(texts)
    out = np.zeros((n, num_perm), dtype=np.uint32)
    if n == 0:
        return out
    for s in range(0, n, chunk_rows):
        seg = [char_shingles(t or "", k) for t in texts[s : s + chunk_rows]]
        lens = np.fromiter((len(x) for x in seg), dtype=np.int64, count=len(seg))
        nz = np.nonzero(lens > 0)[0]
        if len(nz) == 0:
            continue
        cat = np.concatenate([seg[i] for i in nz])
        uniq, inv = np.unique(cat, return_inverse=True)
        bounds = np.zeros(len(nz), dtype=np.int64)
        np.cumsum(lens[nz][:-1], out=bounds[1:])
        for p0 in range(0, num_perm, perm_chunk):
            a = _PERM_A[p0 : p0 + perm_chunk]
            b = _PERM_B[p0 : p0 + perm_chunk]
            # uint64 wraparound arithmetic — identical to the per-row path
            h = ((uniq[:, None] * a[None, :] + b[None, :]) >> np.uint64(32)).astype(
                np.uint32
            )
            mins = np.minimum.reduceat(h[inv], bounds, axis=0)
            out[nz + s, p0 : p0 + perm_chunk] = mins
    return out


def minhash_bands(sig: np.ndarray, bands: int = 32) -> list[int]:
    """Split a signature into ``bands`` bands of r rows; hash each band →
    LSH bucket keys (ints).  Jaccard ~ (1/bands)^(1/r) collision threshold
    (b=32, r=4 → ~0.42)."""
    r = len(sig) // bands
    keys = []
    for b in range(bands):
        chunk = sig[b * r : (b + 1) * r].tobytes()
        h = int.from_bytes(hashlib.blake2b(chunk, digest_size=8).digest(), "big")
        keys.append(h & ((1 << 62) - 1))
    return keys


def minhash_band_matrix(sigs: np.ndarray, bands: int = 32) -> np.ndarray:
    """Vectorized band keys for a WHOLE BATCH of signatures: (n, num_perm)
    uint32 → (n, bands) int64 — an FNV fold of each band's r rows + fmix64,
    replacing per-row per-band blake2b calls.  Deterministic pure-numpy, so
    every worker derives identical keys (the LSH shuffle correctness
    property).  Key family differs from minhash_bands (blake2b), which is
    kept for single-row call sites."""
    n, perm = sigs.shape
    r = perm // bands
    M = sigs[:, : bands * r].reshape(n, bands, r).astype(np.uint64)
    acc = np.zeros((n, bands), dtype=np.uint64)
    for j in range(r):
        acc = acc * _FNV ^ M[:, :, j]
    acc ^= acc >> np.uint64(33)
    acc *= _MIX1
    acc ^= acc >> np.uint64(33)
    acc *= _MIX2
    acc ^= acc >> np.uint64(33)
    return (acc & np.uint64((1 << 62) - 1)).astype(np.int64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over shingle-hash sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def sig_jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    """MinHash estimate of Jaccard."""
    return float(np.mean(sa == sb))


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (weighted by count)."""
    tokens = text.lower().split()
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8)).astype(np.int64)
        acc += 2 * bits - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """Vectorized simhash64 over a batch: hash each UNIQUE token once
    (vocab ≪ token count on real text), unpack all bit rows in one
    np.unpackbits, then accumulate ±1 bit votes per row by fancy-indexed
    sum.  Identical output to simhash64 row-by-row (same per-token
    blake2b)."""
    token_lists = [t.lower().split() for t in texts]
    vocab: dict[str, int] = {}
    for toks in token_lists:
        for tok in toks:
            if tok not in vocab:
                vocab[tok] = len(vocab)
    if not vocab:
        return np.zeros(len(texts), dtype=np.uint64)
    hashes = np.empty(len(vocab), dtype=np.uint64)
    for tok, j in vocab.items():
        hashes[j] = np.uint64(
            int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        )
    # endian-explicit big-endian byte order: .view(np.uint8)[:, ::-1] would
    # only reconstruct MSB-first bytes on little-endian hosts, silently
    # splitting LSH bucket keys between this path and simhash64 elsewhere
    bits = np.unpackbits(hashes.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
    votes = (2 * bits.astype(np.int64) - 1)  # (vocab, 64) in msb-first order
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, toks in enumerate(token_lists):
        if not toks:
            continue
        idx = np.fromiter((vocab[t] for t in toks), dtype=np.int64, count=len(toks))
        acc = votes[idx].sum(axis=0)
        h = np.uint64(0)
        bitvals = (acc > 0)
        # msb-first: bit position 63-i for column i (matches simhash64)
        h = np.packbits(bitvals.astype(np.uint8)).view(">u8")[0] if len(bitvals) == 64 else 0
        out[i] = np.uint64(h)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_chunks(h: int, n_chunks: int = 4) -> list[int]:
    """Split a 64-bit simhash into n 16-bit chunks: two near-dup docs within
    hamming distance < n_chunks share at least one identical chunk
    (pigeonhole) → chunk value is the LSH bucket key."""
    w = 64 // n_chunks
    mask = (1 << w) - 1
    return [(h >> (w * i)) & mask for i in range(n_chunks)]


def ngram_set(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram hash set (for n-gram Jaccard dedup)."""
    words = text.lower().split()
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    out = np.unique(
        np.array(
            [
                int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
                for g in grams
            ],
            dtype=np.uint64,
        )
    ) if grams else np.zeros(0, dtype=np.uint64)
    return out


def ngram_seq(text: str, n: int = 3) -> np.ndarray:
    """POSITIONAL word n-gram hashes: entry i = hash of ``words[i:i+n]``
    (same lowercasing + blake2b-8 as ``ngram_set``, WITHOUT dedup) — the
    span-locating companion used by ``decontaminate_spans``.  A document
    shorter than ``n`` words yields one whole-text gram at position 0."""
    words = text.lower().split()
    if not words:
        return np.zeros(0, dtype=np.uint64)
    if len(words) < n:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i: i + n]) for i in range(len(words) - n + 1)]
    return np.array(
        [int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                        "big") for g in grams],
        dtype=np.uint64,
    )


def cdc_chunks(
    text: str,
    window: int = 16,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> list[str]:
    """Content-defined chunking: split ``text`` at positions where the
    rolling hash of the trailing ``window`` chars satisfies
    ``hash % avg_size == 0`` (expected chunk length ≈ avg_size), bounded by
    [min_size, max_size].  Content-defined boundaries survive insertions —
    an edit changes only the chunks it touches, which is the whole point for
    sub-document dedup (fixed-size chunking would shift every boundary).
    Returns the chunk STRINGS (callers fingerprint them)."""
    n = len(text)
    if n == 0:
        return []
    if n <= min_size:
        return [text]
    # vectorized: all window hashes at once, then walk only the CANDIDATE
    # boundary positions (expected n/avg_size of them) applying min/max
    hashes = window_hashes(text, window)
    cand = np.nonzero(hashes % np.uint64(avg_size) == 0)[0] + (window - 1)
    chunks = []
    start = 0
    ci = 0
    while start < n:
        lo = start + min_size
        hard_max = start + max_size - 1
        # first candidate boundary position >= lo
        ci = int(np.searchsorted(cand, lo, side="left"))
        if ci < len(cand) and cand[ci] <= hard_max and cand[ci] < n - 1:
            end = int(cand[ci])
        else:
            end = min(hard_max, n - 1)
        chunks.append(text[start : end + 1])
        start = end + 1
    return chunks
