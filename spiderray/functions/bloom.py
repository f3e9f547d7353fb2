"""Vectorized Bloom filter (numpy bit array, splitmix64 double hashing).

Role in the engine: a BROADCAST PRE-FILTER, never the authority.  A Bloom
'no' is definitive (the key was never added); a Bloom 'yes' may be a false
positive, so exact semantics route Bloom-positives through the exact check
(join / set probe) and let Bloom-negatives skip it.  For the cross-run
dedup shape this shrinks the anti-join's left side to ~the duplicate rate:
at a 1% dup rate, 99% of rows never pay the shuffle.

Memory: bits = n * bits_per_key / 8 bytes — 10 bits/key ≈ 1% FP rate, so
1e9 prior keys fit in ~1.2 GB vs ~50 GB of raw md5 strings in a set.
"""

from __future__ import annotations

import hashlib

import numpy as np

_SPLIT1 = np.uint64(0x9E3779B97F4A7C15)
_SPLIT2 = np.uint64(0xBF58476D1CE4E5B9)
_SPLIT3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _SPLIT1).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _SPLIT2
    x ^= x >> np.uint64(27)
    x *= _SPLIT3
    x ^= x >> np.uint64(31)
    return x


def _key_hashes(keys) -> np.ndarray:
    """uint64 base hashes for arbitrary keys (str/int/bytes).

    Bulk fast paths (the 1e9-key build must not loop in Python):
      * all-32-hex strings (md5 fingerprints): one ``bytes.fromhex`` over
        the joined column → uint64 pairs → fold — fully vectorized
      * integers: direct uint64 view
    Mixed/other keys fall back to per-key blake2b."""
    n = len(keys)
    first = keys[0] if n else 0
    if (
        n
        and isinstance(first, str)
        and len(first) == 32
        # EVERY key must be a 32-char string: a total-length check alone
        # (len(blob) == n*16) accepts mixed 16/48-char batches whose join
        # happens to sum right, misaligning the reshape so a key's hash
        # depends on batch composition — a Bloom false-negative vector.
        and all(isinstance(k, str) and len(k) == 32 for k in keys)
    ):
        try:
            blob = bytes.fromhex("".join(keys))
            if len(blob) == n * 16:
                pair = np.frombuffer(blob, dtype=">u8").reshape(n, 2)
                return _splitmix64(pair[:, 0] ^ pair[:, 1])
        except (ValueError, TypeError):
            pass  # not uniformly hex → slow path
    if n and isinstance(first, (int, np.integer)):
        try:
            arr = np.asarray(keys, dtype=np.uint64)
            return _splitmix64(arr)
        except (ValueError, TypeError, OverflowError):
            pass
    out = np.empty(n, dtype=np.uint64)
    for i, k in enumerate(keys):
        if isinstance(k, (int, np.integer)):
            out[i] = np.uint64(int(k) & ((1 << 64) - 1))
            continue
        if isinstance(k, str) and len(k) == 32:
            # per-key hex fold IDENTICAL to the bulk fast path: a key's
            # hash must never depend on the composition of its batch (a
            # mismatch would be a Bloom false negative — contract breach)
            try:
                v = int(k, 16)
                out[i] = np.uint64((v ^ (v >> 64)) & ((1 << 64) - 1))
                continue
            except ValueError:
                pass
        data = k.encode() if isinstance(k, str) else bytes(k)
        out[i] = np.uint64(
            int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")
        )
    return _splitmix64(out)


class BloomFilter:
    """add_many / contains_many over numpy arrays; double hashing
    h_i = h1 + i*h2 (Kirsch–Mitzenmacher) over a power-of-two bit space."""

    def __init__(self, n_keys: int, bits_per_key: int = 10, n_hashes: int = 7):
        n_bits = 1 << max(int(np.ceil(np.log2(max(n_keys, 1) * bits_per_key))), 6)
        self.n_bits = n_bits
        self.mask = np.uint64(n_bits - 1)
        self.n_hashes = n_hashes
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, keys) -> np.ndarray:
        h1 = _key_hashes(keys)
        h2 = _splitmix64(h1) | np.uint64(1)
        idx = np.empty((self.n_hashes, len(h1)), dtype=np.uint64)
        for i in range(self.n_hashes):
            idx[i] = (h1 + np.uint64(i) * h2) & self.mask
        return idx

    def add_many(self, keys) -> None:
        if not len(keys):
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> np.uint64(3),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))

    def contains_many(self, keys) -> np.ndarray:
        """Boolean mask; False is definitive, True may be a false positive."""
        if not len(keys):
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        got = (self.bits[(pos >> np.uint64(3)).astype(np.int64)]
               >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return got.all(axis=0)

    def __getstate__(self):
        return {"n_bits": self.n_bits, "n_hashes": self.n_hashes, "bits": self.bits}

    def __setstate__(self, state):
        self.n_bits = state["n_bits"]
        self.mask = np.uint64(self.n_bits - 1)
        self.n_hashes = state["n_hashes"]
        self.bits = state["bits"]


def build_bloom_distributed(ds, column: str, n_keys: int,
                            bits_per_key: int = 10, n_hashes: int = 7) -> BloomFilter:
    """Build a BloomFilter over ``ds[column]`` WITHOUT streaming every key
    through the driver: each block builds a partial filter of identical
    geometry inside map_batches, and only the fixed-size bit arrays travel
    back to be OR-merged.  Driver traffic = n_blocks × bits/8 bytes,
    independent of the key count — the scale path past driver-streamed
    ``add_many`` (~1e9 keys would stream ~50 GB of strings otherwise).
    Caveat at extreme filter sizes: each block ships a full bit array, so
    keep blocks large (n_blocks ≪ n_keys/bits ratio) or tree-reduce;
    with 1e9 keys (≈2 GiB filter) a few hundred blocks is the right
    shape, thousands is not."""
    proto = BloomFilter(n_keys, bits_per_key=bits_per_key, n_hashes=n_hashes)
    n_bits, nh = proto.n_bits, proto.n_hashes

    def partial(batch) -> dict:
        import pyarrow as pa

        bf = BloomFilter.__new__(BloomFilter)
        bf.n_bits = n_bits
        bf.mask = np.uint64(n_bits - 1)
        bf.n_hashes = nh
        bf.bits = np.zeros(n_bits // 8, dtype=np.uint8)
        bf.add_many(batch.column(column).to_pylist())
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    merged = proto
    # batch_size=None → ONE partial per input block, so driver traffic is
    # n_blocks × bits/8 as documented (a small fixed batch size would ship
    # n_keys/batch_size copies of the full bit array instead)
    for b in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for blob in b.column("bits").to_pylist():
            merged.bits |= np.frombuffer(blob, dtype=np.uint8)
    return merged
