"""IMA (DVI4) ADPCM codec — from the public IMA Digital Audio Focus Group
spec (the same 4-bit quantizer used by WAV format 0x11 and RFC 3551 DVI4).

4:1 compression of 16-bit PCM with a sequential predictor: each nibble
encodes the quantized difference from the running prediction, with the
step size adapting through the 89-entry table.  The predictor feedback
makes both directions inherently sequential per clip — clips parallelize
across the actor pool, samples don't.

Container (ours, minimal): b"IMA1" | uint32 n_samples | int16 pred0 |
uint8 index0 | uint8 pad | packed nibbles (low nibble = earlier sample).

Typical speech SNR is 30-40 dB — above the north rule's 30 dB
decoded-PCM bar (tested in tests/test_adpcm.py).
"""

from __future__ import annotations

import struct

import numpy as np

INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)

STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)

MAGIC = b"IMA1"


class AdpcmError(ValueError):
    pass


def encode_ima(pcm16: np.ndarray) -> bytes:
    """Encode int16 samples to the IMA1 container."""
    x = np.asarray(pcm16, dtype=np.int64)
    n = len(x)
    pred = int(x[0]) if n else 0
    index = 0
    out = bytearray()
    out += MAGIC
    out += struct.pack("<IhBB", n, pred, index, 0)
    nibbles = []
    step_t, idx_t = STEP_TABLE, INDEX_TABLE
    for s in x:
        step = step_t[index]
        diff = int(s) - pred
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        # 3-bit magnitude quantization of diff against step
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        # reconstruct exactly like the decoder (predictor must track it)
        delta = step >> 3
        if code & 1:
            delta += step >> 2
        if code & 2:
            delta += step >> 1
        if code & 4:
            delta += step
        pred = pred - delta if code & 8 else pred + delta
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + idx_t[code & 7]))
        nibbles.append(code)
    if len(nibbles) % 2:
        nibbles.append(0)
    packed = bytes(
        (nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4)
        for i in range(0, len(nibbles), 2)
    )
    return bytes(out) + packed


def decode_ima(buf: bytes) -> np.ndarray:
    """Decode an IMA1 container back to int16 samples."""
    if len(buf) < 12 or buf[:4] != MAGIC:
        raise AdpcmError("not an IMA1 stream")
    n, pred, index, _pad = struct.unpack("<IhBB", buf[4:12])
    if index > 88:
        raise AdpcmError(f"initial index {index} out of range")
    need = (n + 1) // 2
    data = buf[12:]
    if len(data) < need:
        raise AdpcmError(f"truncated: {len(data)} bytes for {n} samples")
    codes = np.frombuffer(data[:need], dtype=np.uint8)
    out = np.empty(n, dtype=np.int16)
    step_t, idx_t = STEP_TABLE, INDEX_TABLE
    pred = int(pred)
    k = 0
    for byte in codes:
        for code in (byte & 0xF, byte >> 4):
            if k >= n:
                break
            step = step_t[index]
            delta = step >> 3
            if code & 1:
                delta += step >> 2
            if code & 2:
                delta += step >> 1
            if code & 4:
                delta += step
            pred = pred - delta if code & 8 else pred + delta
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + idx_t[code & 7]))
            out[k] = pred
            k += 1
    return out


def _decode_nibble(code: int, pred: int, index: int) -> tuple[int, int, int]:
    step = STEP_TABLE[index]
    delta = step >> 3
    if code & 1:
        delta += step >> 2
    if code & 2:
        delta += step >> 1
    if code & 4:
        delta += step
    pred = pred - delta if code & 8 else pred + delta
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + INDEX_TABLE[code & 7]))
    return pred, index, delta


def _encode_sample(s: int, pred: int, index: int) -> tuple[int, int, int]:
    step = STEP_TABLE[index]
    diff = int(s) - pred
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    pred, index, _ = _decode_nibble(code, pred, index)
    return code, pred, index


# --------------------------------------------------------------------------
# WAV format 0x11 (IMA ADPCM inside a RIFF/WAVE data chunk) — the layout
# real-world compressed WAVs use: per-block [int16 pred][uint8 index]
# [uint8 rsvd] header, the header pred IS the block's first output sample,
# then (block_align-4)*2 nibble samples.  Mono only (stereo interleaves
# 4-byte words per channel — out of scope, refused loudly).
# --------------------------------------------------------------------------

def decode_wav_ima(data: bytes, block_align: int) -> np.ndarray:
    if block_align < 5:
        raise AdpcmError(f"block_align {block_align} too small")
    out = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4:
            break  # trailing runt: not even a header
        pred = int.from_bytes(block[0:2], "little", signed=True)
        index = block[2]
        if index > 88:
            raise AdpcmError(f"block index {index} out of range")
        nib = block[4:]
        samples = np.empty(1 + len(nib) * 2, dtype=np.int16)
        samples[0] = pred
        k = 1
        for byte in nib:
            for code in (byte & 0xF, byte >> 4):
                pred, index, _ = _decode_nibble(code, pred, index)
                samples[k] = pred
                k += 1
        out.append(samples)
    if not out:
        raise AdpcmError("no complete ADPCM block")
    return np.concatenate(out)


def encode_wav_ima(pcm16: np.ndarray, block_align: int = 256) -> bytes:
    """Encode mono int16 samples as WAV-layout IMA blocks (index carried
    across blocks, per the common encoder behavior)."""
    x = np.asarray(pcm16, dtype=np.int64)
    spb = (block_align - 4) * 2 + 1
    index = 0
    blocks = []
    for off in range(0, len(x), spb):
        chunk = x[off : off + spb]
        pred = int(chunk[0])
        head = struct.pack("<hBB", pred, index, 0)
        codes = []
        for s in chunk[1:]:
            code, pred, index = _encode_sample(int(s), pred, index)
            codes.append(code)
        while len(codes) < (block_align - 4) * 2:
            codes.append(0)  # pad the final block with silence deltas
        packed = bytes(
            (codes[i] & 0xF) | ((codes[i + 1] & 0xF) << 4)
            for i in range(0, len(codes), 2)
        )
        blocks.append(head + packed)
    return b"".join(blocks)
