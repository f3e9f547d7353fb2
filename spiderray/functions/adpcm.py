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
# real-world compressed WAVs use: per-block, per-channel [int16 pred]
# [uint8 index][uint8 rsvd] headers (the header pred IS the channel's
# first output sample), then nibble samples.  Stereo interleaves the data
# in 4-byte words (8 samples) per channel: ch0 word, ch1 word, ch0 word...
# --------------------------------------------------------------------------

def decode_wav_ima(data: bytes, block_align: int, n_ch: int = 1) -> np.ndarray:
    """Decode WAV-layout IMA blocks → frame-interleaved int16.

    Mono: every nibble is one sample.  Multi-channel: per the Microsoft
    IMA layout, after the ``n_ch`` 4-byte headers the payload is 4-byte
    words round-robined across channels.
    """
    if n_ch < 1:
        raise AdpcmError(f"n_ch {n_ch} invalid")
    head = 4 * n_ch
    if block_align < head + (4 * n_ch if n_ch > 1 else 1):
        raise AdpcmError(f"block_align {block_align} too small for {n_ch} ch")
    out = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < head:
            break  # trailing runt: not even the headers
        preds, indices = [], []
        for ch in range(n_ch):
            pred = int.from_bytes(block[4 * ch : 4 * ch + 2], "little",
                                  signed=True)
            index = block[4 * ch + 2]
            if index > 88:
                raise AdpcmError(f"block index {index} out of range")
            preds.append(pred)
            indices.append(index)
        nib = block[head:]
        if n_ch == 1:
            pred, index = preds[0], indices[0]
            samples = np.empty(1 + len(nib) * 2, dtype=np.int16)
            samples[0] = pred
            k = 1
            for byte in nib:
                for code in (byte & 0xF, byte >> 4):
                    pred, index, _ = _decode_nibble(code, pred, index)
                    samples[k] = pred
                    k += 1
            out.append(samples)
            continue
        # multi-channel: 4-byte words alternate channels
        n_words = len(nib) // 4
        groups = n_words // n_ch  # complete cross-channel word groups
        per_ch = 1 + groups * 8
        chans = np.empty((n_ch, per_ch), dtype=np.int16)
        pos = [1] * n_ch
        for ch in range(n_ch):
            chans[ch, 0] = preds[ch]
        for w in range(groups * n_ch):
            ch = w % n_ch
            word = nib[w * 4 : w * 4 + 4]
            pred, index, k = preds[ch], indices[ch], pos[ch]
            for byte in word:
                for code in (byte & 0xF, byte >> 4):
                    pred, index, _ = _decode_nibble(code, pred, index)
                    chans[ch, k] = pred
                    k += 1
            preds[ch], indices[ch], pos[ch] = pred, index, k
        out.append(chans.T.reshape(-1))  # frame-interleaved
    if not out:
        raise AdpcmError("no complete ADPCM block")
    return np.concatenate(out)


def encode_wav_ima(pcm16: np.ndarray, block_align: int = 256,
                   n_ch: int = 1) -> bytes:
    """Encode int16 samples as WAV-layout IMA blocks (index carried
    across blocks, per the common encoder behavior).  Multi-channel input
    is frame-interleaved; the output interleaves 4-byte words per channel
    like real format-0x11 WAVs."""
    x = np.asarray(pcm16, dtype=np.int64)
    if n_ch == 1:
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
    # multi-channel: deinterleave, encode per channel, word-interleave
    x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch)
    head_sz = 4 * n_ch
    groups = (block_align - head_sz) // (4 * n_ch)  # word groups per block
    spb = 1 + groups * 8  # frames per block per channel
    if groups < 1:
        raise AdpcmError(f"block_align {block_align} too small for {n_ch} ch")
    indices = [0] * n_ch
    blocks = []
    for off in range(0, len(x), spb):
        chunk = x[off : off + spb]
        heads, ch_words = [], []
        for ch in range(n_ch):
            pred = int(chunk[0, ch])
            index = indices[ch]
            heads.append(struct.pack("<hBB", pred, index, 0))
            codes = []
            for s in chunk[1:, ch]:
                code, pred, index = _encode_sample(int(s), pred, index)
                codes.append(code)
            while len(codes) < groups * 8:
                codes.append(0)
            packed = bytes(
                (codes[i] & 0xF) | ((codes[i + 1] & 0xF) << 4)
                for i in range(0, len(codes), 2)
            )
            ch_words.append([packed[i : i + 4] for i in range(0, len(packed), 4)])
            indices[ch] = index
        body = b"".join(
            ch_words[ch][g] for g in range(groups) for ch in range(n_ch)
        )
        block = b"".join(heads) + body
        blocks.append(block.ljust(block_align, b"\x00"))
    return b"".join(blocks)


# --------------------------------------------------------------------------
# WAV format 0x02 (Microsoft ADPCM) — the OTHER classic compressed-WAV
# codec: a 2-tap linear predictor with 7 standard coefficient pairs and a
# multiplicative step ("delta") adaptation, 4-bit SIGNED residual codes.
# Public spec: Microsoft "Multimedia Programming Interface and Data
# Specifications" / mmreg.h.  Per block, per channel: uint8 predictor
# index, then int16 idelta, then int16 sample1 (second-newest... actually
# newest) and int16 sample2 per channel — sample2 is emitted first.
# Stereo nibbles alternate channels within each byte stream.
# --------------------------------------------------------------------------

MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
            768, 614, 512, 409, 307, 230, 230, 230)
MS_COEF1 = (256, 512, 0, 192, 240, 460, 392)
MS_COEF2 = (0, -256, 0, 64, 0, -208, -232)


def _ms_decode_nibble(code: int, s1: int, s2: int, delta: int,
                      c1: int, c2: int) -> tuple[int, int, int]:
    signed = code - 16 if code & 8 else code
    pred = ((s1 * c1 + s2 * c2) >> 8) + signed * delta
    pred = max(-32768, min(32767, pred))
    delta = max(16, (MS_ADAPT[code] * delta) >> 8)
    return pred, pred, delta  # (new sample, new s1, new delta); s2 := old s1


def decode_wav_ms(data: bytes, block_align: int, n_ch: int = 1,
                  samples_per_block: int | None = None) -> np.ndarray:
    """Decode WAV format-0x02 (MS ADPCM) blocks → frame-interleaved int16.

    ``samples_per_block`` (wSamplesPerBlock from the fmt extension, when the
    container carries one) caps each block's output frames: real-world MS
    ADPCM files pad the final block's nibble payload with zero codes, and
    without the cap those decode into spurious trailing samples (duration /
    feature skew — round-3 ADVICE finding)."""
    if n_ch < 1:
        raise AdpcmError(f"n_ch {n_ch} invalid")
    head = 7 * n_ch
    if block_align <= head:
        raise AdpcmError(f"block_align {block_align} too small for {n_ch} ch")
    out = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < head:
            break  # trailing runt
        pred_idx, deltas, s1s, s2s = [], [], [], []
        for ch in range(n_ch):
            p = block[ch]
            if p > 6:
                raise AdpcmError(f"predictor index {p} out of range")
            pred_idx.append(p)
        for ch in range(n_ch):
            deltas.append(int.from_bytes(
                block[n_ch + 2 * ch : n_ch + 2 * ch + 2], "little", signed=True))
        for ch in range(n_ch):
            s1s.append(int.from_bytes(
                block[3 * n_ch + 2 * ch : 3 * n_ch + 2 * ch + 2],
                "little", signed=True))
        for ch in range(n_ch):
            s2s.append(int.from_bytes(
                block[5 * n_ch + 2 * ch : 5 * n_ch + 2 * ch + 2],
                "little", signed=True))
        nib = block[head:]
        n_codes = len(nib) * 2
        n_codes -= n_codes % n_ch  # only complete cross-channel groups
        if samples_per_block is not None and samples_per_block >= 2:
            n_codes = min(n_codes, (samples_per_block - 2) * n_ch)
        frames = 2 + n_codes // n_ch
        chans = np.empty((n_ch, frames), dtype=np.int16)
        for ch in range(n_ch):
            chans[ch, 0] = s2s[ch]  # sample2 is the block's FIRST output
            chans[ch, 1] = s1s[ch]
        pos = [2] * n_ch
        k = 0  # global code counter; channel = k % n_ch (high nibble first)
        for byte in nib:
            for code in (byte >> 4, byte & 0xF):
                if k >= n_codes:
                    break
                ch = k % n_ch
                c1, c2 = MS_COEF1[pred_idx[ch]], MS_COEF2[pred_idx[ch]]
                new, s1, delta = _ms_decode_nibble(
                    code, s1s[ch], s2s[ch], deltas[ch], c1, c2)
                s2s[ch] = s1s[ch]
                s1s[ch] = s1
                deltas[ch] = delta
                chans[ch, pos[ch]] = new
                pos[ch] += 1
                k += 1
        out.append(chans.T.reshape(-1))
    if not out:
        raise AdpcmError("no complete ADPCM block")
    return np.concatenate(out)


def encode_wav_ms(pcm16: np.ndarray, block_align: int = 256,
                  n_ch: int = 1) -> bytes:
    """Encode frame-interleaved int16 as MS-ADPCM blocks.  Per the
    standard encoder strategy, each block tries all 7 coefficient pairs
    and keeps the one with least total |error| (per channel)."""
    x = np.asarray(pcm16, dtype=np.int64)
    x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch)
    head = 7 * n_ch
    codes_per_block = (block_align - head) * 2
    frames = 2 + codes_per_block // n_ch
    if frames <= 2:
        raise AdpcmError(f"block_align {block_align} too small for {n_ch} ch")
    blocks = []
    for off in range(0, len(x), frames):
        chunk = x[off : off + frames]
        if len(chunk) < 2:
            # pad a runt tail to 2 frames by repeating the last sample
            pad = np.repeat(chunk[-1:], 2 - len(chunk), axis=0)
            chunk = np.concatenate([chunk, pad])
        best = []  # per channel: (pred_idx, codes)
        for ch in range(n_ch):
            samples = chunk[:, ch]
            # predictor selection: vectorized open-loop 2-tap residual sum
            # for all 7 pairs at once (no quantization feedback), then ONE
            # greedy encode pass with the winner — same ~41 dB quality as
            # trying all 7 closed-loop, 7x cheaper
            s = samples.astype(np.int64)
            if len(s) >= 3:
                c1 = np.asarray(MS_COEF1, dtype=np.int64)[:, None]
                c2 = np.asarray(MS_COEF2, dtype=np.int64)[:, None]
                pred = (s[1:-1][None, :] * c1 + s[:-2][None, :] * c2) >> 8
                err = np.abs(s[2:][None, :] - pred).sum(axis=1)
                p_best = int(err.argmin())
            else:
                p_best = 0
            codes, _ = _ms_encode_channel(samples, p_best)
            best.append((p_best, codes))
        parts = [bytes([best[ch][0] for ch in range(n_ch)])]
        init_delta = []
        for ch in range(n_ch):
            init_delta.append(_ms_initial_delta(chunk[:, ch],
                                                best[ch][0]))
        for ch in range(n_ch):
            parts.append(struct.pack("<h", init_delta[ch]))
        for ch in range(n_ch):
            parts.append(struct.pack("<h", int(chunk[1, ch])))
        for ch in range(n_ch):
            parts.append(struct.pack("<h", int(chunk[0, ch])))
        # interleave the per-channel code streams: code k goes to ch k%n_ch
        all_codes = []
        per_ch_codes = [best[ch][1] for ch in range(n_ch)]
        n_steps = max(len(c) for c in per_ch_codes)
        for i in range(n_steps):
            for ch in range(n_ch):
                c = per_ch_codes[ch]
                all_codes.append(c[i] if i < len(c) else 0)
        while len(all_codes) < codes_per_block:
            all_codes.append(0)
        packed = bytes(
            ((all_codes[i] & 0xF) << 4) | (all_codes[i + 1] & 0xF)
            for i in range(0, codes_per_block, 2)
        )
        blocks.append(b"".join(parts) + packed)
    return b"".join(blocks)


def wav_adpcm_container(data: bytes, fmt_tag: int, n_ch: int, sr: int,
                        block_align: int, samples_per_block: int) -> bytes:
    """Wrap encoded ADPCM block data in a minimal RIFF/WAVE container
    with an extended fmt chunk (cbSize=2 + wSamplesPerBlock, as real
    format 0x02/0x11 WAVs carry)."""
    fmt = struct.pack("<HHIIHHHH", fmt_tag, n_ch, sr,
                      sr * block_align // max(samples_per_block, 1),
                      block_align, 4, 2, samples_per_block)
    out = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(out) + 4) + out


def _ms_initial_delta(samples: np.ndarray, pred_idx: int) -> int:
    """A reasonable idelta seed: scaled mean absolute 2-tap residual over
    the block (what real encoders approximate), floored at 16."""
    c1, c2 = MS_COEF1[pred_idx], MS_COEF2[pred_idx]
    s = samples.astype(np.int64)
    if len(s) < 3:
        return 16
    pred = (s[1:-1] * c1 + s[:-2] * c2) >> 8
    res = np.abs(s[2:] - pred)
    return int(max(16, min(32767, int(res.mean()) // 4)))


def _ms_encode_channel(samples: np.ndarray, pred_idx: int):
    """Greedy-quantize one channel's block with coefficient pair
    ``pred_idx``; returns (codes, total_abs_error)."""
    c1, c2 = MS_COEF1[pred_idx], MS_COEF2[pred_idx]
    s2, s1 = int(samples[0]), int(samples[1])
    delta = _ms_initial_delta(samples, pred_idx)
    codes, err = [], 0
    for target in samples[2:]:
        pred = (s1 * c1 + s2 * c2) >> 8
        diff = int(target) - pred
        code = diff // delta if delta else 0
        code = max(-8, min(7, code))
        stored = code & 0xF
        new, new_s1, new_delta = _ms_decode_nibble(stored, s1, s2, delta,
                                                   c1, c2)
        err += abs(int(target) - new)
        s2, s1, delta = s1, new_s1, new_delta
        codes.append(stored)
    return codes, err
