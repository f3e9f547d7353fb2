"""MPEG audio (MP3) frame-header parsing — the container-integrity gate
for ``codec='mp3'`` clips, the MPEG sibling of functions/oggopus.py.

From the public MPEG-1/2 audio framing spec (ISO/IEC 11172-3 §2.4 /
13818-3): an MP3 stream is a walk of self-describing frames — 11-bit
sync, version/layer bits, bitrate + samplerate table indices, padding —
each of length 144·bitrate/samplerate (+pad) for MPEG-1 Layer III
(72· for MPEG-2/2.5), carrying 1152 (576) PCM samples.  Walking the
headers yields exact duration and stream-integrity judgment WITHOUT a
PCM decode — full synthesis-filterbank decode stays out of scope the
same way Opus PCM does (documented gate semantics: structural judgment,
decode_ok stays False).

Also handles the real-world wrapping: a leading ID3v2 tag (syncsafe
size) and a trailing 128-byte ID3v1 'TAG' block.
"""

from __future__ import annotations


class Mp3Error(ValueError):
    pass


# bitrate kbps tables, index 1..14 (0 = free, 15 = bad)
_BITRATE_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                  224, 256, 320)
_BITRATE_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                  144, 160)
_SR = {
    3: (44100, 48000, 32000),   # MPEG-1
    2: (22050, 24000, 16000),   # MPEG-2
    0: (11025, 12000, 8000),    # MPEG-2.5
}


def _skip_id3v2(buf: bytes) -> int:
    if len(buf) >= 10 and buf[:3] == b"ID3":
        if any(b & 0x80 for b in buf[6:10]):
            raise Mp3Error("bad ID3v2 syncsafe size")
        size = (buf[6] << 21) | (buf[7] << 14) | (buf[8] << 7) | buf[9]
        footer = 10 if buf[5] & 0x10 else 0  # v2.4 footer flag: 10 more
        return 10 + size + footer
    return 0


def parse_frame_header(buf: bytes, pos: int) -> dict:
    """Parse one 4-byte header at ``pos``; raises Mp3Error on anything
    that is not a valid Layer-III frame header."""
    if pos + 4 > len(buf):
        raise Mp3Error("truncated header")
    h = int.from_bytes(buf[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        raise Mp3Error(f"lost sync at {pos}")
    version = (h >> 19) & 3
    layer = (h >> 17) & 3
    if version == 1 or layer != 1:  # reserved version / not Layer III
        raise Mp3Error("not MPEG Layer III")
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        raise Mp3Error("bad bitrate/samplerate index")
    padding = (h >> 9) & 1
    sr = _SR[version][sr_idx]
    if version == 3:
        bitrate = _BITRATE_V1_L3[br_idx] * 1000
        frame_len = 144 * bitrate // sr + padding
        samples = 1152
    else:
        bitrate = _BITRATE_V2_L3[br_idx] * 1000
        frame_len = 72 * bitrate // sr + padding
        samples = 576
    if frame_len <= 4:
        raise Mp3Error("degenerate frame length")
    return {"sr_hz": sr, "bitrate": bitrate, "frame_len": frame_len,
            "samples": samples, "version": version}


def parse_mp3(buf: bytes) -> dict:
    """Walk every frame; returns {n_frames, sr_hz, duration_ms,
    bitrate_min, bitrate_max}.  Raises Mp3Error on corrupt framing,
    mixed sample rates, or zero frames."""
    pos = _skip_id3v2(buf)
    end = len(buf)
    if end - pos >= 128 and buf[end - 128 : end - 125] == b"TAG":
        end -= 128  # trailing ID3v1
    n_frames = 0
    total_samples = 0
    sr = None
    br_lo = br_hi = None
    while pos < end:
        if end - pos < 4:
            raise Mp3Error("trailing garbage shorter than a header")
        f = parse_frame_header(buf, pos)
        if sr is None:
            sr = f["sr_hz"]
        elif f["sr_hz"] != sr:
            raise Mp3Error("sample rate changes mid-stream")
        if pos + f["frame_len"] > end:
            raise Mp3Error("truncated final frame")
        n_frames += 1
        total_samples += f["samples"]
        br = f["bitrate"]
        br_lo = br if br_lo is None else min(br_lo, br)
        br_hi = br if br_hi is None else max(br_hi, br)
        pos += f["frame_len"]
    if n_frames == 0:
        raise Mp3Error("no frames")
    return {
        "n_frames": n_frames,
        "sr_hz": sr,
        "duration_ms": int(round(total_samples * 1000 / sr)),
        "bitrate_min": br_lo,
        "bitrate_max": br_hi,
    }


def encode_mp3_frames(duration_ms: int, sr_hz: int = 16000,
                      bitrate_kbps: int = 64, id3v2: bytes = b"",
                      id3v1: bool = False) -> bytes:
    """STRUCTURALLY-valid Layer-III frame stream for the given duration —
    correct headers and frame lengths with zeroed payloads (a real MP3
    encoder is out of scope; the parse layer judges structure, exactly
    like the Ogg/Opus gate)."""
    if sr_hz in _SR[3]:
        version, samples, factor, table = 3, 1152, 144, _BITRATE_V1_L3
    elif sr_hz in _SR[2]:
        version, samples, factor, table = 2, 576, 72, _BITRATE_V2_L3
    elif sr_hz in _SR[0]:
        version, samples, factor, table = 0, 576, 72, _BITRATE_V2_L3
    else:
        raise Mp3Error(f"unsupported sample rate {sr_hz}")
    br_idx = table.index(bitrate_kbps)
    sr_idx = _SR[version].index(sr_hz)
    n_frames = max(int(round(duration_ms * sr_hz / 1000 / samples)), 1)
    frame_len = factor * bitrate_kbps * 1000 // sr_hz
    header = (0x7FF << 21) | (version << 19) | (1 << 17) | (br_idx << 12) \
        | (sr_idx << 10)
    frame = header.to_bytes(4, "big") + b"\x00" * (frame_len - 4)
    out = bytes(id3v2) + frame * n_frames
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return out


def make_id3v2(payload_size: int = 64) -> bytes:
    """A minimal ID3v2.3 tag of the given payload size (syncsafe)."""
    if payload_size >= (1 << 28):
        raise Mp3Error("tag too large")
    size = bytes(((payload_size >> s) & 0x7F) for s in (21, 14, 7, 0))
    return b"ID3\x03\x00\x00" + size + b"\x00" * payload_size
