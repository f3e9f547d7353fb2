"""Ogg/Opus CONTAINER parsing (no audio decode — libopus is absent).

Per the public specs (RFC 3533 Ogg framing, RFC 7845 Ogg-Opus mapping):
pages are parsed with capture-pattern / version / CRC-32 checks, packets
are reassembled from the lacing tables, the first packet must be an
OpusHead (version, channel count, pre-skip, input sample rate), and the
final page's granule position gives the stream duration at the fixed
48 kHz Opus granule rate (duration = (last_granule − pre_skip) / 48000).

This makes the engine's opus gate decisions PRINCIPLED without a CELT/SILK
decoder: a clip whose container is corrupt (bad CRC, truncated page, bad
magic) or whose granule duration contradicts its ``dur_ms`` metadata is
dropped with a real reason, while ``decode_ok`` stays False for opus rows
because PCM is genuinely not produced (documented per-codec semantics).

A minimal encoder builds container-valid streams (OpusHead + OpusTags +
payload pages with correct lacing/granules/CRCs) for hermetic tests and
for the synthetic clip corpus; payload bytes are opaque (not real Opus
frames) — exactly the "container real, codec stubbed" contract.
"""

from __future__ import annotations

import numpy as np

GRANULE_RATE = 48_000  # Opus granule positions are always at 48 kHz (RFC 7845)


class OggError(Exception):
    """Malformed Ogg/Opus container."""


def _make_crc_table() -> np.ndarray:
    # Ogg CRC-32: poly 0x04C11DB7, init 0, NOT reflected, no final xor
    table = np.zeros(256, dtype=np.uint32)
    for byte in range(256):
        crc = byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 else (crc << 1)
            crc &= 0xFFFFFFFF
        table[byte] = crc
    return table


_CRC_TABLE = _make_crc_table()


def _ogg_crc32_table(data: bytes) -> int:
    """Reference byte-at-a-time implementation (kept for the parity test;
    the production path below must equal it bit-for-bit)."""
    crc = 0
    table = _CRC_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ int(table[((crc >> 24) & 0xFF) ^ b])
    return crc


_REV8 = np.array(
    [int(f"{i:08b}"[::-1], 2) for i in range(256)], dtype=np.uint8
)


def ogg_crc32(data: bytes) -> int:
    """Ogg CRC-32 at C speed: a non-reflected CRC (poly P, init 0, no
    xorout) equals the bit-reversed reflected CRC (poly reflect(P) — which
    for 0x04C11DB7 is zlib's 0xEDB88320) over byte-bit-reversed input.
    The byte reversal is one vectorized table lookup; zlib.crc32 does the
    rest (its init/xorout conditioning cancelled via the ^0xFFFFFFFF
    trick).  ~90x the per-byte table loop; parity-tested against it."""
    import zlib

    rb = _REV8[np.frombuffer(data, dtype=np.uint8)].tobytes()
    raw = zlib.crc32(rb, 0xFFFFFFFF) ^ 0xFFFFFFFF  # reflected, init 0, no xorout
    return int(f"{raw:032b}"[::-1], 2)


def _parse_page(buf: bytes, pos: int):
    """One Ogg page → (header_type, granule, seq, segments payload, next_pos)."""
    if pos + 27 > len(buf):
        raise OggError("truncated page header")
    if buf[pos : pos + 4] != b"OggS":
        raise OggError("bad capture pattern")
    if buf[pos + 4] != 0:
        raise OggError("unsupported ogg version")
    header_type = buf[pos + 5]
    granule = int.from_bytes(buf[pos + 6 : pos + 14], "little", signed=True)
    seq = int.from_bytes(buf[pos + 18 : pos + 22], "little")
    crc = int.from_bytes(buf[pos + 22 : pos + 26], "little")
    n_segs = buf[pos + 26]
    seg_table = buf[pos + 27 : pos + 27 + n_segs]
    if len(seg_table) != n_segs:
        raise OggError("truncated segment table")
    body_len = sum(seg_table)
    body_start = pos + 27 + n_segs
    if body_start + body_len > len(buf):
        raise OggError("truncated page body")
    page = bytearray(buf[pos : body_start + body_len])
    page[22:26] = b"\x00\x00\x00\x00"
    if ogg_crc32(bytes(page)) != crc:
        raise OggError("page crc mismatch")
    return header_type, granule, seq, seg_table, buf[body_start : body_start + body_len], body_start + body_len


def parse_ogg_opus(buf: bytes) -> dict:
    """Parse a whole Ogg-Opus stream → metadata dict.

    Returns {channels, pre_skip, input_sr, last_granule, duration_ms,
    n_pages, n_packets}.  Raises OggError on any malformation (bad magic /
    version / CRC, truncation, missing or invalid OpusHead)."""
    pos = 0
    packets: list[bytes] = []
    pending = bytearray()
    last_granule = 0
    n_pages = 0
    expect_seq = None
    while pos < len(buf):
        header_type, granule, seq, seg_table, body, pos = _parse_page(buf, pos)
        if expect_seq is not None and seq != expect_seq:
            raise OggError("page sequence gap")
        expect_seq = seq + 1
        if n_pages == 0 and not (header_type & 0x02):
            raise OggError("first page is not BOS")
        n_pages += 1
        if granule >= 0:
            last_granule = max(last_granule, granule)
        off = 0
        for lace in seg_table:
            pending += body[off : off + lace]
            off += lace
            if lace < 255:  # packet boundary
                packets.append(bytes(pending))
                pending = bytearray()
        if header_type & 0x04:  # EOS
            break
    if pending:
        raise OggError("unterminated packet at end of stream")
    if not packets:
        raise OggError("no packets")
    head = packets[0]
    if len(head) < 19 or head[:8] != b"OpusHead":
        raise OggError("missing OpusHead")
    version = head[8]
    if version != 1:
        raise OggError(f"unsupported OpusHead version {version}")
    channels = head[9]
    if channels == 0:
        raise OggError("zero channels")
    pre_skip = int.from_bytes(head[10:12], "little")
    input_sr = int.from_bytes(head[12:16], "little")
    dur_samples = max(last_granule - pre_skip, 0)
    return {
        "channels": channels,
        "pre_skip": pre_skip,
        "input_sr": input_sr,
        "last_granule": last_granule,
        "duration_ms": int(round(dur_samples * 1000.0 / GRANULE_RATE)),
        "n_pages": n_pages,
        "n_packets": len(packets),
    }


# ---------------------------------------------------------------------------
# encoder (container-valid streams for tests + the synthetic corpus)
# ---------------------------------------------------------------------------


def _page(header_type: int, granule: int, serial: int, seq: int,
          packet: bytes) -> bytes:
    laces = []
    n = len(packet)
    while n >= 255:
        laces.append(255)
        n -= 255
    laces.append(n)  # final lace < 255 terminates the packet
    if len(laces) > 255:
        raise ValueError("packet too large for one page")
    head = bytearray(b"OggS")
    head.append(0)
    head.append(header_type)
    head += granule.to_bytes(8, "little", signed=True)
    head += serial.to_bytes(4, "little")
    head += seq.to_bytes(4, "little")
    head += b"\x00\x00\x00\x00"  # crc placeholder
    head.append(len(laces))
    head += bytes(laces)
    page = bytes(head) + packet
    crc = ogg_crc32(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def encode_ogg_opus(payload: bytes, n_samples: int, sr_hz: int,
                    channels: int = 1, pre_skip: int = 312,
                    serial: int = 0x5041594C, page_bytes: int = 4096) -> bytes:
    """Build a container-valid Ogg-Opus stream carrying ``payload`` as
    opaque packet bytes.  The final granule encodes ``n_samples`` of audio
    at ``sr_hz`` converted to the 48 kHz granule rate (+ pre_skip), so
    ``parse_ogg_opus(...)['duration_ms']`` agrees with the clip metadata."""
    head = (
        b"OpusHead" + bytes([1, channels]) + pre_skip.to_bytes(2, "little")
        + int(sr_hz).to_bytes(4, "little") + b"\x00\x00" + b"\x00"
    )
    tags = b"OpusTags" + len(b"spiderray").to_bytes(4, "little") + b"spiderray" + (0).to_bytes(4, "little")
    total_48k = int(round(n_samples * GRANULE_RATE / max(sr_hz, 1)))
    final_granule = pre_skip + total_48k

    out = bytearray()
    out += _page(0x02, 0, serial, 0, head)          # BOS
    out += _page(0x00, 0, serial, 1, tags)
    chunks = [payload[i : i + page_bytes] for i in range(0, len(payload), page_bytes)] or [b""]
    n_data = len(chunks)
    granule_step = total_48k // n_data if n_data else 0
    for j, chunk in enumerate(chunks):
        last = j == n_data - 1
        granule = final_granule if last else pre_skip + granule_step * (j + 1)
        out += _page(0x04 if last else 0x00, granule, serial, 2 + j, chunk)
    return bytes(out)
