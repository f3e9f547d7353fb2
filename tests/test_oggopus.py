"""Ogg/Opus container layer (functions/oggopus.py): framing, CRC, OpusHead,
granule-duration arithmetic, and the gate decisions built on them.
Hermetic: the encoder writes spec-conformant pages (RFC 3533 / RFC 7845);
payload bytes are opaque — container real, codec stubbed."""

import numpy as np
import pytest

from spiderray.functions import oggopus as O


class TestContainer:
    def test_roundtrip_metadata(self):
        buf = O.encode_ogg_opus(b"p" * 30000, 16000, 16000, channels=2, pre_skip=100)
        info = O.parse_ogg_opus(buf)
        assert info["channels"] == 2
        assert info["pre_skip"] == 100
        assert info["input_sr"] == 16000
        assert info["duration_ms"] == 1000
        assert info["n_pages"] >= 3  # BOS + tags + >=1 data page

    def test_duration_at_odd_rates(self):
        # 22050 Hz, 5513 samples ≈ 250 ms at the 48k granule rate
        buf = O.encode_ogg_opus(b"x" * 100, 5513, 22050)
        assert abs(O.parse_ogg_opus(buf)["duration_ms"] - 250) <= 1

    def test_crc_detects_any_flip(self):
        buf = bytearray(O.encode_ogg_opus(b"q" * 5000, 8000, 8000))
        for pos in (30, len(buf) // 2, len(buf) - 1):
            b2 = bytearray(buf)
            b2[pos] ^= 0x10
            with pytest.raises(O.OggError):
                O.parse_ogg_opus(bytes(b2))

    def test_truncation_and_garbage(self):
        buf = O.encode_ogg_opus(b"z" * 5000, 8000, 8000)
        for bad in (buf[:20], buf[: len(buf) - 3], b"", b"RIFFxxxx", b"\x00" * 64):
            with pytest.raises(O.OggError):
                O.parse_ogg_opus(bad)

    def test_missing_opushead(self):
        # first packet isn't OpusHead → rejected
        page = O._page(0x02, 0, 7, 0, b"NotOpus!" + b"\x00" * 11)
        page += O._page(0x04, 480, 7, 1, b"data")
        with pytest.raises(O.OggError, match="OpusHead"):
            O.parse_ogg_opus(page)

    def test_sequence_gap_rejected(self):
        buf = O.encode_ogg_opus(b"s" * 9000, 8000, 8000)
        # drop the middle data page: find 3rd page start
        starts = [i for i in range(len(buf)) if buf[i : i + 4] == b"OggS"]
        assert len(starts) >= 4
        cut = buf[: starts[2]] + buf[starts[3] :]
        with pytest.raises(O.OggError, match="sequence"):
            O.parse_ogg_opus(cut)

    def test_large_packet_lacing(self):
        # packet > 255 bytes spans multiple lacing values ending < 255
        buf = O.encode_ogg_opus(b"L" * 1000, 480, 48000, page_bytes=1000)
        info = O.parse_ogg_opus(buf)
        assert info["n_packets"] == 3  # head + tags + one 1000-byte packet


class TestOpusGate:
    def test_valid_container_passes(self):
        from spiderray.stages.multimodal import audio_gate_decision

        buf = O.encode_ogg_opus(b"x" * 4000, 16000, 16000)
        ok, reason = audio_gate_decision(buf, "opus", 16000, 1000, "three words here")
        assert ok and reason == ""

    def test_corrupt_drops_bad_container(self):
        from spiderray.stages.multimodal import audio_gate_decision

        buf = bytearray(O.encode_ogg_opus(b"x" * 4000, 16000, 16000))
        buf[-1] ^= 0xFF
        ok, reason = audio_gate_decision(bytes(buf), "opus", 16000, 1000, "t")
        assert not ok and reason == "bad_container"

    def test_duration_mismatch_drops(self):
        from spiderray.stages.multimodal import audio_gate_decision

        buf = O.encode_ogg_opus(b"x" * 4000, 32000, 16000)  # container: 2 s
        ok, reason = audio_gate_decision(buf, "opus", 16000, 1000, "t")
        assert not ok and reason == "duration_mismatch"

    def test_synth_corpus_strata(self):
        """The synthetic clip corpus plants both fault strata
        deterministically; the gate must sort them exactly."""
        from spiderray.sources.clips import _CODECS, synth_clips_batch
        from spiderray.stages.multimodal import audio_gate_decision

        t = synth_clips_batch(np.arange(0, 600))
        got = {"pass": 0, "bad_container": 0, "duration_mismatch": 0}
        for row in t.to_pylist():
            if row["codec"] != "opus":
                continue
            i = int(row["clip_id"].rsplit("_", 1)[1])
            ok, reason = audio_gate_decision(
                row["bytes"], "opus", row["sr_hz"], row["dur_ms"], row["transcript"]
            )
            got[reason or "pass"] += 1
            phase = (i // len(_CODECS)) % 8
            expect = {7: "bad_container", 3: "duration_mismatch"}.get(phase, "")
            assert (reason or "") == expect, (i, phase, reason)
        assert got["bad_container"] > 0 and got["duration_mismatch"] > 0
        assert got["pass"] > got["bad_container"]


class TestCrcParity:
    def test_fast_crc_equals_table_reference(self):
        import os

        for n in (0, 1, 3, 255, 4096, 16001):
            d = os.urandom(n)
            assert O.ogg_crc32(d) == O._ogg_crc32_table(d), n
