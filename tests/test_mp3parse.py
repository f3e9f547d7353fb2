"""MP3 frame-header parsing (functions/mp3parse.py) + gate integration."""

import numpy as np
import pytest

from spiderray.functions.mp3parse import (Mp3Error, encode_mp3_frames,
                                          make_id3v2, parse_mp3)


class TestMp3Parse:
    def test_duration_from_frame_walk(self):
        buf = encode_mp3_frames(2000, sr_hz=16000, bitrate_kbps=64)
        info = parse_mp3(buf)
        assert info["sr_hz"] == 16000
        assert abs(info["duration_ms"] - 2000) <= 40  # one MPEG-2 frame
        assert info["bitrate_min"] == info["bitrate_max"] == 64000

    def test_mpeg1_rates_and_tags(self):
        buf = encode_mp3_frames(1000, sr_hz=44100, bitrate_kbps=128,
                                id3v2=make_id3v2(200), id3v1=True)
        info = parse_mp3(buf)
        assert info["sr_hz"] == 44100
        assert abs(info["duration_ms"] - 1000) <= 30

    def test_corruption_refused(self):
        buf = encode_mp3_frames(500, sr_hz=16000)
        with pytest.raises(Mp3Error, match="sync|trunc|garbage"):
            parse_mp3(buf[: len(buf) - 7])  # truncated final frame
        with pytest.raises(Mp3Error):
            parse_mp3(b"\x00" * 64)  # no sync at all
        bad = bytearray(buf)
        bad[0] = 0x00  # break the first sync
        with pytest.raises(Mp3Error):
            parse_mp3(bytes(bad))

    def test_gate_integration(self):
        from spiderray.stages.multimodal import audio_gate_decision

        good = encode_mp3_frames(1500, sr_hz=16000)
        ok, reason = audio_gate_decision(good, "mp3", 16000, 1500,
                                         "hello there friend")
        assert ok, reason
        ok, reason = audio_gate_decision(good, "mp3", 16000, 9000, "x")
        assert not ok and reason == "duration_mismatch"
        ok, reason = audio_gate_decision(b"junk", "mp3", 16000, 1500, "x")
        assert not ok and reason == "bad_container"


class TestId3Footer:
    def test_id3v24_footer_flag_skipped(self):
        # header with footer flag set: total tag = 10 + size + 10
        size = 32
        sync = bytes((size >> s) & 0x7F for s in (21, 14, 7, 0))
        tag = b"ID3\x04\x00\x10" + sync + b"\x00" * size + b"3DI\x04\x00\x10" + sync
        buf = encode_mp3_frames(600, sr_hz=16000, id3v2=tag)
        info = parse_mp3(buf)
        assert abs(info["duration_ms"] - 600) <= 40
