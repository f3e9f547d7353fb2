"""From-scratch FLAC subset codec (functions/F.py): hermetic
encode→decode roundtrips, stream-integrity checks, and subset boundaries.
Correctness is proven against the public format spec + roundtrip (no
libFLAC in this container; documented in the module docstring)."""

import numpy as np
import pytest

from spiderray.functions import flacdec as F


def _sine(freq=440.0, sr=16000, sec=0.5, amp=0.4):
    t = np.arange(int(sr * sec)) / sr
    return (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)


class TestRoundtrip:
    def test_verbatim_noise(self):
        rng = np.random.default_rng(5)
        x = rng.integers(-32000, 32000, size=10000).astype(np.int16)
        dec, sr = F.decode_flac(F.encode_flac(x, 16000, mode="verbatim"))
        assert sr == 16000 and (dec == x).all()

    def test_constant_silence(self):
        z = np.full(9000, -123, dtype=np.int16)
        dec, _ = F.decode_flac(F.encode_flac(z, 8000))
        assert (dec == z).all()

    def test_fixed_predictor_compresses_sine(self):
        s = _sine(sec=1.25)
        enc = F.encode_flac(s, 16000)
        dec, _ = F.decode_flac(enc)
        assert (dec == s).all()
        assert len(enc) < 2 * len(s)  # actually smaller than raw pcm16

    def test_odd_length_and_extremes(self):
        x = np.array([32767, -32768, 0, 1, -1] * 900 + [7], dtype=np.int16)
        dec, _ = F.decode_flac(F.encode_flac(x, 22050))
        assert (dec == x).all()

    def test_empty(self):
        dec, sr = F.decode_flac(F.encode_flac(np.zeros(0, dtype=np.int16), 16000))
        assert len(dec) == 0 and sr == 16000

    def test_multi_frame(self):
        x = np.arange(-5000, 5000, dtype=np.int16)  # 10k samples = 3 blocks
        dec, _ = F.decode_flac(F.encode_flac(x, 16000, block_size=4096))
        assert (dec == x).all()


class TestIntegrity:
    def test_not_flac(self):
        with pytest.raises(F.FlacUnsupported):
            F.decode_flac(b"RIFFxxxxWAVE" + b"\x00" * 64)

    def test_header_crc_detects_tamper(self):
        enc = bytearray(F.encode_flac(_sine(), 16000, mode="verbatim"))
        # flip a bit in the first frame header (after 4 + 4 + 34 metadata bytes)
        enc[45] ^= 0x04
        with pytest.raises((F.FlacError, F.FlacUnsupported)):
            F.decode_flac(bytes(enc))

    def test_payload_crc_detects_tamper(self):
        enc = bytearray(F.encode_flac(_sine(), 16000, mode="verbatim"))
        enc[-20] ^= 0x01  # flip a payload bit near the end
        with pytest.raises(F.FlacError):
            F.decode_flac(bytes(enc))


class TestSubsetBoundaries:
    def test_three_channels_rejected(self):
        # stereo is now a supported layout (round 3); >2 channels stays
        # outside the subset — hand-build a STREAMINFO claiming 3 channels
        enc = bytearray(F.encode_flac(_sine(sec=0.05), 16000))
        # channels-1 sits in bits 4-6 of STREAMINFO body byte 12 (abs 20)
        enc[20] = (enc[20] & 0b11110001) | (2 << 1)  # channels-1 = 2
        with pytest.raises(F.FlacUnsupported):
            F.decode_flac(bytes(enc))

    def test_decode_one_integration(self):
        from spiderray.stages.multimodal import _decode_one, DecodeUnsupported

        s = _sine()
        pcm = _decode_one(F.encode_flac(s, 16000), "flac")
        assert np.allclose(pcm, s.astype(np.float32) / 32767.0)
        with pytest.raises(DecodeUnsupported):
            _decode_one(b"not a flac stream at all", "flac")

    def test_opus_still_stubbed(self):
        from spiderray.stages.multimodal import _decode_one, DecodeUnsupported

        with pytest.raises(DecodeUnsupported):
            _decode_one(b"\x00" * 64, "opus")


class TestLongStream:
    def test_past_frame_2047(self):
        """Frame-number UTF-8 coding regression: frame 2048 needs the
        3-byte form (the old threshold mis-sized it)."""
        n = 2100 * 4096
        x = np.zeros(n, dtype=np.int16)
        dec, _ = F.decode_flac(F.encode_flac(x, 16000))
        assert len(dec) == n and (dec == 0).all()

    def test_utf8_number_roundtrip_boundaries(self):
        for n in (0, 127, 128, 2047, 2048, 65535, 65536, 2**21 - 1, 2**21,
                  2**26 - 1, 2**26, 2**31, 2**36 - 1):
            enc = F._encode_utf8_number(n)
            assert F._decode_utf8_number(F._BitReader(enc)) == n, n


class TestLpc:
    """LPC subframe decode, driven by hand-encoded frames (the minimal
    encoder only writes CONSTANT/VERBATIM/FIXED, so LPC coverage builds
    its frames with the module's own bit-writer per the public spec)."""

    @staticmethod
    def _encode_lpc_frame(block, frame_no, coefs, precision, shift, param):
        w = F._BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)
        w.write(7, 4)
        w.write(0, 4)
        w.write(0, 4)
        w.write(4, 3)
        w.write(0, 1)
        for b in F._encode_utf8_number(frame_no):
            w.write(b, 8)
        w.write(len(block) - 1, 16)
        w.align()
        header = w.bytes() + bytes([F.crc8(w.bytes())])
        body = F._BitWriter()
        order = len(coefs)
        body.write(0, 1)
        body.write(0x20 | (order - 1), 6)
        body.write(0, 1)
        for v in block[:order]:
            body.write(int(v), 16)
        body.write(precision - 1, 4)
        body.write(shift & 0x1F, 5)
        for c in coefs:
            body.write(int(c), precision)
        resid = []
        hist = list(block[:order])
        for x in block[order:]:
            pred = sum(c * hist[-j - 1] for j, c in enumerate(coefs)) >> shift
            resid.append(int(x) - pred)
            hist.append(int(x))
        F._write_rice_residual(body, np.array(resid, dtype=np.int64), param)
        body.align()
        frame = header + body.bytes()
        return frame + F.crc16(frame).to_bytes(2, "big")

    def _stream_with(self, block, frame_bytes):
        meta = F.encode_flac(block.astype(np.int16), 16000, mode="verbatim")
        meta_end = 4 + 4 + 34  # magic + block header + STREAMINFO
        return bytes(meta[:meta_end]) + frame_bytes

    def test_order2_lpc_equals_input(self):
        block = (_sine(sec=0.256) if False else
                 (0.4 * np.sin(2 * np.pi * 440 * np.arange(4096) / 16000) * 32767
                  ).astype(np.int64))
        frame = self._encode_lpc_frame(block, 0, [2, -1], 4, 0, 6)
        dec, _ = F.decode_flac(self._stream_with(block, frame))
        assert (dec.astype(np.int64) == block).all()

    def test_order4_quantized_shifted(self):
        block = (0.3 * np.sin(2 * np.pi * 700 * np.arange(4096) / 16000) * 32767
                 ).astype(np.int64)
        frame = self._encode_lpc_frame(block, 0, [20, -15, 8, -3], 6, 5, 8)
        dec, _ = F.decode_flac(self._stream_with(block, frame))
        assert (dec.astype(np.int64) == block).all()

    def test_invalid_precision_rejected(self):
        block = np.zeros(64, dtype=np.int64)
        frame = bytearray(self._encode_lpc_frame(block, 0, [1], 4, 0, 4))
        # corrupt the qlp precision nibble to 0b1111 is intricate; instead
        # assert negative shift rejection via direct reader simulation
        w = F._BitWriter()
        w.write(0, 1)
        w.write(0x20, 6)  # LPC order 1
        w.write(0, 1)
        w.write(0, 16)    # warmup
        w.write(0b1111, 4)  # invalid precision marker
        w.align()
        r = F._BitReader(w.bytes())
        with pytest.raises((F.FlacError, F.FlacUnsupported)):
            F._decode_subframe(r, 4, 16)


class TestStereo24:
    """Round-3: stereo decorrelation (all four layouts) + 24-bit depth."""

    def _stereo(self, n=5000, seed=3):
        rng = np.random.default_rng(seed)
        left = (rng.standard_normal(n) * 9000).astype(np.int64)
        right = (left * 0.8 + rng.standard_normal(n) * 500).astype(np.int64)
        return np.stack([np.clip(left, -32768, 32767),
                         np.clip(right, -32768, 32767)], axis=1)

    @pytest.mark.parametrize("mode", ["independent", "left-side",
                                      "right-side", "mid-side"])
    def test_stereo_roundtrip_bit_exact(self, mode):
        s = self._stereo()
        buf = F.encode_flac(s, 16000, stereo_mode=mode)
        out, sr, bps = F.decode_flac_info(buf)
        assert sr == 16000 and bps == 16
        assert out.shape == s.shape
        assert (out == s).all(), mode

    def test_mid_side_odd_sums(self):
        # mid = (l+r)>>1 floors; reconstruction must recover exact values
        # when l+r is odd (the (side & 1) carry bit in the spec decode)
        s = np.array([[3, 2], [-3, 2], [1, 0], [-1, 0], [32767, -32768]],
                     dtype=np.int64)
        buf = F.encode_flac(s, 8000, stereo_mode="mid-side", block_size=5)
        out, _, _ = F.decode_flac_info(buf)
        assert (out == s).all()

    def test_24bit_mono_roundtrip(self):
        rng = np.random.default_rng(7)
        s = (rng.standard_normal(4000) * 4_000_000).astype(np.int64)
        s = np.clip(s, -(1 << 23), (1 << 23) - 1)
        buf = F.encode_flac(s, 22050, bits_per_sample=24, mode="verbatim")
        out, sr, bps = F.decode_flac_info(buf)
        assert bps == 24 and out.dtype == np.int32
        assert (out == s).all()

    def test_24bit_stereo_roundtrip(self):
        rng = np.random.default_rng(11)
        s = (rng.standard_normal((3000, 2)) * 3_000_000).astype(np.int64)
        s = np.clip(s, -(1 << 23), (1 << 23) - 1)
        for mode in ("left-side", "mid-side"):
            buf = F.encode_flac(s, 16000, bits_per_sample=24,
                                      stereo_mode=mode)
            out, _, bps = F.decode_flac_info(buf)
            assert bps == 24 and (out == s).all(), mode

    def test_stereo_flows_audio_gate(self):
        # a stereo flac clip must decode_ok=True through the feature stage
        # kernel and pass the audio gate (decode_ok path, not pass-through)
        import pyarrow as pa

        from spiderray.config import PipelineConfig
        from spiderray.stages.multimodal import AudioFeatureActor, audio_gate_decision

        t = np.arange(16000) / 16000.0
        wave = (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int64)
        s = np.stack([wave, wave // 2], axis=1)
        buf = F.encode_flac(s, 16000, stereo_mode="mid-side")
        batch = pa.table({
            "clip_id": ["st1"], "bytes": [buf], "sr_hz": pa.array([16000], pa.int32()),
            "dur_ms": pa.array([1000], pa.int32()), "codec": ["flac"],
            "transcript": ["three words here"],
        })
        out = AudioFeatureActor(PipelineConfig())(batch)
        assert out.column("decode_ok")[0].as_py() is True
        assert out.column("n_samples")[0].as_py() == 16000
        assert out.column("audio_rms")[0].as_py() > 0.1
        ok, reason = audio_gate_decision(buf, "flac", 16000, 1000, "three words here")
        assert ok and reason == ""

    def test_three_channels_still_unsupported(self):
        # hand-build a STREAMINFO claiming 3 channels → FlacUnsupported
        buf = bytearray(F.encode_flac(np.zeros(10, dtype=np.int64), 8000))
        # STREAMINFO byte layout: channels sit in byte 4+4+ (16+16+24+24+20 bits)
        # = bit offset 100 within the 34-byte body starting at offset 8
        body_off = 8
        b = buf[body_off + 12]
        buf[body_off + 12] = (b & 0b11110001) | (2 << 1)  # channels-1 = 2
        with pytest.raises(F.FlacUnsupported):
            F.decode_flac_info(bytes(buf))


class TestReviewR3Regressions:
    def test_mixed_channel_frames_mark_not_crash(self):
        """STREAMINFO says stereo but a mono frame follows: must raise
        FlacError (not ValueError escaping _decode_one's catch list and
        killing the Ray task — round-3 review finding)."""
        s = np.stack([np.arange(100, dtype=np.int64)] * 2, axis=1)
        stereo = F.encode_flac(s, 8000, block_size=50)
        mono = F.encode_flac(np.arange(50, dtype=np.int64), 8000, block_size=50)
        # splice: stereo header + first stereo frame + a mono frame
        # find frame starts (after 4 + 4 + 34 metadata bytes)
        meta_end = 4 + 4 + 34
        spliced = bytearray(stereo)
        # locate the second frame of the stereo stream and replace its tail
        # with the mono stream's first frame bytes
        mono_frame = mono[meta_end:]
        # first stereo frame length: scan for next sync from meta_end+2
        body = stereo[meta_end:]
        idx = body[2:].find(b"\xff\xf8")
        assert idx > 0
        spliced = stereo[: meta_end + 2 + idx] + mono_frame
        with pytest.raises((F.FlacError, F.FlacUnsupported)):
            F.decode_flac_info(bytes(spliced))
        # and the stage marks, never raises
        from spiderray.stages.multimodal import DecodeUnsupported, _decode_one

        with pytest.raises(DecodeUnsupported):
            _decode_one(bytes(spliced), "flac")
