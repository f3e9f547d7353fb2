"""From-scratch FLAC subset codec (functions/flacdec.py): hermetic
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
    def test_stereo_rejected(self):
        # hand-build a STREAMINFO with 2 channels
        enc = bytearray(F.encode_flac(_sine(sec=0.05), 16000))
        # STREAMINFO channel bits live in byte 4+4+12 (20-bit sr + 3-bit ch)
        # easier: flip via re-encode of the streaminfo field — patch the byte
        # holding channels-1 (bits 4-6 of byte offset 8+12=20)
        enc[20] = (enc[20] & 0b11110001) | (1 << 1)  # channels-1 = 1
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
