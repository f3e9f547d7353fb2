"""IMA/DVI4 ADPCM codec (functions/adpcm.py) — from the public IMA spec."""

import numpy as np
import pyarrow as pa
import pytest

from spiderray.functions.adpcm import (MAGIC, STEP_TABLE, AdpcmError,
                                       decode_ima, encode_ima)


def _tone(sr=16000, secs=1.0):
    t = np.arange(int(sr * secs)) / sr
    x = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 730 * t)
    return (x * 32767).astype(np.int16)


class TestAdpcm:
    def test_roundtrip_snr_meets_30db_bar(self):
        pcm = _tone()
        dec = decode_ima(encode_ima(pcm))
        assert len(dec) == len(pcm)
        err = dec.astype(np.float64) - pcm.astype(np.float64)
        snr = 10 * np.log10((pcm.astype(np.float64) ** 2).mean()
                            / (err ** 2).mean())
        assert snr >= 30.0, snr  # the north rule's decoded-PCM bar

    def test_compression_is_4_to_1(self):
        pcm = _tone()
        buf = encode_ima(pcm)
        assert len(buf) - 12 == (len(pcm) + 1) // 2

    def test_hand_decoded_first_nibbles(self):
        # pred0=0, index0=0, step=7; nibble 0b0011 → delta=7>>3+7>>2+7>>1
        pcm = np.array([0], dtype=np.int16)
        buf = bytearray(encode_ima(pcm))
        # replace payload with a known nibble pair: 0x3 then 0x8
        stream = bytes(buf[:12]) + bytes([0x83])
        out = decode_ima(stream[:12] + bytes([0x83]))
        assert len(out) == 1  # n_samples=1: second nibble ignored
        step = STEP_TABLE[0]
        delta = (step >> 3) + (step >> 2) + (step >> 1)
        assert out[0] == delta

    def test_corrupt_streams_refused(self):
        pcm = _tone(secs=0.01)
        buf = encode_ima(pcm)
        with pytest.raises(AdpcmError):
            decode_ima(b"XXXX" + buf[4:])
        with pytest.raises(AdpcmError):
            decode_ima(buf[: len(buf) // 2])
        with pytest.raises(AdpcmError):
            decode_ima(buf[:4])

    def test_decode_through_feature_stage(self):
        from spiderray.config import PipelineConfig
        from spiderray.stages.multimodal import AudioFeatureActor

        pcm = _tone(secs=0.25)
        batch = pa.table({
            "clip_id": ["a", "b"],
            "bytes": [encode_ima(pcm), b"IMA1garbage!"],
            "codec": ["adpcm_ima", "adpcm_ima"],
            "sr_hz": [16000, 16000],
        })
        out = AudioFeatureActor(PipelineConfig())(batch).to_pandas()
        assert bool(out.loc[0, "decode_ok"])
        assert int(out.loc[0, "n_samples"]) == len(pcm)
        assert not bool(out.loc[1, "decode_ok"])  # corrupt marks, not crashes


def _wav_adpcm(pcm: np.ndarray, sr=16000, block_align=256, n_ch=1,
               fmt_tag=0x11) -> bytes:
    import struct

    from spiderray.functions.adpcm import encode_wav_ima, encode_wav_ms

    if fmt_tag == 0x11:
        data = encode_wav_ima(pcm, block_align, n_ch)
        spb = (block_align - 4) * 2 + 1
    else:
        data = encode_wav_ms(pcm, block_align, n_ch)
        spb = 2 + (block_align - 7 * n_ch) * 2 // n_ch
    fmt = struct.pack("<HHIIHHHH", fmt_tag, n_ch, sr,
                      sr * block_align // spb, block_align, 4, 2, spb)
    out = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(out) + 4) + out


def _wav_ima(pcm: np.ndarray, sr=16000, block_align=256, n_ch=1) -> bytes:
    return _wav_adpcm(pcm, sr, block_align, n_ch, 0x11)


def _snr(ref16: np.ndarray, dec_f32: np.ndarray) -> float:
    n = min(len(ref16), len(dec_f32))
    err = dec_f32[:n] * 32767.0 - ref16[:n].astype(np.float64)
    return 10 * np.log10((ref16[:n].astype(np.float64) ** 2).mean()
                         / (err ** 2).mean())


class TestWavIma:
    def test_wav_0x11_decodes_through_wav_parser(self):
        from spiderray.stages.multimodal import _parse_wav

        pcm = _tone(secs=0.5)
        assert _snr(pcm, _parse_wav(_wav_ima(pcm))) >= 30.0

    def test_stereo_word_interleave_decodes_to_downmix(self):
        from spiderray.stages.multimodal import _parse_wav

        l, r = _tone(secs=0.5), _tone(secs=0.5)
        inter = np.empty(2 * len(l), dtype=np.int16)
        inter[0::2], inter[1::2] = l, r
        x = _parse_wav(_wav_ima(inter, n_ch=2))
        # identical channels: downmix must reproduce either channel
        assert _snr(l, x) >= 30.0

    def test_stereo_channels_kept_separate(self):
        from spiderray.functions.adpcm import decode_wav_ima, encode_wav_ima

        l, r = _tone(), -_tone()  # anti-phase channels
        inter = np.empty(2 * len(l), dtype=np.int16)
        inter[0::2], inter[1::2] = l, r
        dec = decode_wav_ima(encode_wav_ima(inter, 256, 2), 256, 2)
        n = len(l)
        assert _snr(l, dec[0::2][:n].astype(np.float64) / 32767.0) >= 30.0
        assert _snr(r, dec[1::2][:n].astype(np.float64) / 32767.0) >= 30.0

    def test_corrupt_refused(self):
        from spiderray.stages.multimodal import DecodeUnsupported, _parse_wav

        pcm = _tone(secs=0.05)
        # corrupt block index: byte 2 of the first block
        buf = bytearray(_wav_ima(pcm))
        data_at = buf.find(b"data") + 8
        buf[data_at + 2] = 200
        with pytest.raises(DecodeUnsupported, match="index"):
            _parse_wav(bytes(buf))

    def test_block_boundary_continuity(self):
        from spiderray.functions.adpcm import decode_wav_ima, encode_wav_ima

        # a ramp across several 16-byte blocks: per-block headers restart
        # pred at the true sample, so block seams introduce no glitch
        pcm = np.linspace(-20000, 20000, 200).astype(np.int16)
        dec = decode_wav_ima(encode_wav_ima(pcm, 16), 16)[: len(pcm)]
        assert np.abs(dec.astype(np.int64) - pcm.astype(np.int64)).max() < 2500


class TestWavMs:
    """WAV format 0x02 (Microsoft ADPCM) — functions/adpcm.decode_wav_ms."""

    def test_mono_roundtrip_snr(self):
        from spiderray.functions.adpcm import decode_wav_ms, encode_wav_ms

        pcm = _tone()
        dec = decode_wav_ms(encode_wav_ms(pcm, 256, 1), 256, 1)
        assert len(dec) >= len(pcm)
        assert _snr(pcm, dec[: len(pcm)].astype(np.float64) / 32767.0) >= 30.0

    def test_stereo_through_wav_parser(self):
        from spiderray.stages.multimodal import _parse_wav

        l = _tone(secs=0.5)
        inter = np.empty(2 * len(l), dtype=np.int16)
        inter[0::2], inter[1::2] = l, l
        assert _snr(l, _parse_wav(_wav_adpcm(inter, n_ch=2,
                                             fmt_tag=0x02))) >= 30.0

    def test_hand_decoded_known_block(self):
        # predictor 0 (c1=256,c2=0): pred = s1 + signed_code*delta
        from spiderray.functions.adpcm import decode_wav_ms

        import struct
        head = bytes([0]) + struct.pack("<hhh", 16, 100, 50)
        # codes: +1 then -2 (0xE = -2): s=100+16=116 then
        # delta = max(16,(230*16)>>8)=16 → s=116-2*16=84
        block = head + bytes([0x1E]) + b"\x00" * 8
        out = decode_wav_ms(block, len(block), 1)
        assert list(out[:4]) == [50, 100, 116, 84]

    def test_corrupt_predictor_refused(self):
        from spiderray.functions.adpcm import AdpcmError, decode_wav_ms

        with pytest.raises(AdpcmError, match="predictor"):
            decode_wav_ms(bytes([9]) + b"\x00" * 20, 21, 1)

    def test_through_feature_stage_as_wav(self):
        from spiderray.config import PipelineConfig
        from spiderray.stages.multimodal import AudioFeatureActor

        pcm = _tone(secs=0.25)
        batch = pa.table({
            "clip_id": ["a"],
            "bytes": [_wav_adpcm(pcm, fmt_tag=0x02)],
            "codec": ["wav"],
            "sr_hz": [16000],
        })
        out = AudioFeatureActor(PipelineConfig())(batch).to_pandas()
        assert bool(out.loc[0, "decode_ok"])
        assert int(out.loc[0, "n_samples"]) >= len(pcm)


def _wav_raw(data: bytes, fmt_tag: int, n_ch: int, bits: int, sr=16000,
             extensible=False) -> bytes:
    import struct

    if extensible:
        sub = struct.pack("<H", fmt_tag) + b"\x00\x00" + b"\x10" * 12
        fmt = struct.pack("<HHIIHHHHI", 0xFFFE, n_ch, sr,
                          sr * n_ch * bits // 8, n_ch * bits // 8, bits,
                          22, bits, 0x3) + sub
    else:
        fmt = struct.pack("<HHIIHH", fmt_tag, n_ch, sr,
                          sr * n_ch * bits // 8, n_ch * bits // 8, bits)
    out = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(out) + 4) + out


class TestWavFloatExtensible:
    def test_float32_wav(self):
        from spiderray.stages.multimodal import _parse_wav

        x = (_tone(secs=0.2).astype(np.float32) / 32767.0)
        out = _parse_wav(_wav_raw(x.astype("<f4").tobytes(), 3, 1, 32))
        assert np.allclose(out, x, atol=1e-6)

    def test_float64_wav_and_nan_scrub(self):
        from spiderray.stages.multimodal import _parse_wav

        x = np.array([0.5, np.nan, -0.25, np.inf], dtype="<f8")
        out = _parse_wav(_wav_raw(x.tobytes(), 3, 1, 64))
        assert list(out) == [np.float32(0.5), 0.0, np.float32(-0.25), 0.0]

    def test_extensible_wraps_pcm16(self):
        from spiderray.stages.multimodal import _parse_wav

        pcm = _tone(secs=0.2)
        out = _parse_wav(_wav_raw(pcm.astype("<i2").tobytes(), 1, 1, 16,
                                  extensible=True))
        assert _snr(pcm, out) > 60

    def test_extensible_wraps_float32_stereo(self):
        from spiderray.stages.multimodal import _parse_wav

        l = (_tone(secs=0.2).astype(np.float32) / 32767.0)
        inter = np.empty(2 * len(l), dtype="<f4")
        inter[0::2] = l
        inter[1::2] = l
        out = _parse_wav(_wav_raw(inter.tobytes(), 3, 2, 32,
                                  extensible=True))
        assert np.allclose(out, l, atol=1e-6)  # identical channels downmix


class TestWavMsMultichannel:
    def test_three_channel_codes_not_divisible_marks_not_crashes(self):
        # 3 channels, block with 22 codes (not divisible by 3): decoder
        # must floor to complete cross-channel groups, never IndexError
        from spiderray.functions.adpcm import decode_wav_ms

        import struct
        head = bytes([0, 0, 0])
        head += struct.pack("<hhh", 16, 16, 16)      # ideltas
        head += struct.pack("<hhh", 100, 200, 300)   # sample1 per ch
        head += struct.pack("<hhh", 10, 20, 30)      # sample2 per ch
        block = head + b"\x11" * 11                  # 22 codes
        out = decode_wav_ms(block, len(block), 3)
        assert len(out) % 3 == 0
        assert list(out[:3]) == [10, 20, 30]  # sample2 first, per channel


class TestMsSamplesPerBlock:
    """Round-3 ADVICE: a partially-filled final MS-ADPCM block must not
    decode its zero-pad codes into spurious trailing samples."""

    def test_cap_truncates_block_output(self):
        import struct

        from spiderray.functions.adpcm import decode_wav_ms, encode_wav_ms

        pcm = _tone()[:300]  # one 256-byte block holds 500 frames -> padded
        data = encode_wav_ms(pcm, block_align=256)
        full = decode_wav_ms(data, 256)
        capped = decode_wav_ms(data, 256, samples_per_block=300)
        assert len(full) == 500  # pad codes decode without the cap
        assert len(capped) == 300
        np.testing.assert_array_equal(capped, full[:300])

    def test_fact_chunk_truncates_container_decode(self):
        import struct

        from spiderray.functions.adpcm import encode_wav_ms, wav_adpcm_container
        from spiderray.stages.multimodal import _parse_wav

        pcm = _tone()[:300]
        data = encode_wav_ms(pcm, block_align=256)
        cont = wav_adpcm_container(data, 2, 1, 16000, 256, 500)
        # splice in a fact chunk declaring the true 300-frame length
        fact = b"fact" + struct.pack("<I", 4) + struct.pack("<I", 300)
        idx = cont.find(b"data")
        patched = cont[:idx] + fact + cont[idx:]
        patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
        assert len(_parse_wav(cont)) == 500
        assert len(_parse_wav(patched)) == 300

    def test_extensible_ms_adpcm_gets_samples_per_block_cap(self):
        """Round-4 review finding: EXTENSIBLE-wrapped (0xFFFE/SubFormat
        0x02) MS-ADPCM must honor the Samples union's wSamplesPerBlock."""
        import struct

        from spiderray.functions.adpcm import encode_wav_ms
        from spiderray.stages.multimodal import _parse_wav

        pcm = _tone()[:300]
        data = encode_wav_ms(pcm, block_align=256)
        # fmt: 16 base bytes + cbSize=22 + Samples(wSamplesPerBlock=300)
        # + dwChannelMask + 16-byte SubFormat GUID starting 0x0002
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 16000, 256, 4)
        fmt += struct.pack("<HHI", 22, 300, 0)
        fmt += struct.pack("<H", 0x0002) + b"\x00\x00" + b"\x00" * 12
        cont = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        cont = b"RIFF" + struct.pack("<I", len(cont) + 4) + cont
        assert len(_parse_wav(cont)) == 300

    def test_fact_zero_means_unknown_not_empty(self):
        """dwSampleLength == 0 is 'unknown' (some streaming encoders):
        must not truncate the decode to an empty array."""
        import struct

        from spiderray.functions.adpcm import encode_wav_ms, wav_adpcm_container
        from spiderray.stages.multimodal import _parse_wav

        pcm = _tone()[:300]
        data = encode_wav_ms(pcm, block_align=256)
        cont = wav_adpcm_container(data, 2, 1, 16000, 256, 500)
        fact = b"fact" + struct.pack("<I", 4) + struct.pack("<I", 0)
        idx = cont.find(b"data")
        patched = cont[:idx] + fact + cont[idx:]
        patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
        assert len(_parse_wav(patched)) == 500
