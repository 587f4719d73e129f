"""Codec edge tests: WAV/AIFF round-trips, MP3 encode/decode via the native
shim, FLAC decode of a synthetic stream."""

import os
import struct

import numpy as np
import pytest

from ame_tpu.io import wav as W
from ame_tpu.io import codecs
from ame_tpu.io.audio_file import read_audio, write_audio


def _sig(n=4410, sr=44100, channels=2):
    t = np.arange(n) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    if channels == 2:
        return np.stack([x, 0.8 * x], axis=1)
    return x[:, None]


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_wav_roundtrip(tmp_path, bits):
    x = _sig()
    p = str(tmp_path / "t.wav")
    W.write_wav(p, x, 44100, bits=bits)
    y, sr = W.read_wav(p)
    assert sr == 44100
    assert y.shape == x.shape
    tol = {16: 2 / 32768, 24: 2 / 8388608, 32: 1e-7}[bits]
    np.testing.assert_allclose(y, x, atol=tol)


def test_wav_mono_and_8bit(tmp_path):
    x = _sig(channels=1)
    p = str(tmp_path / "m.wav")
    W.write_wav(p, x[:, 0], 22050, bits=16)
    y, sr = W.read_wav(p)
    assert sr == 22050 and y.shape[1] == 1


def test_aiff_decode(tmp_path):
    """Write a minimal AIFF by hand; decode must match."""
    x = (np.sin(2 * np.pi * 440 * np.arange(1000) / 44100) * 0.5)
    pcm = np.round(x * 32767).astype(">i2")
    payload = np.repeat(pcm, 2).tobytes()  # interleave stereo L=R

    def ext80(rate):
        # normalized 80-bit: 44100 has MSB at bit 15 -> exponent 16383+15
        exp = 16383 + 15
        mant = int(rate) << (63 - 15)
        return struct.pack(">HQ", exp, mant)

    comm = struct.pack(">HIH", 2, len(x), 16) + ext80(44100)
    ssnd = struct.pack(">II", 0, 0) + payload
    body = (b"AIFF"
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    blob = b"FORM" + struct.pack(">I", len(body)) + body
    p = tmp_path / "t.aiff"
    p.write_bytes(blob)
    y, sr = W.read_aiff(str(p))
    assert sr == 44100
    assert y.shape == (1000, 2)
    np.testing.assert_allclose(y[:, 0], pcm.astype(np.float32) / 32768.0,
                               atol=1e-6)


@pytest.mark.skipif(not codecs.have_mp3_encode(), reason="no libmp3lame")
def test_mp3_roundtrip(tmp_path):
    sr = 44100
    n = sr  # 1 second
    t = np.arange(n) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    x = np.stack([x, x], axis=1)
    p = str(tmp_path / "t.mp3")
    codecs.encode_mp3(p, x, sr)
    assert os.path.getsize(p) > 8000
    if codecs.have_mp3_decode():
        y, sr2 = codecs.decode_mp3(p)
        assert sr2 == sr
        assert abs(y.shape[0] - n) < 5000  # codec delay padding
        # the 440 Hz tone must survive: correlate against reference tone
        seg = y[len(y) // 4: len(y) // 4 + 4096, 0]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        peak_hz = np.argmax(spec) * sr / len(seg)
        assert abs(peak_hz - 440) < 15, peak_hz


def test_audio_file_dispatch(tmp_path):
    x = _sig()
    p = str(tmp_path / "d.wav")
    write_audio(p, x, 44100)
    y, sr = read_audio(p)
    assert sr == 44100 and y.shape == x.shape
    with pytest.raises(ValueError):
        write_audio(str(tmp_path / "x.xyz"), x, 44100)


def test_write_wav_int16_passthrough(tmp_path):
    """Pre-quantized int16 samples (the on-device quantize fast path)
    must hit disk verbatim — byte-identical to the float formula on the
    same grid values."""
    import numpy as np
    from ame_tpu.io.wav import read_wav, write_wav

    rng = np.random.default_rng(3)
    # -32768 excluded: the float formula clips at -32767, so only the
    # int16 passthrough can represent it (full-scale negatives keep it)
    pcm = rng.integers(-32767, 32768, size=(1024, 2)).astype(np.int16)
    p_int = str(tmp_path / "i.wav")
    write_wav(p_int, pcm, 44100, bits=16)
    back, sr = read_wav(p_int)
    assert sr == 44100
    np.testing.assert_array_equal(
        np.round(back * 32768.0).astype(np.int16), pcm)

    # the float path on float values that trunc to the same grid
    # (trunc is toward zero, so nudge each value away from zero)
    floats = (pcm + np.where(pcm >= 0, 0.3, -0.3)) / 32767.0
    p_float = str(tmp_path / "f.wav")
    write_wav(p_float, floats, 44100, bits=16)
    assert open(p_int, "rb").read() == open(p_float, "rb").read()


def test_write_aiff_int16_passthrough(tmp_path):
    import numpy as np
    from ame_tpu.io.wav import read_aiff, write_aiff

    pcm = np.array([[1000, -1000], [32767, -32768]], np.int16)
    p = str(tmp_path / "i.aiff")
    write_aiff(p, pcm, 44100, bits=16)
    back, sr = read_aiff(p)
    np.testing.assert_array_equal(
        np.round(back * 32768.0).astype(np.int16), pcm)
