"""Public API contract tests: process_audio orchestration, status-prefix
conventions (Q13), degrade-and-continue error policy (SURVEY.md §5.3)."""

import os

import numpy as np
import pytest

import ame_tpu
from ame_tpu.io import wav as W
from tests.conftest import make_test_signal

SR = 44100


@pytest.fixture
def track(tmp_path):
    x = make_test_signal("noise", SR * 2, SR) * 0.2
    p = str(tmp_path / "in.wav")
    W.write_wav(p, x, SR)
    return p


class CallbackLog:
    def __init__(self):
        self.status = []
        self.progress = []
        self.art = []
        self.tags = []

    def cb(self):
        return (self.status.append,
                lambda c, t: self.progress.append((c, t)),
                self.art.append, self.tags.append)


def test_master_file_end_to_end(track, tmp_path):
    out = str(tmp_path / "out.wav")
    info = ame_tpu.master_file(track, out, {"bass_boost": 2.0,
                                            "lufs": -14.0})
    assert os.path.exists(out)
    assert info["sample_rate"] == SR
    assert abs(info["output_i"] - (-14.0)) < 0.5
    y, sr = W.read_wav(out)
    assert sr == SR and y.shape[1] == 2
    assert np.abs(y).max() <= 0.9801


def test_process_audio_success_contract(track, tmp_path):
    log = CallbackLog()
    settings = {"input_file": track,
                "output_file": str(tmp_path / "m.wav"),
                "bass_boost": 1.0, "create_mp3": True}
    ame_tpu.process_audio(settings, *log.cb())
    assert any("Success:" in s for s in log.status)
    assert not any("Error:" in s for s in log.status)
    # progress must end at (total, total), and the denominator must be
    # num_chunks + 4 from the FIRST emission (the reference's unit,
    # engine:184-187 — no mid-job unit change)
    assert len({t for _, t in log.progress}) == 1
    cur, total = log.progress[-1]
    assert cur == total
    # art callback fired with None (no provider in this env)
    assert log.art == [None]
    assert os.path.exists(str(tmp_path / "m.wav"))
    # MP3 sidecar (native LAME available in this image)
    assert os.path.exists(str(tmp_path / "m.mp3"))


def test_process_audio_error_contract(tmp_path):
    """Missing input: Error: status, progress reset (0, 1), art None,
    'Processing failed.' tag (engine:131-137)."""
    log = CallbackLog()
    settings = {"input_file": str(tmp_path / "nope.wav"),
                "output_file": str(tmp_path / "m.wav")}
    ame_tpu.process_audio(settings, *log.cb())
    assert any(s.startswith("Error:") for s in log.status)
    assert log.progress[-1] == (0, 1)
    assert log.art == [None]
    assert log.tags[-1] == "Processing failed."


def test_process_audio_missing_paths():
    log = CallbackLog()
    ame_tpu.process_audio({}, *log.cb())
    assert any(s.startswith("Error:") for s in log.status)


def test_silent_input_passthrough(tmp_path):
    """Quirk Q9: silent track -> normalize skipped, master still written."""
    x = np.zeros((SR, 2), np.float32)
    p_in = str(tmp_path / "sil.wav")
    p_out = str(tmp_path / "sil_m.wav")
    W.write_wav(p_in, x, SR)
    info = ame_tpu.master_file(p_in, p_out, {"lufs": -14.0})
    y, _ = W.read_wav(p_out)
    assert np.abs(y).max() == 0.0
    assert os.path.exists(p_out)


@pytest.mark.parametrize("bits", [24, 32])
def test_high_res_output(track, tmp_path, bits):
    """--bits 24/32 keeps the quality chain's resolution on disk: the output
    must round-trip with sub-16-bit error vs the float master."""
    out16 = str(tmp_path / "o16.wav")
    out_hi = str(tmp_path / f"o{bits}.wav")
    ame_tpu.master_file(track, out16, {"lufs": -14.0, "bits": 16})
    ame_tpu.master_file(track, out_hi, {"lufs": -14.0, "bits": bits})
    y16, _ = W.read_wav(out16)
    yhi, sr = W.read_wav(out_hi)
    assert sr == SR and yhi.shape == y16.shape
    # same master modulo quantization: the 16-bit path truncs toward zero at
    # *32767 and decodes at /32768 (quirk Q5), so it differs from the hi-res
    # file by at most (1+|x|)/32768; the hi-res file must carry real
    # sub-16-bit detail (not just upscaled int16 values)
    assert np.abs(yhi - y16).max() <= 2.01 / 32768.0
    frac = yhi * 32767.0
    assert np.abs(frac - np.round(frac)).max() > 1e-3


def test_mono_input_forced_stereo(tmp_path):
    x = make_test_signal("tone", SR, SR, channels=1)
    p_in = str(tmp_path / "mono.wav")
    p_out = str(tmp_path / "mono_m.wav")
    W.write_wav(p_in, x, SR)
    ame_tpu.master_file(p_in, p_out, {"lufs": None})
    y, _ = W.read_wav(p_out)
    assert y.shape[1] == 2


def test_master_array_int16_fetch_matches_float_path(tmp_path):
    """The device-quantize int16 fetch fast path (e2e fetch is the
    measured product bottleneck) must produce the same WAV as the host
    float path to within 1 LSB (f32-vs-f64 trunc boundary cases), and
    the identical loudness result."""
    import numpy as np
    import jax.numpy as jnp
    from ame_tpu.api import master_array
    from ame_tpu.io.wav import read_wav

    sr = 44100
    rng = np.random.default_rng(5)
    x = (0.3 * rng.standard_normal((sr, 2))).astype(np.float32)
    settings = {"bass_boost": 1.5, "lufs": None, "mode": "quality"}

    p16 = str(tmp_path / "fast.wav")
    info_fast = master_array(x, sr, p16, settings)

    # force the generic float path by writing 32-bit output
    p32 = str(tmp_path / "slow.wav")
    info_slow = master_array(x, sr, p32, dict(settings, bits=32))

    y16, _ = read_wav(p16)
    y32, _ = read_wav(p32)
    # 16-bit grid vs the unquantized float32 master: trunc error is one
    # step of the /32767 write scale plus the 32767/32768 read-back
    # asymmetry — 2/32768 worst case
    assert np.max(np.abs(y16 - y32)) <= (2.0 / 32768.0) + 1e-7
    assert info_fast["n_samples"] == info_slow["n_samples"]


def test_master_array_int16_staging_bit_identical(tmp_path):
    """Raw int16 input (the PCM16 upload fast path) must produce
    bit-identical output to the equivalent float32 input — k/32768 is
    an exact power-of-2 scale on device and host alike."""
    import numpy as np
    from ame_tpu.api import master_array
    from ame_tpu.io.wav import read_wav

    sr = 44100
    rng = np.random.default_rng(9)
    pcm = (rng.integers(-20000, 20000, size=(sr // 2, 2))
           .astype(np.int16))
    settings = {"bass_boost": 2.0, "width": 1.2, "lufs": None,
                "mode": "quality"}

    p_i = str(tmp_path / "i.wav")
    p_f = str(tmp_path / "f.wav")
    master_array(pcm, sr, p_i, settings)
    master_array(pcm.astype(np.float32) / 32768.0, sr, p_f, settings)
    assert open(p_i, "rb").read() == open(p_f, "rb").read()


def test_read_audio_prefer_int16(tmp_path):
    """prefer_int16 returns raw PCM16 samples for 16-bit WAV and floats
    for everything else."""
    import numpy as np
    from ame_tpu.io import read_audio
    from ame_tpu.io.wav import write_wav

    pcm = np.array([[100, -100], [32767, -32767]], np.int16)
    p16 = str(tmp_path / "a16.wav")
    write_wav(p16, pcm, 44100, bits=16)
    a, sr = read_audio(p16, prefer_int16=True)
    assert a.dtype == np.int16
    np.testing.assert_array_equal(a, pcm)

    p32 = str(tmp_path / "a32.wav")
    write_wav(p32, pcm.astype(np.float32) / 32768.0, 44100, bits=32)
    a32, _ = read_audio(p32, prefer_int16=True)
    assert a32.dtype == np.float32
