"""Resampler tests: tone preservation, length, energy."""

import numpy as np
import pytest
import jax.numpy as jnp

from ame_tpu.ops.resample import resample


def _tone(freq, n, sr):
    return np.sin(2 * np.pi * freq * np.arange(n) / sr).astype(np.float32)


@pytest.mark.parametrize("in_rate,out_rate", [(44100, 22050),
                                              (48000, 22050),
                                              (22050, 44100)])
def test_tone_survives(in_rate, out_rate):
    n = in_rate  # 1 second
    x = _tone(1000.0, n, in_rate)
    y = np.asarray(resample(jnp.asarray(x), in_rate, out_rate))
    assert abs(len(y) - out_rate) <= 1
    # frequency preserved: peak of the spectrum at 1 kHz
    w = np.hanning(len(y))
    spec = np.abs(np.fft.rfft(y * w))
    peak_hz = np.argmax(spec) * out_rate / len(y)
    assert abs(peak_hz - 1000.0) < 5.0, peak_hz
    # amplitude preserved within a few percent
    mid = y[len(y) // 4: -len(y) // 4]
    assert abs(np.max(np.abs(mid)) - 1.0) < 0.05


def test_decimation_kills_aliases():
    """Content above the target Nyquist must be attenuated, not folded."""
    sr_in, sr_out = 44100, 22050
    x = _tone(15000.0, sr_in, sr_in)  # above 11.025 kHz target Nyquist
    y = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
    assert np.sqrt(np.mean(y[2000:-2000] ** 2)) < 0.02


def test_identity_rate():
    x = _tone(440.0, 1000, 44100)
    y = resample(jnp.asarray(x), 44100, 44100)
    np.testing.assert_array_equal(np.asarray(y), x)


def test_stereo_shape():
    x = np.stack([_tone(440, 4410, 44100), _tone(880, 4410, 44100)], 1)
    y = np.asarray(resample(jnp.asarray(x), 44100, 22050))
    assert y.shape == (2205, 2)


def test_positions_exact_no_drift():
    """Integer-phase positions are exact at any output index: a 5-minute
    44.1k->22.05k stream's last position must be bit-exact (the old f32
    accumulation drifted ~0.1 sample by minute 5), and an irrational-ish
    ratio (48k->44.1k) must match Fraction arithmetic exactly."""
    from fractions import Fraction
    from ame_tpu.ops.resample import _positions

    for in_rate, out_rate in ((44100, 22050), (48000, 44100),
                              (44100, 48000)):
        n_out = out_rate * 300  # 5 minutes
        base, frac = _positions(n_out, in_rate, out_rate)
        r = Fraction(in_rate, out_rate)
        for m in (0, 1, n_out // 2, n_out - 2, n_out - 1):
            pos = m * r
            assert base[m] == pos.numerator // pos.denominator
            want_frac = float(pos - (pos.numerator // pos.denominator))
            assert abs(float(frac[m]) - want_frac) < 2e-7


def test_no_x64_warning():
    """The resampler must not request float64 without x64 enabled."""
    import warnings
    x = _tone(440.0, 44100, 44100)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        np.asarray(resample(jnp.asarray(x), 44100, 22050))
