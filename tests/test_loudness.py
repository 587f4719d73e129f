"""Loudness tests: sine-wave anchors from BS.1770 + oracle differentials."""

import numpy as np
import jax.numpy as jnp
import pytest

from ame_tpu.ops import loudness
from tests import oracles
from tests.conftest import make_test_signal

SR = 48000


def _tone(freq, n, sr, amp=1.0, channels=2):
    t = np.arange(n) / sr
    x = amp * np.sin(2 * np.pi * freq * t).astype(np.float32)
    return np.stack([x] * channels, axis=1)


def test_bs1770_sine_anchor():
    """BS.1770 anchor: a 0 dBFS 997 Hz sine in ONE channel reads -3.01 LKFS
    (the -0.691 offset cancels the K-filter's +0.691 dB at 997 Hz);
    the same tone in BOTH channels reads 0.0 LKFS."""
    n = SR * 5
    t = np.arange(n) / SR
    tone = np.sin(2 * np.pi * 997.0 * t).astype(np.float32)
    mono_left = np.stack([tone, np.zeros_like(tone)], axis=1)
    stereo = np.stack([tone, tone], axis=1)
    got_mono = float(loudness.integrated_lufs(jnp.asarray(mono_left), SR))
    got_stereo = float(loudness.integrated_lufs(jnp.asarray(stereo), SR))
    assert abs(got_mono - (-3.01)) < 0.05, got_mono
    assert abs(got_stereo - 0.0) < 0.05, got_stereo


def test_matches_oracle_on_noise():
    x = make_test_signal("noise", SR * 4, SR) * 0.2
    got = float(loudness.integrated_lufs(jnp.asarray(x), SR))
    want = oracles.integrated_lufs(x, SR)
    assert abs(got - want) < 0.02, (got, want)


def test_gating_drops_silence():
    """Loud burst + long silence: gating must keep loudness near the burst
    level, not average the silence in."""
    burst = make_test_signal("noise", SR * 2, SR) * 0.3
    silence = np.zeros((SR * 8, 2), np.float32)
    x = np.concatenate([burst, silence], axis=0)
    loud_burst = float(loudness.integrated_lufs(jnp.asarray(burst), SR))
    loud_total = float(loudness.integrated_lufs(jnp.asarray(x), SR))
    assert abs(loud_total - loud_burst) < 1.0
    want = oracles.integrated_lufs(x, SR)
    assert abs(loud_total - want) < 0.02


def test_silence_is_neg_inf():
    x = np.zeros((SR * 2, 2), np.float32)
    got = float(loudness.integrated_lufs(jnp.asarray(x), SR))
    assert got == -np.inf


def test_true_peak_exceeds_sample_peak_on_intersample():
    """A tone near Nyquist/2 with unlucky phase has inter-sample peaks above
    the sample maximum — the 4x oversampled meter must see them."""
    sr = 44100
    n = sr
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * 11025 * t + np.pi / 4).astype(np.float32)
    x = np.stack([x, x], axis=1)
    sample_peak = np.max(np.abs(x))
    tp = float(loudness.true_peak(jnp.asarray(x)))
    assert tp > sample_peak + 0.01
    assert tp <= 1.02  # but not above the analytic amplitude + ripple


def test_normalize_two_pass_hits_target():
    x = make_test_signal("noise", SR * 4, SR) * 0.05
    y, info = loudness.normalize_two_pass(jnp.asarray(x), SR, -14.0)
    out = float(loudness.integrated_lufs(y, SR))
    assert abs(out - (-14.0)) < 0.05, out


def test_normalize_silent_passthrough():
    """Quirk Q9: silent input skips normalization."""
    x = np.zeros((SR * 2, 2), np.float32)
    y, info = loudness.normalize_two_pass(jnp.asarray(x), SR, -14.0)
    np.testing.assert_array_equal(np.asarray(y), x)


def test_lra_sanity():
    """Quiet-then-loud program has a large LRA; steady noise a small one."""
    # 18 dB spread: quiet section stays above the -20 LU relative gate
    quiet = make_test_signal("noise", SR * 5, SR, seed=1) * 0.05
    loud = make_test_signal("noise", SR * 5, SR, seed=2) * 0.4
    steady = make_test_signal("noise", SR * 10, SR, seed=3) * 0.1
    lra_dyn = float(loudness.measure(
        jnp.asarray(np.concatenate([quiet, loud])), SR)["input_lra"])
    lra_steady = float(loudness.measure(jnp.asarray(steady), SR)["input_lra"])
    assert lra_dyn > 8.0, lra_dyn
    assert lra_steady < 3.0, lra_steady
