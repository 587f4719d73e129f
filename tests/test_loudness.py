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


# ---------------------------------------------------------------------------
# loudnorm pass-2 linear-mode eligibility (ffmpeg gates, VERDICT item 4)
# ---------------------------------------------------------------------------
# Hand-derived fixtures against the documented loudnorm behavior: pass 2
# with measured_* values applies a LINEAR gain only when the gain would not
# push the true peak past target_tp AND measured LRA <= target LRA (11);
# otherwise it reverts to dynamic mode. The rebuild's dynamic stand-in is a
# TP-capped single gain (documented in ops/loudness.py) — these tests pin
# the gate decisions and the <0.1 dB loudness parity on the linear paths.

def _norm(x, sr=SR, **kw):
    from ame_tpu.ops.loudness import normalize_two_pass
    y, info = normalize_two_pass(jnp.asarray(x, jnp.float32), sr,
                                 ffmpeg_gates=True, **kw)
    return np.asarray(y), {k: float(v) for k, v in info.items()}


def test_gates_quiet_linear():
    """Quiet low-crest program: linear eligible, lands on target ±0.1 dB."""
    t = np.arange(SR * 4) / SR
    x = 0.04 * np.sin(2 * np.pi * 400 * t)  # ~ -28 LUFS, TP ~ -28 dB
    x = np.stack([x, x], 1)
    y, info = _norm(x)
    assert info["linear_mode"] == 1.0
    assert abs(info["output_i"] - (-14.0)) < 1e-4
    out_i = float(oracles.integrated_lufs(y.astype(np.float64), SR))
    assert abs(out_i - (-14.0)) < 0.1


def test_gates_hot_linear():
    """Already-loud program: negative gain always passes the TP gate."""
    rng = np.random.default_rng(0)
    x = np.clip(rng.normal(size=(SR * 4, 2)) * 0.35, -1, 1)  # ~ -9 LUFS
    y, info = _norm(x)
    assert info["linear_mode"] == 1.0
    assert info["gain_db"] < 0
    out_i = float(oracles.integrated_lufs(y.astype(np.float64), SR))
    assert abs(out_i - (-14.0)) < 0.1


def test_gates_silent_passthrough():
    x = np.zeros((SR, 2), np.float32)
    y, info = _norm(x)
    np.testing.assert_array_equal(y, x)
    assert info["gain_db"] == 0.0


def test_gates_tp_trips_dynamic():
    """Quiet but peaky program (big crest): the +gain would blow the TP
    ceiling -> dynamic mode; the stand-in caps gain to TP headroom so the
    output true peak stays legal."""
    from ame_tpu.ops.loudness import true_peak_db
    t = np.arange(SR * 4) / SR
    x = 0.015 * np.sin(2 * np.pi * 300 * t)     # quiet bed ~ -36 LUFS
    x[::SR // 4] = 0.8                           # sparse full-scale clicks
    x = np.stack([x, x], 1)
    y, info = _norm(x)
    assert info["linear_mode"] == 0.0
    headroom = -1.5 - info["input_tp"]
    assert abs(info["gain_db"] - headroom) < 1e-4  # capped, not full offset
    assert info["gain_db"] < (-14.0 - info["input_i"]) - 3.0
    out_tp = float(np.asarray(true_peak_db(jnp.asarray(y))))
    assert out_tp <= -1.4


def test_gates_wide_lra_trips_dynamic():
    """LRA above the target 11 LU reverts to dynamic even with headroom."""
    rng = np.random.default_rng(1)
    secs = 16
    # ~18 dB loud/quiet swings: inside the -20 LU relative gate, so both
    # levels enter the LRA distribution and P95-P10 lands well above 11
    x = rng.normal(size=(SR * secs,)).astype(np.float64) * 0.012
    for s in range(0, secs, 8):
        x[s * SR:(s + 4) * SR] *= 8.0
    x = np.clip(np.stack([x, x], 1), -1, 1)
    y, info = _norm(x)
    assert info["input_lra"] > 11.0
    assert info["linear_mode"] == 0.0
