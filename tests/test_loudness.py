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
# ffmpeg loudnorm two-pass semantics (ops/loudnorm.py): linear-mode gates,
# the offset term, and the frame-adaptive DYNAMIC engine
# ---------------------------------------------------------------------------

def _norm(x, sr=SR, **kw):
    from ame_tpu.ops.loudnorm import loudnorm_two_pass
    y, info = loudnorm_two_pass(jnp.asarray(x, jnp.float32), sr, -14.0,
                                **kw)
    return np.asarray(y), {k: float(v) for k, v in info.items()}


def test_measure_reports_thresh():
    """input_thresh is the integrated measurement's relative gate
    (~10 LU below the ungated level); silence reports -70 like ffmpeg."""
    x = make_test_signal("noise", SR * 4, SR) * 0.2
    m = {k: float(v) for k, v in loudness.measure(jnp.asarray(x), SR).items()}
    assert -14.0 < m["input_thresh"] - m["input_i"] < -6.0
    sil = loudness.measure(jnp.asarray(np.zeros((SR * 2, 2), np.float32)), SR)
    assert float(sil["input_thresh"]) == -70.0


def test_gates_quiet_linear():
    """Quiet low-crest program: linear eligible; the gain is exactly
    target_I − measured_I (ffmpeg IGNORES the offset option in linear
    mode — proven in tests/test_golden_ffmpeg.py), so the output lands
    at the target itself."""
    # quiet noise ~ -29 LUFS, low crest (a pure sine would measure LRA
    # exactly 0.0 and trip loudnorm's values-supplied gate — faithful
    # behavior, but not what this test targets)
    x = make_test_signal("noise", SR * 8, SR, seed=5) * 0.02
    y, info = _norm(x)
    assert info["linear_mode"] == 1.0
    assert abs(info["output_i"] - (-14.0)) < 1e-3
    assert abs(info["target_offset"]) < 1.0
    out_i = float(oracles.integrated_lufs(y.astype(np.float64), SR))
    assert abs(out_i - (-14.0)) < 0.1


def test_gates_hot_linear():
    """Already-loud program: negative gain always passes the TP gate."""
    rng = np.random.default_rng(0)
    x = np.clip(rng.normal(size=(SR * 8, 2)) * 0.35, -1, 1)  # ~ -9 LUFS
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
    ceiling -> DYNAMIC mode; the frame-adaptive engine keeps the output
    true peak legal while getting loudness closer to target than the TP
    headroom allows a single gain."""
    from ame_tpu.ops.loudness import true_peak_db
    t = np.arange(SR * 8) / SR
    x = 0.015 * np.sin(2 * np.pi * 300 * t)     # quiet bed ~ -36 LUFS
    x[::SR // 4] = 0.8                           # sparse full-scale clicks
    x = np.stack([x, x], 1)
    y, info = _norm(x)
    assert info["linear_mode"] == 0.0
    out_tp = float(np.asarray(true_peak_db(jnp.asarray(y))))
    assert out_tp <= -1.3
    # better than the best single TP-capped gain could do
    single_gain_out = info["input_i"] + (-1.5 - info["input_tp"])
    out_i = float(oracles.integrated_lufs(y.astype(np.float64), SR))
    assert out_i > single_gain_out + 3.0
    assert out_i <= -12.0


def test_gates_wide_lra_trips_dynamic():
    """LRA above the target 11 LU reverts to dynamic even with headroom;
    the dynamic engine compresses the output's LRA to ~target and lands
    integrated loudness within ~1.5 LU."""
    rng = np.random.default_rng(1)
    secs = 24
    # ~18 dB loud/quiet swings: inside the -20 LU relative gate, so both
    # levels enter the LRA distribution and P95-P10 lands well above 11
    x = rng.normal(size=(SR * secs,)).astype(np.float64) * 0.012
    for s in range(0, secs, 8):
        x[s * SR:(s + 4) * SR] *= 8.0
    x = np.clip(np.stack([x, x], 1), -1, 1)
    y, info = _norm(x)
    assert info["input_lra"] > 11.0
    assert info["linear_mode"] == 0.0
    out = loudness.measure(jnp.asarray(y), SR)
    # below-relative-threshold passages HOLD gain (round-4 pinned real
    # behavior), so the compression is bounded: the REAL filter takes this
    # exact signal from 18.07 to 15.23 LU (measured live); ours lands
    # within 0.1 LU of that
    assert float(out["input_lra"]) < info["input_lra"] - 2.5
    assert abs(float(out["input_lra"]) - 15.23) < 0.3
    assert abs(float(out["input_i"]) - (-14.0)) < 1.5


def test_dynamic_steady_hits_target():
    """Dynamic mode alone (no measured values) on steady content converges
    to the target within ~0.2 LU — the single-pass loudnorm contract."""
    from ame_tpu.ops.loudnorm import dynamic_loudnorm
    x = make_test_signal("noise", SR * 10, SR, seed=7) * 0.05
    y, out = dynamic_loudnorm(jnp.asarray(x), SR, -14.0, -1.5, 11.0)
    got = float(loudness.integrated_lufs(y, SR))
    assert abs(got - (-14.0)) < 0.2, got
    assert abs(float(out["output_i"]) - got) < 0.05


def test_dynamic_gain_is_smooth():
    """The gaussian smoothing bounds frame-to-frame gain steps: no zipper.
    Reconstruct per-frame applied gain from y/x on a varying signal.
    Bound calibrated against the REAL filter: ffmpeg itself steps up to
    1.9 dB/frame on this exact signal (single-pass dynamic), so 2.5 is
    the no-zipper ceiling, not 1.5."""
    from ame_tpu.ops.loudnorm import dynamic_loudnorm
    rng = np.random.default_rng(3)
    x = rng.normal(size=(SR * 12, 2)) * 0.03
    x[SR * 4: SR * 8] *= 6.0
    x = np.clip(x, -1, 1).astype(np.float32)
    y, _ = dynamic_loudnorm(jnp.asarray(x), SR, -14.0, -1.5, 11.0)
    L = SR // 10
    F = (SR * 12) // L
    g = (np.linalg.norm(np.asarray(y)[: F * L].reshape(F, -1), axis=1)
         / np.maximum(np.linalg.norm(x[: F * L].reshape(F, -1), axis=1),
                      1e-9))
    step_db = np.abs(20 * np.log10(np.maximum(g[1:], 1e-6)
                                   / np.maximum(g[:-1], 1e-6)))
    assert np.max(step_db) < 2.5, np.max(step_db)


def test_linear_offset_semantics():
    """loudnorm with measured values applies target - measured_i exactly;
    the offset option is IGNORED in linear mode. ffmpeg's docs say
    otherwise, but the real filter was probed with offset=-2.77 and 6.0
    and produced byte-identical output (tests/test_golden_ffmpeg.py)."""
    from ame_tpu.ops.loudnorm import loudnorm
    x = make_test_signal("noise", SR * 4, SR, seed=9) * 0.1
    xj = jnp.asarray(x)
    m = loudness.measure(xj, SR)
    y, info = loudnorm(xj, SR, -14.0, -1.5, 11.0, measured=m, offset=0.7)
    want = (-14.0) - float(m["input_i"])
    assert info["linear_mode"] == 1.0
    assert abs(float(info["gain_db"]) - want) < 1e-4
    np.testing.assert_allclose(np.asarray(y),
                               x * 10 ** (want / 20.0), rtol=2e-5)


def test_pass1_stats_contract():
    """loudnorm_pass1 returns the full JSON-analog field set and
    target_offset = target - output_i."""
    from ame_tpu.ops.loudnorm import loudnorm_pass1
    x = make_test_signal("noise", SR * 6, SR, seed=11) * 0.08
    s = loudnorm_pass1(jnp.asarray(x), SR, -14.0)
    for k in ("input_i", "input_tp", "input_lra", "input_thresh",
              "output_i", "output_tp", "output_lra", "output_thresh",
              "target_offset"):
        assert k in s, k
    assert abs(float(s["target_offset"])
               - (-14.0 - float(s["output_i"]))) < 1e-5


def test_dynamic_controller_matches_sequential_oracle():
    """The fully-parallel dynamic controller (cumulative histogram +
    hold-fill gather + gaussian correlation) must reproduce the sequential
    frame-by-frame float64 reference of the same spec."""
    from ame_tpu.ops.loudnorm import dynamic_loudnorm
    rng = np.random.default_rng(21)
    n = SR * 12
    x = rng.normal(size=(n, 2)) * 0.03
    x[SR * 4: SR * 7] *= 7.0          # loud middle section
    x[SR * 9: SR * 10] *= 0.05        # near-silent dip (hold branch)
    x = np.clip(x, -1, 1).astype(np.float32)

    y, _ = dynamic_loudnorm(jnp.asarray(x), SR, -14.0, -1.5, 11.0)
    g0, g1 = oracles.loudnorm_dynamic_gains(x, SR, -14.0, -1.5, 11.0)
    # recover the applied per-frame start gain from y/x at frame starts
    L = SR // 10
    F = n // L
    y = np.asarray(y, np.float64)
    num = (y[: F * L] * x[: F * L]).reshape(F, -1).sum(axis=1)
    den = (x[: F * L] * x[: F * L]).reshape(F, -1).sum(axis=1)
    g_eff = num / np.maximum(den, 1e-12)       # LS fit of the frame gain
    g_oracle = (g0 + g1) / 2.0                 # mean of the interp ramp
    err = np.abs(g_eff[:F] - g_oracle[:F]) / np.maximum(g_oracle[:F], 1e-9)
    # f32-vs-f64 measurement differences can flip a 0.1 LU histogram bin;
    # demand tight agreement almost everywhere and sane bounds at worst
    assert np.median(err) < 2e-3, np.median(err)
    assert np.quantile(err, 0.95) < 2e-2, np.quantile(err, 0.95)
    assert err.max() < 0.12, err.max()


def test_true_peak_cache_primed_under_trace_does_not_leak():
    """Regression: if the first true_peak() call happens inside a jit trace,
    the device-staged tile matrix must still cache as a CONCRETE array —
    caching the traced constant leaked a tracer into every later trace
    (UnexpectedTracerError in graph/chain when test order primed it)."""
    import jax

    saved = loudness._tp_mat_dev
    loudness._tp_mat_dev = None
    try:
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (4096, 2)).astype(np.float32) * 0.3)

        @jax.jit
        def f(x):
            return loudness.true_peak(x)

        a = float(f(x))                       # primes the cache under trace
        assert not isinstance(loudness._tp_mat_dev, jax.core.Tracer)
        b = float(loudness.true_peak(x))      # reuse outside any trace
        assert abs(a - b) < 1e-5
    finally:
        loudness._tp_mat_dev = saved
