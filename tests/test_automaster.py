"""Differentiable auto-mastering: gradient-fitting settings must recover a
known spectral tilt."""

import numpy as np
import jax.numpy as jnp

from ame_tpu.models import automaster
from ame_tpu.ops import eq
from tests.conftest import make_test_signal

SR = 44100


def test_fit_recovers_bass_boost():
    """Target = source with +4 dB bass shelf applied; the fit must find a
    positive bass gain and reduce the profile distance."""
    x = jnp.asarray(make_test_signal("noise", SR, SR) * 0.2)
    target = eq.apply_eq_quality(x, SR, 4.0, 0.0, 0.0, 0.0)

    before = automaster._logmel_profile(x, SR)
    tprof = automaster._logmel_profile(target, SR)
    d_before = float(jnp.mean((before - tprof) ** 2))

    fitted = automaster.fit_settings(x, SR, target, steps=60, lr=0.1)
    assert fitted["bass_boost"] > 1.0, fitted
    assert fitted["loss"] < d_before * 0.5, (fitted["loss"], d_before)


def test_fit_identity_stays_neutral():
    """Fitting a track to itself keeps settings near neutral."""
    x = jnp.asarray(make_test_signal("noise", SR // 2, SR, seed=5) * 0.2)
    fitted = automaster.fit_settings(x, SR, x, steps=30, lr=0.05)
    assert abs(fitted["bass_boost"]) < 1.0
    assert abs(fitted["treble_boost"]) < 1.0
    assert 0.7 < fitted["width"] < 1.3


def test_fit_multiband_recovers_compression():
    """Target = source through the quality multiband compressor; fitting
    with optimize_multiband must lower the perceptual objective well below
    its starting value and move thresholds down from the gentle init."""
    from ame_tpu.graph.multiband import multiband_quality

    rng = np.random.default_rng(11)
    n = SR * 2
    # amplitude-modulated noise: dynamics for the compressor to flatten
    env = 0.05 + 0.45 * (np.sin(2 * np.pi * 1.3 *
                                np.arange(n) / SR) > 0)
    x = jnp.asarray((rng.standard_normal((n, 2)) * env[:, None])
                    .astype(np.float32))
    target = multiband_quality(x, SR,
                               jnp.asarray([-28.0, -28.0, -28.0]),
                               jnp.asarray([6.0, 6.0, 6.0]))

    base = automaster.fit_settings(x, SR, target, steps=0,
                                   optimize_multiband=True)
    fitted = automaster.fit_settings(x, SR, target, steps=50, lr=0.1,
                                     optimize_multiband=True)
    assert fitted["multiband"] is True
    assert fitted["loss"] < base["loss"] * 0.7, (fitted["loss"],
                                                 base["loss"])
    assert min(fitted["low_thresh"], fitted["mid_thresh"],
               fitted["high_thresh"]) < -5.0, fitted


def test_fit_multi_resolution_loss_runs():
    x = jnp.asarray(make_test_signal("noise", SR // 2, SR, seed=3) * 0.2)
    from ame_tpu.ops import eq as eq_ops
    target = eq_ops.apply_eq_quality(x, SR, 3.0, 0.0, 0.0, 0.0)
    fitted = automaster.fit_settings(x, SR, target, steps=25, lr=0.1,
                                     multi_resolution=True)
    assert fitted["bass_boost"] > 0.5, fitted
    assert np.isfinite(fitted["loss"])


def test_fit_profile_target_rejects_perceptual():
    import pytest as _pytest
    x = jnp.asarray(make_test_signal("noise", SR // 4, SR) * 0.2)
    prof = automaster._logmel_profile(x, SR)
    with _pytest.raises(ValueError):
        automaster.fit_settings(x, SR, prof, target_is_profile=True,
                                optimize_multiband=True)


def test_fit_stereo_field_recovers_width():
    """Width is INVISIBLE to the mel loss (the mono mixdown is the mid
    signal); with the stereo-field term the fit recovers a widened
    target."""
    rng = np.random.default_rng(8)
    base = (rng.normal(size=(SR // 2, 2)) * 0.15).astype(np.float32)
    base[:, 1] = 0.6 * base[:, 1] + 0.4 * base[:, 0]   # correlated stereo
    x = jnp.asarray(base)
    from ame_tpu.ops import stereo as st_ops
    target = st_ops.stereo_width_quality(x, jnp.float32(1.7))

    blind = automaster.fit_settings(x, SR, target, steps=40, lr=0.1)
    aware = automaster.fit_settings(x, SR, target, steps=40, lr=0.1,
                                    stereo_weight=1.0)
    assert abs(blind["width"] - 1.0) < 0.15, blind    # no gradient signal
    assert aware["width"] > 1.35, aware


def test_fit_true_peak_penalty_caps_boost():
    """A hot source + hinge penalty: the fit backs off gains that would
    push the true peak over the ceiling."""
    t = np.arange(SR // 2) / SR
    x = (0.85 * np.sin(2 * np.pi * 180.0 * t)).astype(np.float32)
    x = jnp.asarray(np.stack([x, x], 1))
    from ame_tpu.ops import eq as eq_ops
    target = eq_ops.apply_eq_quality(x, SR, 5.0, 0.0, 0.0, 0.0)

    free = automaster.fit_settings(x, SR, target, steps=40, lr=0.1,
                                   dynamics_weight=0.0)
    capped = automaster.fit_settings(x, SR, target, steps=40, lr=0.1,
                                     dynamics_weight=0.0,
                                     true_peak_weight=5.0, tp_target=-1.0)
    from ame_tpu.models.automaster import _chain
    import jax
    def out_tp(settings):
        th = {"analog_raw": jnp.float32(-20.0), "width_raw": jnp.float32(0.0),
              "eq_raw": jnp.arctanh(jnp.clip(jnp.asarray(
                  [settings["bass_boost"], -settings["mid_cut"],
                   settings["presence_boost"], settings["treble_boost"]],
                  jnp.float32) / 6.0, -0.999, 0.999))}
        from ame_tpu.ops.loudness import true_peak_db
        return float(true_peak_db(_chain(x, th, SR)))
    assert out_tp(free) > -0.5           # unconstrained fit runs hot
    assert out_tp(capped) < out_tp(free) - 0.5
