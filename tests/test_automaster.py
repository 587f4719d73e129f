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
