"""Limiter property tests (behavior contract of ffmpeg alimiter params —
SURVEY.md N4: ceiling 0.98, attack 5 ms, release 50 ms)."""

import numpy as np
import jax.numpy as jnp

from ame_tpu.ops.limiter import lookahead_limiter
from tests.conftest import make_test_signal

SR = 44100


def test_hard_ceiling():
    x = make_test_signal("noise", SR, SR) * 8.0  # hot signal
    y = np.asarray(lookahead_limiter(jnp.asarray(x), SR, ceiling=0.98))
    assert np.max(np.abs(y)) <= 0.98 + 1e-5


def test_below_ceiling_passthrough():
    x = make_test_signal("tone", SR // 2, SR) * 0.5  # peak 0.25-ish
    y = np.asarray(lookahead_limiter(jnp.asarray(x), SR, ceiling=0.98))
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_anticipatory_ramp_and_release():
    """A single loud transient: gain must start easing BEFORE the peak
    (lookahead) and recover gradually after (release)."""
    n = SR
    x = np.zeros((n, 2), np.float32)
    x[:, :] = 0.1
    peak_at = n // 2
    x[peak_at] = 4.0
    y, gain = lookahead_limiter(jnp.asarray(x), SR, ceiling=0.98,
                                return_gain=True)
    gain = np.asarray(gain)
    attack = int(0.005 * SR)
    # at the peak: hard limit honored
    assert abs(np.asarray(y)[peak_at, 0]) <= 0.98 + 1e-5
    # before the peak (inside lookahead): gain already reduced
    assert gain[peak_at - attack // 2] < 0.9
    # well before the peak: untouched
    assert gain[peak_at - 4 * attack] > 0.999
    # release: gain recovers monotonically-ish after the transient
    g_after = gain[peak_at + attack:]
    assert g_after[-1] > 0.99
    assert np.all(np.diff(g_after) > -1e-4)


def test_stereo_link():
    """Both channels get the same gain (no image shift)."""
    n = SR // 2
    x = np.zeros((n, 2), np.float32)
    x[:, 0] = 0.2
    x[:, 1] = 0.2
    x[n // 2, 0] = 3.0  # only left clips
    y = np.asarray(lookahead_limiter(jnp.asarray(x), SR))
    # right channel must dip where left was limited
    assert y[n // 2, 1] < 0.2 * 0.9
