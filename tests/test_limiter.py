"""Limiter property tests (behavior contract of ffmpeg alimiter params —
SURVEY.md N4: ceiling 0.98, attack 5 ms, release 50 ms)."""

import numpy as np
import jax.numpy as jnp
import pytest

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


# ---------------------------------------------------------------------------
# ffmpeg-contract alimiter (ops/limiter.alimiter_compat) vs the float64
# planner oracle (tests/oracles.alimiter_gain) — VERDICT round-2 item 1:
# quantified parity on hot / quiet / silent / transient / wide fixtures.
# ---------------------------------------------------------------------------

from ame_tpu.ops.limiter import (alimiter_compat, alimiter_stream_init,
                                 alimiter_stream_step)
from tests import oracles


def _alimiter_vs_oracle(x):
    x = np.asarray(x, np.float32)
    y, g = alimiter_compat(jnp.asarray(x), SR, return_gain=True)
    go = oracles.alimiter_gain(np.max(np.abs(x), axis=1), SR)
    return np.asarray(y), np.asarray(g, np.float64), go


def test_alimiter_quiet_and_silent_passthrough():
    rng = np.random.default_rng(0)
    quiet = (rng.normal(size=(SR // 2, 2)) * 0.05).astype(np.float32)
    for x in (quiet, np.zeros((SR // 2, 2), np.float32)):
        y, g, go = _alimiter_vs_oracle(x)
        assert np.all(g == 1.0) and np.all(go == 1.0)
        np.testing.assert_allclose(y, x / 0.98, rtol=1e-6)  # auto-level


@pytest.mark.parametrize("name", ["hot", "transient", "wide"])
def test_alimiter_matches_planner_oracle(name):
    rng = np.random.default_rng(1)
    if name == "hot":
        x = np.clip(rng.normal(size=(SR, 2)) * 0.5, -1.2, 1.2)
    elif name == "transient":
        x = np.full((SR, 2), 0.1)
        x[SR // 2] = 3.0
        x[SR // 2 + 900] = 1.8
    else:
        x = rng.normal(size=(SR * 2, 2)) * 0.1
        x[SR // 2: SR] *= 12.0
        x = np.clip(x, -2, 2)
    y, g, go = _alimiter_vs_oracle(x)
    # skip the first attack window: ffmpeg delays output by `attack`, so a
    # peak at k < A still gets a full-length ramp there; the zero-latency
    # offline form starts its (more attenuated, still ceiling-safe) ramp
    # at sample 0 while the greedy planner descends from 1
    A = int(0.005 * SR)
    active = ((go < 0.9999) | (g < 0.9999))
    active[:A] = False
    err_db = 20 * np.log10(np.maximum(g, 1e-6) / np.maximum(go, 1e-6))
    assert np.abs(err_db[active]).max() < 1.5, np.abs(err_db[active]).max()
    assert np.sqrt((err_db[active] ** 2).mean()) < 0.15
    # ceiling guarantee survives the tangent approximation (gain never
    # ABOVE the planner requirement at limited samples): |y| <= 1 after
    # the 1/limit auto-level
    assert np.max(np.abs(y)) <= 1.0 + 1e-5


def test_alimiter_linear_release_duration():
    """After an isolated peak the gain recovers LINEARLY, reaching 1 in
    ~release (50 ms) regardless of depth — ffmpeg's ramp, not an
    exponential tail."""
    x = np.full((SR, 2), 0.05, np.float32)
    x[SR // 2] = 1.96  # requires gain 0.5
    _, g, go = _alimiter_vs_oracle(x)
    R = int(0.050 * SR)
    rec = g[SR // 2: SR // 2 + R + 400]
    # ~linear: halfway through the release the gain is ~0.75 (exponential
    # with tau=R would be at 1 - 0.5*e^-0.5 = 0.70 and reach 1 only
    # asymptotically)
    assert abs(rec[R // 2] - 0.75) < 0.04, rec[R // 2]
    # at R: recovered to <2% residual depth (the documented tangent tail,
    # tau ~ 0.05R); essentially fully recovered shortly after
    assert rec[R] > 0.98
    assert rec[R + 350] > 0.995
    # and it tracks the oracle through the whole release
    np.testing.assert_allclose(g[SR // 2: SR // 2 + R],
                               go[SR // 2: SR // 2 + R], atol=0.03)


def test_alimiter_attack_reaches_requirement_at_peak():
    x = np.full((SR // 2, 2), 0.05, np.float32)
    k = SR // 4
    x[k] = 1.96
    _, g, go = _alimiter_vs_oracle(x)
    A = int(0.005 * SR)
    assert abs(g[k] - 0.5) < 1e-3          # limit/peak at the peak
    assert g[k - A] > 0.98                  # ramp starts ~A before
    assert abs(go[k] - 0.5) < 1e-6


def test_alimiter_stream_matches_offline():
    rng = np.random.default_rng(4)
    x = np.clip(rng.normal(size=(SR * 2, 2)) * 0.4, -1.5, 1.5).astype(
        np.float32)
    want = np.asarray(alimiter_compat(jnp.asarray(x), SR))
    st = alimiter_stream_init(SR)
    outs = []
    for i in range(0, len(x), 10000):
        y, st = alimiter_stream_step(x[i:i + 10000], st)
        outs.append(np.asarray(y))
    y, st = alimiter_stream_step(np.zeros((0, 2), np.float32), st,
                                 flush=True)
    outs.append(np.asarray(y))
    got = np.concatenate(outs)
    assert got.shape == want.shape
    assert np.abs(got - want).max() <= 1.0 / 32768
