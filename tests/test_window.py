"""Sliding-window primitive tests vs brute-force numpy oracles."""

import numpy as np
import pytest
import jax.numpy as jnp

from ame_tpu.ops import window


@pytest.mark.parametrize("n,w", [(100, 7), (100, 100), (64, 8), (33, 5),
                                 (5, 9), (256, 1)])
def test_sliding_min_ahead(n, w, rng):
    x = rng.standard_normal(n).astype(np.float32)
    want = np.array([x[i:i + w].min() for i in range(n)])
    got = np.asarray(window.sliding_min_ahead(jnp.asarray(x), w))
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("n,w", [(100, 7), (100, 100), (64, 8), (33, 5),
                                 (5, 9), (256, 1)])
def test_moving_sum_past(n, w, rng):
    x = rng.standard_normal(n).astype(np.float32)
    want = np.array([x[max(0, i - w + 1):i + 1].sum() for i in range(n)])
    got = np.asarray(window.moving_sum_past(jnp.asarray(x), w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,w", [(100, 7), (64, 8), (33, 5), (256, 1)])
def test_windowed_sum_exclusive(n, w, rng):
    x = rng.standard_normal(n).astype(np.float32)
    want = np.array([x[i - w:i].sum() if i >= w else 0.0 for i in range(n)])
    got = np.asarray(window.windowed_sum_exclusive(jnp.asarray(x), w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_moving_mean_past(rng):
    x = rng.standard_normal(50).astype(np.float32)
    got = np.asarray(window.moving_mean_past(jnp.asarray(x), 8))
    want = np.array([x[max(0, i - 7):i + 1].mean() for i in range(50)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_release_scan(rng):
    u = np.abs(rng.standard_normal(200)).astype(np.float32)
    decay = 0.95
    want = np.zeros_like(u)
    acc = 0.0
    for i in range(len(u)):
        acc = max(u[i], decay * acc)
        want[i] = acc
    got = np.asarray(window.release_scan(jnp.asarray(u), decay))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_stereo_channel_dim(rng):
    x = rng.standard_normal((40, 2)).astype(np.float32)
    got = np.asarray(window.sliding_min_ahead(jnp.asarray(x), 6))
    for c in range(2):
        want = np.array([x[i:i + 6, c].min() for i in range(40)])
        np.testing.assert_allclose(got[:, c], want)
