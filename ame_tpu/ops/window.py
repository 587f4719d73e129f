"""Sliding-window primitives built from block prefix/suffix scans.

The van Herk / Gil-Werman decomposition: for a window of length W aligned to
blocks of length W, any sliding reduction is a suffix-scan within the current
block combined with a prefix-scan of the adjacent block — O(N) work, no
O(N*W) loops, and no long-cumsum cancellation (all partial sums stay bounded
by one window), which keeps f32 exact enough for detector math.

These feed the limiter (sliding minimum ahead = lookahead; moving average =
attack ramp) and the compressor (windowed RMS detector).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pad_to_blocks(x: jax.Array, w: int, fill: float):
    n = x.shape[0]
    nb = -(-n // w)
    pad = nb * w - n
    xp = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                 constant_values=fill)
    return xp.reshape((nb, w) + x.shape[1:]), n


def _bshape(x, flat_len):
    return (flat_len,) + (1,) * (x.ndim - 1)


@partial(jax.jit, static_argnums=(1,))
def sliding_min_ahead(x: jax.Array, w: int) -> jax.Array:
    """y[n] = min(x[n .. min(n+w-1, N-1)]) along axis 0 (window clipped at
    the end). Decomposition: suffix-min of n's block, combined with the
    prefix-min ending at n+w-1 (min is idempotent, so the overlap at block
    boundaries is harmless)."""
    xb, n = _pad_to_blocks(x, w, jnp.inf)
    suf = jnp.flip(jax.lax.cummin(jnp.flip(xb, axis=1), axis=1), axis=1)
    pre = jax.lax.cummin(xb, axis=1)
    flat_suf = suf.reshape((-1,) + x.shape[1:])
    flat_pre = pre.reshape((-1,) + x.shape[1:])
    flat_len = flat_pre.shape[0]
    nxt = jnp.roll(flat_pre, -(w - 1), axis=0)  # nxt[n] = flat_pre[n+w-1]
    idx = jnp.arange(flat_len)
    valid = (idx + w - 1) < flat_len  # beyond-padding rolls wrap: mask them
    nxt = jnp.where(valid.reshape(_bshape(x, flat_len)), nxt, jnp.inf)
    return jnp.minimum(flat_suf, nxt)[:n]


def sliding_max_ahead(x: jax.Array, w: int) -> jax.Array:
    return -sliding_min_ahead(-x, w)


@partial(jax.jit, static_argnums=(1,))
def moving_sum_past(x: jax.Array, w: int) -> jax.Array:
    """y[n] = sum of x[max(0, n-w+1) .. n] along axis 0 (window clipped at
    the start)."""
    xb, n = _pad_to_blocks(x, w, 0.0)
    pre = jnp.cumsum(xb, axis=1)
    suf = jnp.flip(jnp.cumsum(jnp.flip(xb, axis=1), axis=1), axis=1)
    flat_pre = pre.reshape((-1,) + x.shape[1:])
    flat_suf = suf.reshape((-1,) + x.shape[1:])
    flat_len = flat_pre.shape[0]
    idx = jnp.arange(flat_len)
    r = idx % w
    prv = jnp.roll(flat_suf, w - 1, axis=0)  # prv[n] = flat_suf[n-w+1]
    # remainder is zero when (a) the window starts inside n's own block
    # (r == w-1 means the window IS the block), or (b) the window is
    # start-clipped (n-w+1 < 0).
    use_prv = (r != (w - 1)) & (idx >= w - 1)
    prv = jnp.where(use_prv.reshape(_bshape(x, flat_len)), prv, 0.0)
    return (flat_pre + prv)[:n]


@partial(jax.jit, static_argnums=(1,))
def moving_mean_past(x: jax.Array, w: int) -> jax.Array:
    """Moving average with start-clipped window (divisor = actual count)."""
    s = moving_sum_past(x, w)
    count = jnp.minimum(jnp.arange(1, x.shape[0] + 1), w).astype(x.dtype)
    return s / count.reshape((-1,) + (1,) * (x.ndim - 1))


@partial(jax.jit, static_argnums=(1,))
def windowed_sum_exclusive(x: jax.Array, w: int) -> jax.Array:
    """y[n] = sum of x[n-w .. n-1] (window strictly before n; ZERO while the
    full window doesn't fit — pydub's detector sees an empty slice and
    rms == 0 for the first ``w`` frames, SURVEY.md N7)."""
    s = moving_sum_past(x, w)  # inclusive window ending at n
    shifted = jnp.concatenate(
        [jnp.zeros((1,) + x.shape[1:], x.dtype), s[:-1]], axis=0)
    idx = jnp.arange(x.shape[0])
    full = idx >= w
    return jnp.where(full.reshape((-1,) + (1,) * (x.ndim - 1)), shifted, 0.0)


def _shift_right_fill(x, k, axis, fill):
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis] - k)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (k, 0)
    return jnp.pad(x[tuple(sl)], pad, constant_values=fill)


@jax.jit
def release_scan(u: jax.Array, decay: float | jax.Array) -> jax.Array:
    """y[n] = max(u[n], decay * y[n-1]) — exponential-release envelope in the
    (multiply, max) semiring, as a blocked Kogge-Stone scan with constant
    per-level decay factors (graph size independent of N; y[-1] = 0)."""
    decay = jnp.asarray(decay, u.dtype)
    n = u.shape[0]
    L = 1 << min(16, max(n - 1, 1).bit_length())
    nb = -(-n // L)
    up = jnp.pad(u, [(0, nb * L - n)] + [(0, 0)] * (u.ndim - 1),
                 constant_values=0.0)
    ub = up.reshape((nb, L) + u.shape[1:])

    Y = ub
    dl = decay
    shift = 1
    while shift < L:
        Ys = _shift_right_fill(Y, shift, 1, 0.0)
        Y = jnp.maximum(Y, dl * Ys)
        dl = dl * dl
        shift *= 2
    dL = dl  # decay^L

    e = Y[:, -1]  # zero-state end-of-block values

    def step(c, eb):
        return jnp.maximum(eb, dL * c), c

    c0 = jnp.zeros(u.shape[1:], u.dtype)
    _, Cpre = jax.lax.scan(step, c0, e)  # value at block start

    k = jnp.arange(1, L + 1, dtype=u.dtype)
    powers = jnp.exp(k * jnp.log(jnp.maximum(decay, 1e-30)))
    corr = powers.reshape((1, L) + (1,) * (u.ndim - 1)) * \
        Cpre.reshape((nb, 1) + u.shape[1:])
    y = jnp.maximum(Y, corr)
    return y.reshape((nb * L,) + u.shape[1:])[:n]
