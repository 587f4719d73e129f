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


_LB = 128  # tile length for the matmul formulations

# Banded tile matrices are tiny and shape-keyed; cache the numpy builds.
import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=64)
def _moving_sum_matrix(w: int, p: int, dt_name: str) -> _np.ndarray:
    """[LB, (p+1)*LB] 0/1 band: out[t] sums xcat[v] for
    p*LB + t - w + 1 <= v <= p*LB + t (xcat = p lead tiles | current)."""
    Lb = _LB
    t = _np.arange(Lb)[:, None]
    v = _np.arange((p + 1) * Lb)[None, :]
    hi = p * Lb + t
    return ((v <= hi) & (v >= hi - w + 1)).astype(_np.dtype(dt_name))


@partial(jax.jit, static_argnums=(1,))
def _moving_sum_tiles(x: jax.Array, w: int) -> jax.Array:
    """Tile-matmul moving sum (see ops/tile_conv.py for why matmuls beat
    level passes here): the rectangular window is a banded [LB, (p+1)*LB]
    matrix applied to (p lead tiles | current tile) columns — one MXU
    einsum, ~(p+1)*LB MACs/sample. Start clipping falls out of the zero
    lead padding. Measured 16 ms -> ~1 ms at w=220 on [2^23, 3] (v5e)."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n, c = x.shape
    Lb = _LB
    p = -(-(w - 1) // Lb)
    nb = -(-n // Lb)
    xp = jnp.pad(x, ((p * Lb, nb * Lb - n), (0, 0)))
    xt = xp.reshape(nb + p, Lb, c)
    xcat = jnp.concatenate([xt[i:i + nb] for i in range(p + 1)], axis=1)
    M = jnp.asarray(_moving_sum_matrix(w, p, x.dtype.name), x.dtype)
    y = jnp.einsum("tv,bvc->btc", M, xcat,
                   precision=jax.lax.Precision.HIGHEST)
    y = y.reshape(nb * Lb, c)[:n]
    return y[:, 0] if squeeze else y


@partial(jax.jit, static_argnums=(1,))
def moving_sum_past(x: jax.Array, w: int) -> jax.Array:
    """y[n] = sum of x[max(0, n-w+1) .. n] along axis 0 (window clipped at
    the start). Small windows (detector/attack scales) go through the
    tile-matmul path; larger ones use the van Herk block scans."""
    if w <= 8 * _LB:
        return _moving_sum_tiles(x, w)
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
    """y[n] = max(u[n], decay * y[n-1]) — exponential-release envelope in
    the (multiply, max) semiring (y[-1] = 0; u assumed >= 0).

    Blocked Kogge-Stone with SHORT blocks (L = 128): log2(L) level passes
    over the full array dominate the cost, so fewer levels win; the
    block-boundary carry c[b+1] = max(e[b], decay^L c[b]) is itself a
    parallel (max, x) Kogge-Stone prefix over the tiny [nb, ...] array
    (the old L = 65536 layout spent 16 full-array passes — measured 2x
    slower at [2^23, 3])."""
    decay = jnp.asarray(decay, u.dtype)
    n = u.shape[0]
    L = min(128, 1 << max(n - 1, 1).bit_length())
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

    # carry prefix over block ends: F[b] = running max of dL-decayed e
    e = Y[:, -1]  # zero-state end-of-block values
    P = 1 << max(nb - 1, 1).bit_length() if nb > 1 else 1
    F = jnp.pad(e, [(0, P - nb)] + [(0, 0)] * (e.ndim - 1),
                constant_values=0.0)
    dj = dL
    s = 1
    while s < P:
        F = jnp.maximum(F, dj * _shift_right_fill(F, s, 0, 0.0))
        dj = dj * dj
        s *= 2
    Cpre = jnp.concatenate(
        [jnp.zeros((1,) + e.shape[1:], u.dtype), F[:nb - 1]], axis=0)

    k = jnp.arange(1, L + 1, dtype=u.dtype)
    powers = jnp.exp(k * jnp.log(jnp.maximum(decay, 1e-30)))
    corr = powers.reshape((1, L) + (1,) * (u.ndim - 1)) * \
        Cpre.reshape((nb, 1) + u.shape[1:])
    y = jnp.maximum(Y, corr)
    return y.reshape((nb * L,) + u.shape[1:])[:n]
