"""Associative-scan IIR filtering — the core device kernel.

Replaces the reference's scipy ``lfilter``/``sosfilt`` C loops
(audio_mastering_engine.py:286, 296, 301-303 — SURVEY.md §2.3 N6) with a
TPU-native formulation: a linear recurrence is a composition of affine state
maps; prefix-composition is associative, so the whole filter history is a
parallel scan of O(log N) depth — pure VPU element-wise sweeps, no
sequential sample loop, no 30 s chunk state resets (quirk Q6 becomes an
*option*, not a limitation).

Formulation (transposed direct form II, biquad):

    y[n]  = b0*x[n] + s1[n-1]
    s1[n] = b1*x[n] - a1*y[n] + s2[n-1]
    s2[n] = b2*x[n] - a2*y[n]

Substituting y gives the affine state recurrence  s[n] = A s[n-1] + B x[n]:

    A = [[-a1, 1],      B = [b1 - a1*b0,
         [-a2, 0]]           b2 - a2*b0]

Because A is CONSTANT along time, the scan specializes to Kogge-Stone with a
*scalar* 2x2 matrix A^(2^l) per level:

    S <- S + A^(2^l) · shift(S, 2^l)

so only the 2-vector state S is carried (2 arrays, not the 6 a generic
affine scan needs), and each level is 4 multiplies + 4 adds + 2 shifts.
The scan is blocked: within-block Kogge-Stone over L = 2^16 samples
(vectorized over all blocks at once), a tiny ``lax.scan`` over the ~N/L
block carries, then an A^k-table correction — graph size is INDEPENDENT of
N (compile time stays flat from 1 s clips to hour-long programs).

The state convention matches ``scipy.signal.lfilter``'s ``zi`` exactly, so
chunk handoff and scipy differential tests are direct.

Stability: audio filters have |poles| < 1, so scanned products decay and f32
rounding errors are themselves filtered — accuracy vs the float64 scipy
oracle is ~1e-4..1e-5 relative (tests/test_scan_iir.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


_MAX_BLOCK = 1 << 16


def _pow2ceil(n: int) -> int:
    return 1 << (max(n - 1, 0)).bit_length() if n > 1 else 1


def _mat_sq(m):
    """Square a 2x2 matrix given as a 4-tuple of scalars."""
    m11, m12, m21, m22 = m
    return (m11 * m11 + m12 * m21, m11 * m12 + m12 * m22,
            m21 * m11 + m22 * m21, m21 * m12 + m22 * m22)


def _shift_right(x, k, axis):
    """Shift by k along axis, filling zeros (dropped tail)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (k, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis] - k)
    return jnp.pad(x[tuple(sl)], pad)


@partial(jax.jit, static_argnums=(3,))
def _biquad_ks(x, coeffs, zi, L):
    """Blocked Kogge-Stone biquad. x: [N, *tr]; L: power-of-two block."""
    dt = x.dtype
    N = x.shape[0]
    tr = x.shape[1:]
    NB = -(-N // L)
    xp = jnp.pad(x, [(0, NB * L - N)] + [(0, 0)] * (x.ndim - 1))
    xb = xp.reshape((NB, L) + tr)

    b0, b1, b2 = coeffs[0], coeffs[1], coeffs[2]
    a1, a2 = coeffs[4], coeffs[5]
    one = jnp.asarray(1.0, dt)
    zero = jnp.asarray(0.0, dt)

    # -- within-block inclusive scan: S[b,k] = sum_{j<=k} A^(k-j) v[b,j] ----
    S1 = (b1 - a1 * b0) * xb
    S2 = (b2 - a2 * b0) * xb
    M = (-a1, one, -a2, zero)  # A, as traced scalars
    shift = 1
    while shift < L:
        s1s = _shift_right(S1, shift, axis=1)
        s2s = _shift_right(S2, shift, axis=1)
        m11, m12, m21, m22 = M
        S1 = S1 + (m11 * s1s + m12 * s2s)
        S2 = S2 + (m21 * s1s + m22 * s2s)
        M = _mat_sq(M)  # A^(2·2^l)
        shift *= 2
    AL = M  # A^L

    # -- carry across blocks: c[b] = state BEFORE block b ------------------
    if zi is None:
        c0_1 = jnp.zeros(tr, dt)
        c0_2 = jnp.zeros(tr, dt)
    else:
        c0_1 = jnp.broadcast_to(zi[..., 0], tr).astype(dt)
        c0_2 = jnp.broadcast_to(zi[..., 1], tr).astype(dt)
    e1 = S1[:, -1]
    e2 = S2[:, -1]
    al11, al12, al21, al22 = AL

    def step(c, e):
        c1, c2 = c
        eb1, eb2 = e
        n1 = al11 * c1 + al12 * c2 + eb1
        n2 = al21 * c1 + al22 * c2 + eb2
        return (n1, n2), (c1, c2)

    (cf1, cf2), (C1, C2) = jax.lax.scan(step, (c0_1, c0_2), (e1, e2))

    # -- A^k table, k = 0..L-1 (cumulative matmul Kogge-Stone) -------------
    karange = jnp.arange(L)
    is0 = (karange == 0)
    t11 = jnp.where(is0, one, -a1).astype(dt)
    t12 = jnp.where(is0, zero, one).astype(dt)
    t21 = jnp.where(is0, zero, -a2).astype(dt)
    t22 = jnp.where(is0, one, zero).astype(dt)
    shift = 1
    while shift < L:
        # T[k] <- T[k] @ T[k-shift] (identity padding)
        p11 = _shift_right(t11 - one, shift, 0) + one
        p12 = _shift_right(t12, shift, 0)
        p21 = _shift_right(t21, shift, 0)
        p22 = _shift_right(t22 - one, shift, 0) + one
        n11 = t11 * p11 + t12 * p21
        n12 = t11 * p12 + t12 * p22
        n21 = t21 * p11 + t22 * p21
        n22 = t21 * p12 + t22 * p22
        t11, t12, t21, t22 = n11, n12, n21, n22
        shift *= 2

    # -- corrected states ---------------------------------------------------
    bshape = (NB, 1) + (1,) * len(tr)
    kshape = (1, L) + (1,) * len(tr)
    C1e = C1.reshape((NB, 1) + tr)
    C2e = C2.reshape((NB, 1) + tr)
    # state BEFORE sample (b,k) = A^k c[b] + S[b,k-1] (S part shifted by one)
    T11 = t11.reshape(kshape)
    T12 = t12.reshape(kshape)
    S1s = _shift_right(S1, 1, axis=1)
    s1_before = T11 * C1e + T12 * C2e + S1s
    y = (b0 * xb + s1_before).reshape((NB * L,) + tr)[:N]

    # -- final state (after sample N-1) -------------------------------------
    bi = (N - 1) // L
    ki = (N - 1) % L
    # A^(ki+1) = A @ A^ki
    u11 = t11[ki]
    u12 = t12[ki]
    u21 = t21[ki]
    u22 = t22[ki]
    w11 = -a1 * u11 + u21
    w12 = -a1 * u12 + u22
    w21 = -a2 * u11
    w22 = -a2 * u12
    cb1 = C1[bi]
    cb2 = C2[bi]
    zf1 = w11 * cb1 + w12 * cb2 + S1[bi, ki]
    zf2 = w21 * cb1 + w22 * cb2 + S2[bi, ki]
    zf = jnp.stack([zf1, zf2], axis=-1)
    return y, zf


def biquad_scan(x: jax.Array, coeffs: jax.Array, zi: jax.Array | None = None,
                axis: int = 0):
    """Filter ``x`` along ``axis`` with one biquad.

    Args:
      x: input, any shape; time runs along ``axis``.
      coeffs: [6] array (b0, b1, b2, a0, a1, a2); a0 must be 1.
      zi: initial state, shape = x.shape with ``axis`` removed then (2,)
          appended; scipy ``lfilter`` zi convention. None = zero state.

    Returns:
      (y, zf): filtered output (same shape as x) and final state (zi-shaped).

    Coefficients and zi are traced arguments: ONE compile per input shape
    serves every biquad in the mastering graph.
    """
    coeffs = jnp.asarray(coeffs, x.dtype)
    if zi is not None:
        zi = jnp.asarray(zi, x.dtype)
    if axis != 0:
        x = jnp.moveaxis(x, axis, 0)
    L = min(_MAX_BLOCK, _pow2ceil(x.shape[0]))
    y, zf = _biquad_ks(x, coeffs, zi, L)
    if axis != 0:
        y = jnp.moveaxis(y, 0, axis)
    return y, zf


def sosfilt_scan(sos, x: jax.Array, zi: jax.Array | None = None,
                 axis: int = 0):
    """Cascade of biquads (scipy ``sosfilt`` semantics, zero default state).

    Args:
      sos: [n_sections, 6] (numpy or jax array; a0 normalized to 1).
      x: input; time along ``axis``.
      zi: [n_sections, ...] per-section initial states, or None.

    Returns:
      (y, zf) with zf: [n_sections, ..., 2].
    """
    sos = jnp.asarray(sos, x.dtype)
    n_sections = sos.shape[0]
    y = x
    zfs = []
    for s in range(n_sections):
        y, zf = biquad_scan(y, sos[s], None if zi is None else zi[s], axis=axis)
        zfs.append(zf)
    return y, jnp.stack(zfs, axis=0)


def lfilter_scan(b, a, x: jax.Array, axis: int = 0) -> jax.Array:
    """scipy ``lfilter(b, a, x)`` for order <= 2 transfer functions (all the
    reference's ba-form calls are order 2: audio_mastering_engine.py:285)."""
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    b = b / a[0]
    a = a / a[0]
    if len(b) > 3 or len(a) > 3:
        raise NotImplementedError("lfilter_scan supports order <= 2; use SOS")
    b = np.pad(b, (0, 3 - len(b)))
    a = np.pad(a, (0, 3 - len(a)))
    coeffs = jnp.asarray(np.concatenate([b, a]), x.dtype)
    y, _ = biquad_scan(x, coeffs, axis=axis)
    return y


def sosfilt_chunked(sos, x: jax.Array, chunk_len: int) -> jax.Array:
    """sosfilt with the filter state RESET every ``chunk_len`` samples along
    axis 0 — compat emulation of the reference's 30 s segment pipeline, where
    every chunk gets fresh lfilter/sosfilt state (quirk Q6,
    audio_mastering_engine.py:178, 185-204).

    Runs all chunks in parallel ([chunk_len, n_chunks, ...] columns) — the
    emulation is *more* parallel than the serial loop it models.
    """
    n = x.shape[0]
    n_chunks = -(-n // chunk_len)
    pad = n_chunks * chunk_len - n
    xp = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    xb = xp.reshape((n_chunks, chunk_len) + x.shape[1:])
    xb = jnp.moveaxis(xb, 0, 1)  # [chunk_len, n_chunks, ...]
    yb, _ = sosfilt_scan(sos, xb, axis=0)
    yb = jnp.moveaxis(yb, 1, 0)
    return yb.reshape((n_chunks * chunk_len,) + x.shape[1:])[:n]
