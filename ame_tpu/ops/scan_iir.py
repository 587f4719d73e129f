"""Associative-scan IIR filtering — the core device kernel.

Replaces the reference's scipy ``lfilter``/``sosfilt`` C loops
(audio_mastering_engine.py:286, 296, 301-303 — SURVEY.md §2.3 N6) with a
TPU-native formulation: a linear recurrence is a composition of affine state
maps; prefix-composition is associative, so the whole filter history is a
parallel scan of O(log N) depth — pure VPU element-wise sweeps, no
sequential sample loop, no 30 s chunk state resets (quirk Q6 becomes an
*option*, not a limitation).

Two key structural choices, both driven by compile time and HBM traffic:

1. **Whole cascades fuse into one scan.** A k-section SOS cascade is a
   single linear state-space system with a 2k-dim state and a block-lower-
   triangular transition matrix 𝔸 (built from the per-section TDF-II
   forms at trace time). One scan of a [2k]-state costs the same *op count*
   as one biquad — so an order-8 bandpass compiles like a biquad instead of
   4x a biquad.

2. **Kogge-Stone with constant level matrices.** Because 𝔸 is constant in
   time, level l of the scan is
        S <- S + 𝔸^(2^l) · shift(S, 2^l)
   with 𝔸^(2^l) a [D, D] *scalar* matrix (einsum per level; ~4 XLA ops per
   level). The scan is blocked (L = 2^16 within-block, vectorized across
   all blocks; a tiny lax.scan carries block boundary states; an in-graph
   𝔸^k table applies the carry), so graph size is INDEPENDENT of N.

Per-section state convention matches ``scipy.signal.sosfilt``'s ``zi``
exactly; coefficients/zi are traced arguments, so one compile per input
shape serves every filter in the mastering graph.

Stability: audio filters have |poles| < 1, so scanned products decay and
f32 rounding errors are themselves filtered — accuracy vs the float64 scipy
oracle is ~1e-4..1e-5 relative (tests/test_scan_iir.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# This environment (and TPU generally) lowers f32 matmuls at reduced
# (bf16-class) precision by default. The scan's level matrices compound
# multiplicatively, so every contraction here must be exact f32.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _ein(spec, *ops):
    return jnp.einsum(spec, *ops, precision=_HI)


_MAX_BLOCK = 1 << 16


def _pow2ceil(n: int) -> int:
    return 1 << (max(n - 1, 0)).bit_length() if n > 1 else 1


def _shift_right(x, k, axis):
    """Shift by k along axis, filling zeros (dropped tail)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (k, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis] - k)
    return jnp.pad(x[tuple(sl)], pad)


def _cascade_state_space(sos: jax.Array, dt):
    """Compose k TDF-II sections into (𝔸 [D,D], 𝔹 [D], Crow [D], d) with
    D = 2k. Section i (coeffs b0,b1,b2,1,a1,a2):

        y_i   = b0*u_i + s1_i
        s1_i' = (b1 - a1*b0)*u_i - a1*s1_i + s2_i
        s2_i' = (b2 - a2*b0)*u_i - a2*s1_i

    with u_{i+1} = y_i, u_1 = x. The global input-to-u_i sensitivity is
    tracked as (scalar g_i = du_i/dx, row r_i = du_i/ds)."""
    k = sos.shape[0]
    D = 2 * k
    zero = jnp.zeros((), dt)
    one = jnp.ones((), dt)

    A_rows = [[zero] * D for _ in range(D)]
    B_col = [zero] * D
    g = one                      # du_i/dx
    r = [zero] * D               # du_i/ds
    for i in range(k):
        b0, b1, b2 = sos[i, 0], sos[i, 1], sos[i, 2]
        a1, a2 = sos[i, 4], sos[i, 5]
        i1, i2 = 2 * i, 2 * i + 1
        c1 = b1 - a1 * b0
        c2 = b2 - a2 * b0
        # s1_i' = c1*u_i - a1*s1_i + s2_i
        for j in range(D):
            A_rows[i1][j] = c1 * r[j]
        A_rows[i1][i1] = A_rows[i1][i1] - a1
        A_rows[i1][i2] = A_rows[i1][i2] + one
        B_col[i1] = c1 * g
        # s2_i' = c2*u_i - a2*s1_i
        for j in range(D):
            A_rows[i2][j] = c2 * r[j]
        A_rows[i2][i1] = A_rows[i2][i1] - a2
        B_col[i2] = c2 * g
        # u_{i+1} = y_i = b0*u_i + s1_i
        r = [b0 * r[j] for j in range(D)]
        r[i1] = r[i1] + one
        g = b0 * g
    A = jnp.stack([jnp.stack(row) for row in A_rows])
    B = jnp.stack(B_col)
    Crow = jnp.stack(r)   # dy/ds  (y = y_k)
    dpass = g             # dy/dx
    return A, B, Crow, dpass


@partial(jax.jit, static_argnums=(2, 3))
def _cascade_ks(x, sos, L, k):
    """Blocked Kogge-Stone cascade scan. x: [N, *tr]; sos: [k, 6] traced."""
    dt = x.dtype
    N = x.shape[0]
    tr = x.shape[1:]
    D = 2 * k
    NB = -(-N // L)
    xp = jnp.pad(x, [(0, NB * L - N)] + [(0, 0)] * (x.ndim - 1))
    xb = xp.reshape((NB, L) + tr)

    A, B, Crow, dpass = _cascade_state_space(sos, dt)

    # -- within-block inclusive scan of v[n] = B*x[n] -----------------------
    S = B.reshape((D, 1, 1) + (1,) * len(tr)) * xb[None]   # [D, NB, L, *tr]
    Al = A
    shift = 1
    while shift < L:
        Ss = _shift_right(S, shift, axis=2)
        S = S + _ein("jm,m...->j...", Al, Ss)
        Al = _mm(Al, Al)
        shift *= 2
    AL = Al  # 𝔸^L

    # -- carry across blocks: c[b] = state BEFORE block b -------------------
    e = S[:, :, -1]  # [D, NB, *tr]
    e = jnp.moveaxis(e, 1, 0)  # [NB, D, *tr]

    def step(c, eb):
        nxt = _ein("jm,m...->j...", AL, c) + eb
        return nxt, c

    c0 = jnp.zeros((D,) + tr, dt)
    _, C = jax.lax.scan(step, c0, e)  # C: [NB, D, *tr] state before block b

    # -- 𝔸^k table, k = 0..L-1 ---------------------------------------------
    eye = jnp.eye(D, dtype=dt)
    T = jnp.where((jnp.arange(L) == 0)[:, None, None], eye[None], A[None])
    shift = 1
    while shift < L:
        # T[k] <- T[k] @ T[k-shift], identity padding
        Ts = jnp.concatenate(
            [jnp.broadcast_to(eye[None], (shift, D, D)), T[:L - shift]],
            axis=0)
        T = _ein("lij,ljk->lik", T, Ts)
        shift *= 2

    # -- output: y[b,k] = d*x + Crow·(𝔸^k c[b] + shift1(S)[b,k]) -------------
    # Precontract Crow with the 𝔸^k table (w[k] = Crowᵀ 𝔸^k, [L, D]) and
    # with S (z = Crow·S, [NB, L, *tr]) so no [D, N]-sized intermediate is
    # ever materialized — the carry correction costs one [L,D]x[NB,D] matmul.
    w = _ein("j,ljm->lm", Crow, T)             # [L, D]
    z = _ein("j,jbl...->bl...", Crow, S)       # [NB, L, *tr]
    zs1 = _shift_right(z, 1, axis=1)
    corr_y = _ein("lm,bm...->bl...", w, C)     # [NB, L, *tr]
    y = dpass * xb + corr_y + zs1
    y = y.reshape((NB * L,) + tr)[:N]

    # -- final state (after sample N-1): 𝔸 @ s_before[N-1] + v[N-1] ---------
    bi = (N - 1) // L
    ki = (N - 1) % L
    sb_last = _ein("jm,m...->j...", T[ki], C[bi])
    if ki > 0:
        sb_last = sb_last + S[:, bi, ki - 1]
    v_last = B.reshape((D,) + (1,) * len(tr)) * xb[bi, ki]
    s_after_last = _ein("jm,m...->j...", A, sb_last) + v_last
    # [D, *tr] -> [k, *tr, 2] (scipy sosfilt zi layout)
    zf = jnp.moveaxis(s_after_last.reshape((k, 2) + tr), 1, -1)
    return y, zf


@partial(jax.jit, static_argnums=(3, 4))
def _cascade_ks_zi(x, sos, zi, L, k):
    """As _cascade_ks but honoring an initial state zi [k, *tr, 2].

    Implemented by injecting the zi contribution into the first block's
    carry: rerun of the carry scan with c0 = zi (cheap — the expensive
    within-block scan is shared logic, so just inline the same body)."""
    dt = x.dtype
    N = x.shape[0]
    tr = x.shape[1:]
    D = 2 * k
    NB = -(-N // L)
    xp = jnp.pad(x, [(0, NB * L - N)] + [(0, 0)] * (x.ndim - 1))
    xb = xp.reshape((NB, L) + tr)

    A, B, Crow, dpass = _cascade_state_space(sos, dt)
    S = B.reshape((D, 1, 1) + (1,) * len(tr)) * xb[None]
    Al = A
    shift = 1
    while shift < L:
        Ss = _shift_right(S, shift, axis=2)
        S = S + _ein("jm,m...->j...", Al, Ss)
        Al = _mm(Al, Al)
        shift *= 2
    AL = Al

    e = jnp.moveaxis(S[:, :, -1], 1, 0)

    def step(c, eb):
        nxt = _ein("jm,m...->j...", AL, c) + eb
        return nxt, c

    c0 = jnp.moveaxis(zi.astype(dt), -1, 1).reshape((D,) + tr)
    _, C = jax.lax.scan(step, c0, e)

    eye = jnp.eye(D, dtype=dt)
    T = jnp.where((jnp.arange(L) == 0)[:, None, None], eye[None], A[None])
    shift = 1
    while shift < L:
        Ts = jnp.concatenate(
            [jnp.broadcast_to(eye[None], (shift, D, D)), T[:L - shift]],
            axis=0)
        T = _ein("lij,ljk->lik", T, Ts)
        shift *= 2

    w = _ein("j,ljm->lm", Crow, T)
    z = _ein("j,jbl...->bl...", Crow, S)
    zs1 = _shift_right(z, 1, axis=1)
    corr_y = _ein("lm,bm...->bl...", w, C)
    y = dpass * xb + corr_y + zs1
    y = y.reshape((NB * L,) + tr)[:N]

    bi = (N - 1) // L
    ki = (N - 1) % L
    sb_last = _ein("jm,m...->j...", T[ki], C[bi])
    if ki > 0:
        sb_last = sb_last + S[:, bi, ki - 1]
    v_last = B.reshape((D,) + (1,) * len(tr)) * xb[bi, ki]
    s_after_last = _ein("jm,m...->j...", A, sb_last) + v_last
    zf = jnp.moveaxis(s_after_last.reshape((k, 2) + tr), 1, -1)
    return y, zf


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def sosfilt_scan(sos, x: jax.Array, zi: jax.Array | None = None,
                 axis: int = 0):
    """Cascade of biquads (scipy ``sosfilt`` semantics, zero default state),
    fused into ONE scan regardless of section count.

    Args:
      sos: [n_sections, 6] (numpy or jax array; a0 normalized to 1).
      x: input; time along ``axis``.
      zi: [n_sections, ..., 2] per-section initial states, or None.

    Returns:
      (y, zf) with zf: [n_sections, ..., 2].
    """
    sos = jnp.asarray(sos, x.dtype)
    k = sos.shape[0]
    if axis != 0:
        x = jnp.moveaxis(x, axis, 0)
    L = min(_MAX_BLOCK, _pow2ceil(x.shape[0]))
    if zi is None:
        y, zf = _cascade_ks(x, sos, L, int(k))
    else:
        y, zf = _cascade_ks_zi(x, sos, jnp.asarray(zi, x.dtype), L, int(k))
    if axis != 0:
        y = jnp.moveaxis(y, 0, axis)
    return y, zf


def biquad_scan(x: jax.Array, coeffs: jax.Array, zi: jax.Array | None = None,
                axis: int = 0):
    """Filter ``x`` along ``axis`` with one biquad.

    coeffs: [6] (b0, b1, b2, a0, a1, a2), a0 == 1. zi: scipy lfilter
    convention, shape = batch shape + (2,). Returns (y, zf)."""
    sos = jnp.asarray(coeffs, x.dtype)[None, :]
    zi_s = None if zi is None else jnp.asarray(zi, x.dtype)[None]
    y, zf = sosfilt_scan(sos, x, zi_s, axis=axis)
    return y, zf[0]


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
