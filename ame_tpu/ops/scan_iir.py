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
   level). The scan is blocked (L = 128 within-block by default — each
   level is a pass over the big state arrays, so small L wins; swept on
   v5e, see _MAX_BLOCK). The block-boundary carry is ITSELF a parallel
   Kogge-Stone prefix over N/L elements (_carry_prefix), and an in-graph
   𝔸^k table applies it — graph size is INDEPENDENT of N.

Execution paths, chosen in ``sosfilt_scan`` (AME_TPU_IIR selects):
  * DEFAULT: the MXU tile-convolution engine (ops/tile_conv.py) for 2-D
    f32 inputs, host-designed or traced — measured 15-70x faster than
    the level-pass scans below at any cascade order;
  * XLA Kogge-Stone scan for everything else (3-D chunked columns,
    non-f32), with traced coefficients building in-graph matrices
    (_cascade_ks_traced) and host-designed numpy coefficients entering
    as float64-precomputed values (_cascade_ks_pack) — stable even for
    the reference's near-defective Nyquist-clamped filters;
  * the one-pass Pallas kernel (ops/pallas_scan.py) for host-known k>=3
    when selected via AME_TPU_IIR=pallas / AME_TPU_PALLAS=1.

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


# Within-block scan length. Each level is one pass over the [D, N, C]
# state arrays, so small L = few big passes; the block carry is itself a
# parallel prefix (_carry_prefix) over NB = N/L elements, so it stays cheap
# until NB·D approaches N. Swept on v5e (8.4M-sample k=2 cascade):
# L=65536: 57 ms, 4096: 28 ms, 1024: 23 ms, 256: 18 ms, 128: 16 ms,
# 64: 20 ms. Default 128; override for experiments.
import os as _os

_MAX_BLOCK = int(_os.environ.get("AME_TPU_SCAN_BLOCK", 128))
if _MAX_BLOCK & (_MAX_BLOCK - 1):
    # both scan paths assume power-of-two block lengths (level matrices are
    # A^(2^l)); round a non-power-of-two override up rather than mis-filter
    _MAX_BLOCK = 1 << _MAX_BLOCK.bit_length()

# IIR engine selection. Default "tileconv": the MXU tile-convolution
# engine (ops/tile_conv) — measured 15-70x over the level-pass scans on
# v5e at any cascade order (benchmarks/bench_scan_paths.py). "pallas"
# restores the one-pass Pallas kernel routing (k >= 3), "xla" forces the
# blocked Kogge-Stone scan everywhere. Non-2-D/non-f32 inputs always use
# the XLA scan.
_IIR_ENGINE = _os.environ.get("AME_TPU_IIR", "tileconv")

# Legacy knob for the Pallas kernel (applies when tile-conv declines an
# input shape): AME_TPU_PALLAS=0/1 forces it off/on; default on only on
# TPU.
_PALLAS_ENV = _os.environ.get("AME_TPU_PALLAS")


def _pallas_enabled() -> bool:
    if _IIR_ENGINE == "pallas":
        return True
    if _PALLAS_ENV is not None:
        return bool(int(_PALLAS_ENV))
    return jax.default_backend() == "tpu"


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
    D = 2k. Section i (coeffs b0,b1,b2,1,a1,a2) in TDF-II form:

        y_i   = b0*u_i + s1_i
        s1_i' = (b1 - a1*b0)*u_i - a1*s1_i + s2_i
        s2_i' = (b2 - a2*b0)*u_i - a2*s1_i

    with u_{i+1} = y_i, u_1 = x. The global input-to-u_i sensitivity is
    tracked as (scalar g_i = du_i/dx, row r_i = du_i/ds).

    Numerics: each section's 2x2 block is similarity-transformed to the
    COUPLED (rotation) form A_c = [[α, -β], [β, α]] with α = -a1/2,
    β = sqrt(a2 - α²) when the poles are complex. Companion-form powers of
    near-unit-circle poles grow transiently like k^(2s-1)·|p|^k and
    OVERFLOW f32 during the scan's matrix squarings (observed with the
    reference's Nyquist-clamped bandpass, quirk Q14); rotation blocks are
    normal matrices whose powers stay at |p|^k. The transform
    V = [[1, 0], [-α, -β]] keeps the first state component equal to the
    TDF-II s1 (V's first row is e1), so the output equation and the scipy
    ``zi`` convention are unchanged up to the per-section second component:
    s̃2 = -(α·s1 + s2)/β. Sections with real poles (β² <= 0) keep the
    companion form (their powers grow at most like k·|p|^k).

    The where()-based form selection keeps everything traced: one compiled
    program serves both pole types.
    """
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

        alpha = -a1 * 0.5
        beta_sq = a2 - alpha * alpha
        is_complex = beta_sq > 1e-12
        beta = jnp.sqrt(jnp.where(is_complex, beta_sq, 1.0))

        # companion block rows: [[-a1, 1], [-a2, 0]], B = [c1, c2]
        # coupled block rows:   [[α, -β], [β, α]],
        #   B̃ = [c1, -(α c1 + c2)/β]   (s̃1 == TDF-II s1)
        a_11 = jnp.where(is_complex, alpha, -a1)
        a_12 = jnp.where(is_complex, -beta, one)
        a_21 = jnp.where(is_complex, beta, -a2)
        a_22 = jnp.where(is_complex, alpha, zero)
        b_1 = c1
        b_2 = jnp.where(is_complex, -(alpha * c1 + c2) / beta, c2)

        # s̃1' = a_11*s̃1 + a_12*s̃2 + b_1*u_i
        for j in range(D):
            A_rows[i1][j] = b_1 * r[j]
        A_rows[i1][i1] = A_rows[i1][i1] + a_11
        A_rows[i1][i2] = A_rows[i1][i2] + a_12
        B_col[i1] = b_1 * g
        # s̃2' = a_21*s̃1 + a_22*s̃2 + b_2*u_i
        for j in range(D):
            A_rows[i2][j] = b_2 * r[j]
        A_rows[i2][i1] = A_rows[i2][i1] + a_21
        A_rows[i2][i2] = A_rows[i2][i2] + a_22
        B_col[i2] = b_2 * g
        # u_{i+1} = y_i = b0*u_i + s̃1_i
        r = [b0 * r[j] for j in range(D)]
        r[i1] = r[i1] + one
        g = b0 * g
    A = jnp.stack([jnp.stack(row) for row in A_rows])
    B = jnp.stack(B_col)
    Crow = jnp.stack(r)   # dy/ds  (y = y_k)
    dpass = g             # dy/dx
    return A, B, Crow, dpass


def _zi_transforms(sos: jax.Array, dt):
    """Per-section (to_internal, to_scipy) 2x2 maps between scipy TDF-II zi
    and the internal (possibly coupled) state: s̃ = V⁻¹ s, s = V s̃ with
    V = [[1, 0], [-α, -β]] for complex sections, identity for real."""
    k = sos.shape[0]
    fwd = []
    inv = []
    for i in range(k):
        a1, a2 = sos[i, 4], sos[i, 5]
        alpha = -a1 * 0.5
        beta_sq = a2 - alpha * alpha
        is_complex = beta_sq > 1e-12
        beta = jnp.sqrt(jnp.where(is_complex, beta_sq, 1.0))
        one = jnp.ones((), dt)
        zero = jnp.zeros((), dt)
        # V⁻¹ = [[1, 0], [-α/β, -1/β]]
        vinv = jnp.stack([
            jnp.stack([one, zero]),
            jnp.stack([jnp.where(is_complex, -alpha / beta, zero),
                       jnp.where(is_complex, -1.0 / beta, one)]),
        ])
        v = jnp.stack([
            jnp.stack([one, zero]),
            jnp.stack([jnp.where(is_complex, -alpha, zero),
                       jnp.where(is_complex, -beta, one)]),
        ])
        inv.append(vinv)
        fwd.append(v)
    return jnp.stack(inv), jnp.stack(fwd)  # [k, 2, 2] each


def _carry_prefix(AL, e, c0):
    """Parallel prefix of the block-carry recurrence c[b+1] = AL c[b] + e[b].

    e: [NB, D, *tr]; c0: [D, *tr]. Returns C [NB, D, *tr] with C[b] = state
    BEFORE block b. Kogge-Stone with constant AL — O(log NB) levels on
    NB-sized (tiny) arrays, replacing a sequential lax.scan that dominated
    runtime for small block lengths. c0 enters by folding AL·c0 into e[0]
    (then C[b] = shift1(F)[b] carries AL^b·c0 exactly)."""
    NB = e.shape[0]
    e = e.at[0].add(_ein("jm,m...->j...", AL, c0))
    P = 1 << max(NB - 1, 1).bit_length() if NB > 1 else 1
    F = jnp.pad(e, [(0, P - NB)] + [(0, 0)] * (e.ndim - 1))
    M = AL
    s = 1
    while s < P:
        Fs = _shift_right(F, s, axis=0)
        F = F + _ein("jm,bm...->bj...", M, Fs)
        M = _mm(M, M)
        s *= 2
    F = F[:NB]
    return jnp.concatenate([c0[None], F[:-1]], axis=0)


@partial(jax.jit, static_argnums=(3, 4))
def _cascade_ks_traced(x, sos, zi, L, k):
    """Blocked Kogge-Stone cascade scan with traced (in-graph) matrices.

    x: [N, *tr]; sos: [k, 6] traced; zi: scipy-layout [k, *tr, 2] or None
    (the None/array distinction is a static pytree structure — two traces).
    """
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
    e = jnp.moveaxis(S[:, :, -1], 1, 0)  # [NB, D, *tr]
    if zi is None:
        c0 = jnp.zeros((D,) + tr, dt)
    else:
        # scipy TDF-II zi -> internal (coupled) state
        Vi, _ = _zi_transforms(sos, dt)
        zi_int = _ein("kab,kb...->ka...", Vi,
                      jnp.moveaxis(zi.astype(dt), -1, 1))
        c0 = zi_int.reshape((D,) + tr)
    C = _carry_prefix(AL, e, c0)  # [NB, D, *tr]

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

    # -- output: y[b,k] = d*x + Crow·(𝔸^k c[b] + shift1(S)[b,k]) ------------
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
    # internal (coupled) state -> scipy TDF-II zi layout [k, *tr, 2]
    _, Vf = _zi_transforms(sos, dt)
    st = _ein("kab,kb...->ka...", Vf, s_after_last.reshape((k, 2) + tr))
    zf = jnp.moveaxis(st, 1, -1)
    return y, zf


# ---------------------------------------------------------------------------
# Host-precomputed matrix path (float64-accurate level matrices)
# ---------------------------------------------------------------------------
# Repeated f32 squaring of the cascade matrix is numerically unstable for
# near-defective filters (the reference's Nyquist-clamped bandpass, Q14,
# has pole pairs with |p| ~ 1-3e-6 and Im ~ 1e-6: f32 squaring error blows
# up around A^(2^12) and overflows by A^(2^16)). Compat-mode filters are
# DESIGNED ON THE HOST (numpy coefficients), so all level matrices can be
# computed once in float64 and enter the graph as plain f32 *values* — no
# in-graph squaring chains, bounded rounding, and fewer ops. Traced
# (gain-dependent, quality-mode) filters keep the in-graph builder: their
# bounded gains put poles well inside the unit circle where f32 squaring
# is stable.

_CARRY_LEVELS = 40  # covers N up to L * 2^40 blocks


def _state_space_np(sos: np.ndarray):
    """numpy float64 mirror of _cascade_state_space (+ V transforms)."""
    sos = np.asarray(sos, np.float64)
    k = sos.shape[0]
    D = 2 * k
    A = np.zeros((D, D))
    B = np.zeros(D)
    Vf = np.zeros((k, 2, 2))
    Vi = np.zeros((k, 2, 2))
    g = 1.0
    r = np.zeros(D)
    for i in range(k):
        b0, b1, b2, _, a1, a2 = sos[i]
        i1, i2 = 2 * i, 2 * i + 1
        c1 = b1 - a1 * b0
        c2 = b2 - a2 * b0
        alpha = -a1 * 0.5
        beta_sq = a2 - alpha * alpha
        if beta_sq > 1e-12:
            beta = np.sqrt(beta_sq)
            a11, a12, a21, a22 = alpha, -beta, beta, alpha
            bb1, bb2 = c1, -(alpha * c1 + c2) / beta
            Vf[i] = [[1.0, 0.0], [-alpha, -beta]]
            Vi[i] = [[1.0, 0.0], [-alpha / beta, -1.0 / beta]]
        else:
            a11, a12, a21, a22 = -a1, 1.0, -a2, 0.0
            bb1, bb2 = c1, c2
            Vf[i] = np.eye(2)
            Vi[i] = np.eye(2)
        A[i1] = bb1 * r
        A[i1, i1] += a11
        A[i1, i2] += a12
        B[i1] = bb1 * g
        A[i2] = bb2 * r
        A[i2, i1] += a21
        A[i2, i2] += a22
        B[i2] = bb2 * g
        r = b0 * r
        r[i1] += 1.0
        g = b0 * g
    return A, B, r, g, Vf, Vi


import functools


@functools.lru_cache(maxsize=256)
def _host_pack_cached(sos_bytes: bytes, k: int, L: int, dt_name: str):
    sos_np = np.frombuffer(sos_bytes, np.float64).reshape(k, 6)
    return _host_pack(sos_np, L, np.dtype(dt_name))


def _host_pack(sos_np: np.ndarray, L: int, dt) -> tuple:
    """All matrices the scan needs, computed in f64, cast to the compute
    dtype. Returned as a flat tuple pytree (jit-traceable arguments).
    Cached via _host_pack_cached so repeated calls reuse the same device
    arrays (no per-call host->device transfers)."""
    A, B, Crow, dpass, Vf, Vi = _state_space_np(sos_np)
    with np.errstate(over="ignore", invalid="ignore"):
        n_lev = max(int(np.log2(L)), 0)
        levels = []
        M = A.copy()
        for _ in range(n_lev):
            levels.append(M)
            M = M @ M
        AL = M  # A^L
        carry = []
        M = AL.copy()
        for _ in range(_CARRY_LEVELS):
            carry.append(M)
            M = M @ M
            # past the decay, powers underflow; keep them at exact zero
            M[~np.isfinite(M)] = 0.0
        # A^k table, k = 0..L-1
        T = np.zeros((L,) + A.shape)
        T[0] = np.eye(A.shape[0])
        for k_ in range(1, L):
            T[k_] = T[k_ - 1] @ A
        w = np.einsum("j,ljm->lm", Crow, T)
    # NUMPY outputs only: jnp conversion must happen at the call site so a
    # traced value is never captured in the lru cache (inside an outer jit
    # these become per-trace constants; the compat filters are fixed per
    # static sample_rate, so no retraces result).
    np_dt = np.dtype(dt.name if hasattr(dt, "name") else dt)
    cast = lambda a: np.nan_to_num(np.asarray(a, np_dt), nan=0.0,
                                   posinf=0.0, neginf=0.0)
    return (cast(np.stack(levels)) if levels
            else np.zeros((0,) + A.shape, np_dt),
            cast(np.stack(carry)),
            cast(T), cast(w), cast(A), cast(B), cast(Crow),
            np_dt.type(dpass), cast(Vf), cast(Vi))


def _carry_prefix_pack(carry_levels, e, c0):
    NB = e.shape[0]
    e = e.at[0].add(_ein("jm,m...->j...", carry_levels[0], c0))
    P = 1 << max(NB - 1, 1).bit_length() if NB > 1 else 1
    F = jnp.pad(e, [(0, P - NB)] + [(0, 0)] * (e.ndim - 1))
    s = 1
    lvl = 0
    while s < P:
        Fs = _shift_right(F, s, axis=0)
        F = F + _ein("jm,bm...->bj...", carry_levels[lvl], Fs)
        s *= 2
        lvl += 1
    F = F[:NB]
    return jnp.concatenate([c0[None], F[:-1]], axis=0)


@partial(jax.jit, static_argnums=(3, 4))
def _cascade_ks_pack(x, pack, zi, L, k):
    """Scan body with host-precomputed matrices. zi may be None."""
    (levels, carry_levels, T, w, A, B, Crow, dpass, Vf, Vi) = pack
    dt = x.dtype
    N = x.shape[0]
    tr = x.shape[1:]
    D = 2 * k
    NB = -(-N // L)
    xp = jnp.pad(x, [(0, NB * L - N)] + [(0, 0)] * (x.ndim - 1))
    xb = xp.reshape((NB, L) + tr)

    S = B.reshape((D, 1, 1) + (1,) * len(tr)) * xb[None]
    shift = 1
    lvl = 0
    while shift < L:
        Ss = _shift_right(S, shift, axis=2)
        S = S + _ein("jm,m...->j...", levels[lvl], Ss)
        shift *= 2
        lvl += 1

    e = jnp.moveaxis(S[:, :, -1], 1, 0)
    if zi is None:
        c0 = jnp.zeros((D,) + tr, dt)
    else:
        zi_int = _ein("kab,kb...->ka...", Vi,
                      jnp.moveaxis(zi.astype(dt), -1, 1))
        c0 = zi_int.reshape((D,) + tr)
    C = _carry_prefix_pack(carry_levels, e, c0)

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
    st = _ein("kab,kb...->ka...", Vf, s_after_last.reshape((k, 2) + tr))
    zf = jnp.moveaxis(st, 1, -1)
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
    if axis != 0:
        x = jnp.moveaxis(x, axis, 0)
    L = min(_MAX_BLOCK, _pow2ceil(x.shape[0]))
    k = int(np.shape(sos)[0])
    host_known = isinstance(sos, np.ndarray) or (
        isinstance(sos, jax.Array) and not isinstance(
            sos, jax.core.Tracer))
    if _route_tileconv(x):
        # MXU tile-convolution engine (ops/tile_conv): measured 15-70x
        # over the level-pass scans at any cascade order, ~1e-7 accurate
        from ame_tpu.ops.tile_conv import sosfilt_tileconv
        sos_in = (np.ascontiguousarray(np.asarray(sos, np.float64))
                  if host_known else sos)
        y, zf = sosfilt_tileconv(sos_in, x, zi)
        if axis != 0:
            y = jnp.moveaxis(y, 0, axis)
        return y, zf
    if _route_pallas(sos, x, k):
        # one-pass Pallas kernel (host f64 packs or in-graph traced
        # matrices): measured 1.4-1.5x over XLA for k>=3 cascades (k<=2 is
        # faster on the XLA path — VMEM level passes dominate at small
        # state dims) and ~1e-7 accurate
        from ame_tpu.ops.pallas_scan import sosfilt_pallas
        sos_in = np.asarray(sos, np.float64) if host_known else sos
        y, zf = sosfilt_pallas(sos_in, x, zi)
        if axis != 0:
            y = jnp.moveaxis(y, 0, axis)
        return y, zf
    if host_known:
        # float64-accurate level matrices, f32 values into the graph
        sos_np = np.ascontiguousarray(np.asarray(sos, np.float64))
        pack = _host_pack_cached(sos_np.tobytes(), k, L, x.dtype.name)
        zi_j = None if zi is None else jnp.asarray(zi, x.dtype)
        y, zf = _cascade_ks_pack(x, pack, zi_j, L, k)
    else:
        zi_j = None if zi is None else jnp.asarray(zi, x.dtype)
        y, zf = _cascade_ks_traced(x, jnp.asarray(sos, x.dtype), zi_j, L, k)
    if axis != 0:
        y = jnp.moveaxis(y, 0, axis)
    return y, zf


def _route_tileconv(x) -> bool:
    """Route to the MXU tile-conv engine (ops/tile_conv) — the default for
    2-D f32 inputs on every backend. AME_TPU_IIR=pallas|xla opts into the
    older engines (kept for differential testing and as fallbacks)."""
    return (_IIR_ENGINE == "tileconv" and x.ndim == 2
            and x.dtype == jnp.float32)


def _route_pallas(sos, x, k: int) -> bool:
    """Route to the one-pass kernel: k >= 3 (k <= 2 measured faster on the
    XLA path), 2-D f32 input at least one kernel block long, and not under
    vmap (pallas_call has no batching rule)."""
    if _IIR_ENGINE == "xla":
        return False
    if not (_pallas_enabled() and k >= 3 and x.ndim == 2
            and x.dtype == jnp.float32):
        return False
    from ame_tpu.ops.pallas_scan import _TB
    if x.shape[0] < _TB:
        return False
    from jax._src.interpreters.batching import BatchTracer
    return not (isinstance(x, BatchTracer) or isinstance(sos, BatchTracer))


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


def zero_input_response(sos_np: np.ndarray, zi: jax.Array, n: int):
    """y[0..n-1] for ZERO input from initial state ``zi`` (scipy layout
    [k, *tr, 2]): y[m] = Crow · A^m · s0. This is the superposition term
    that seeds a zero-state scan result with a nonzero start state —
    parallel/sequence.py adds it to each shard's local zero-state output
    instead of re-scanning the shard (round-1 weak item: 2x work).

    Host-designed coefficients only (uses the float64 matrix pack).
    O(n·D) work — about one of the ~7 level passes of a full scan.
    """
    k = int(np.shape(sos_np)[0])
    D = 2 * k
    L = min(_MAX_BLOCK, _pow2ceil(n))
    sos64 = np.ascontiguousarray(np.asarray(sos_np, np.float64))
    pack = _host_pack_cached(sos64.tobytes(), k, L, zi.dtype.name)
    (levels, carry_levels, T, w, A, B, Crow, dpass, Vf, Vi) = pack
    dt = zi.dtype
    tr = zi.shape[1:-1]

    # scipy zi -> internal (coupled) state vector [D, *tr]
    c = _ein("kab,kb...->ka...", jnp.asarray(Vi, dt),
             jnp.moveaxis(zi, -1, 1)).reshape((D,) + tr)

    NB = -(-n // L)
    # V[b] = (A^L)^b c via binary decomposition of b over the precomputed
    # (A^L)^(2^j) carry levels — log2(NB) masked matvecs on tiny arrays
    V = jnp.broadcast_to(c[None], (NB,) + c.shape)
    bits = np.arange(NB)
    for j in range(max(int(NB - 1).bit_length(), 0)):
        Mj = jnp.asarray(carry_levels[j], dt)
        sel = jnp.asarray((bits >> j) & 1, bool).reshape(
            (NB,) + (1,) * (c.ndim))
        V = jnp.where(sel, _ein("jm,bm...->bj...", Mj, V), V)

    y = _ein("lm,bm...->bl...", jnp.asarray(w, dt), V)
    return y.reshape((NB * L,) + tr)[:n]


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
