"""Tile-convolution IIR engine — MXU-native cascade filtering.

The blocked Kogge-Stone scan (ops/scan_iir.py) and the one-pass Pallas
kernel (ops/pallas_scan.py) both spend their time on VPU level passes:
log2(L) shift+select+add sweeps over the state array. This module instead
exploits that a linear filter restricted to a 128-sample tile IS a small
matrix multiply — exactly the shape the MXU was built for:

    y_tile   = H  · x_tile  +  W · c          (within-tile convolution
    c_next   = A^L · c      +  R · x_tile      + zero-input response)

with, for a cascade whose state-space form is (A [D,D], B, Crow, d)
(ops/scan_iir._cascade_state_space — the same coupled-form builder):

    h[0] = d,  h[m] = Crow A^(m-1) B           (impulse response)
    H[t, u] = h[t - u]   (u <= t)              [L, L]  lower-tri Toeplitz
    W[t]    = Crow A^t                          [L, D]
    R[:, u] = A^(L-1-u) B                       [D, L]

Everything is exact — no impulse-response truncation: the carry c (the
filter state at each tile boundary) is propagated by a parallel
Kogge-Stone prefix over [n_tiles, D, C] arrays (tiny), and H/W/R capture
the within-tile dynamics completely.

Why this is the right TPU design (measured on v5e, 2^23-sample stereo —
benchmarks/bench_scan_paths.py):

  * The hot FLOPs are ONE einsum("tu,buc->btc") per filter — dense MXU
    work at ~L MACs/sample regardless of cascade order k. Measured
    3.9 ms for the whole filter vs 16-32 ms (XLA level-pass scan) and
    10-16 ms (Pallas one-pass kernel), identical for k = 1..4.
  * HBM traffic is read-x + write-y plus tiny carry arrays.
  * Everything stays in the natural [N, C] row-major layout: the
    [N, C] -> [nb, L, C] tile reshape splits the MAJOR axis (free), and
    channels stay a free minor dim of every contraction. (The obvious
    alternative — kron-interleaving channels into [nb, L*C] rows — costs
    a 12-14 ms relayout per reshape on this hardware, measured; that sunk
    the first version of this kernel.)

Numerics: H/W/R/A^L are computed on the host in float64 for host-designed
(numpy) coefficients — including the reference's near-defective
Nyquist-clamped peak filters (quirk Q14), whose coupled-form powers stay
bounded — and enter the graph as f32 values. Within a tile each output is
a DIRECT L-term dot product at Precision.HIGHEST (no recursive error
compounding), so accuracy vs the float64 scipy oracle is ~1e-7 relative,
an order better than the level-pass scan. Traced (gain-dependent
quality-EQ) coefficients build the same tables in-graph from a doubling
of A powers.

Replaces scipy lfilter/sosfilt (SURVEY.md N6; reference call sites
audio_mastering_engine.py:286, 296, 301-303) on the TPU hot path; routing
lives in scan_iir.sosfilt_scan.
"""

from __future__ import annotations

import functools
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ame_tpu.ops.scan_iir import (
    _HI,
    _cascade_state_space,
    _ein,
    _shift_right,
    _state_space_np,
    _zi_transforms,
)

# Tile length (time samples per tile): H is [LB, LB], one MXU tile.
_LB = int(os.environ.get("AME_TPU_TILECONV_LB", 128))

_CARRY_LEVELS = 40  # A^(L·2^j) tables cover N up to LB * 2^40


# ---------------------------------------------------------------------------
# Host (float64) pack
# ---------------------------------------------------------------------------

def _tables_np(sos_np: np.ndarray, Lb: int):
    """f64 (H, W, R, Apow) from the cascade state space. Apow: [Lb+1, D, D]."""
    A, B, Crow, dpass, Vf, Vi = _state_space_np(np.asarray(sos_np, np.float64))
    D = A.shape[0]
    Apow = np.empty((Lb + 1, D, D))
    Apow[0] = np.eye(D)
    for t in range(1, Lb + 1):
        Apow[t] = Apow[t - 1] @ A
    h = np.empty(Lb)
    h[0] = dpass
    if Lb > 1:
        # h[m] = Crow A^(m-1) B, m >= 1
        h[1:] = np.einsum("j,tjm,m->t", Crow, Apow[: Lb - 1], B)
    idx = np.arange(Lb)
    dif = idx[:, None] - idx[None, :]
    H = np.where(dif >= 0, h[np.clip(dif, 0, Lb - 1)], 0.0)
    W = np.einsum("j,tjm->tm", Crow, Apow[:Lb])          # [Lb, D]
    R = np.einsum("ujm,m->ju", Apow[Lb - 1 :: -1], B)     # [D, Lb]
    return H, W, R, Apow, (A, B, Crow, dpass, Vf, Vi)


@functools.lru_cache(maxsize=256)
def _host_pack_cached(sos_bytes: bytes, k: int, Lb: int, dt_name: str):
    """f32 tables (numpy values; converted to device constants at the jit
    boundary so no tracer is ever cached)."""
    sos_np = np.frombuffer(sos_bytes, np.float64).reshape(k, 6)
    H, W, R, Apow, (A, B, Crow, dpass, Vf, Vi) = _tables_np(sos_np, Lb)
    AL = Apow[Lb]
    with np.errstate(over="ignore", invalid="ignore"):
        carry = []
        M = AL.copy()
        for _ in range(_CARRY_LEVELS):
            carry.append(M)
            M = M @ M
            M[~np.isfinite(M)] = 0.0  # decayed past f64: exact zero
    dt = np.dtype(dt_name)
    cast = lambda a: np.nan_to_num(np.asarray(a, dt), nan=0.0, posinf=0.0,
                                   neginf=0.0)
    return {
        "H": cast(H), "W": cast(W), "R": cast(R),
        "carry": cast(np.stack(carry)),
        "Apow": Apow, "B": B,                 # f64, for partial tables
        "Vf": cast(Vf), "Vi": cast(Vi),
    }


@functools.lru_cache(maxsize=512)
def _host_partial_cached(sos_bytes: bytes, k: int, Lb: int, ki: int,
                         dt_name: str):
    """Final-state extraction for a track ending at within-tile offset
    ``ki`` (static): zf = A^(ki+1) · c_last + Px · x_last_tile with
    Px[:, u] = A^(ki-u) B for u <= ki."""
    pack = _host_pack_cached(sos_bytes, k, Lb, dt_name)
    Apow, B = pack["Apow"], pack["B"]
    D = Apow.shape[1]
    Px = np.zeros((D, Lb))
    for u in range(ki + 1):
        Px[:, u] = Apow[ki - u] @ B
    dt = np.dtype(dt_name)
    return np.asarray(Apow[ki + 1], dt), np.asarray(Px, dt)


# ---------------------------------------------------------------------------
# Carry prefix (Kogge-Stone on [nb, D, C] with per-level matrices)
# ---------------------------------------------------------------------------

def _carry_prefix_tiles(carry_levels, e, c0):
    """c[b+1] = AL c[b] + e[b] solved in parallel; e: [nb, D, C],
    c0: [D, C]. Returns [nb, D, C] of states BEFORE each tile."""
    nb = e.shape[0]
    e = e.at[0].add(_ein("dm,mc->dc", carry_levels[0], c0))
    P = 1 << max(nb - 1, 1).bit_length() if nb > 1 else 1
    F = jnp.pad(e, ((0, P - nb), (0, 0), (0, 0)))
    s, lvl = 1, 0
    while s < P:
        F = F + _ein("dm,bmc->bdc", carry_levels[lvl],
                     _shift_right(F, s, axis=0))
        s *= 2
        lvl += 1
    F = F[:nb]
    return jnp.concatenate([c0[None], F[:-1]], axis=0)


# ---------------------------------------------------------------------------
# Core (shared by host/traced paths; tables enter as arrays)
# ---------------------------------------------------------------------------

def _zi_to_state(zi, Vi, dt):
    """scipy-layout zi [k, C, 2] -> internal coupled state [D, C]."""
    zi_int = _ein("kab,kcb->kac", jnp.asarray(Vi, dt),
                  jnp.asarray(zi, dt))            # [k, 2, C]
    k, _, C = zi_int.shape
    return zi_int.reshape(2 * k, C)


def _zf_from_state(s, Vf, dt):
    """internal [D, C] -> scipy layout [k, C, 2]."""
    D, C = s.shape
    return _ein("kab,kbc->kca", jnp.asarray(Vf, dt), s.reshape(D // 2, 2, C))


@partial(jax.jit, static_argnums=(8, 9))
def _tileconv_run(x, H, W, R, carry, Pc, Px, c0, N, Lb):
    """x: the already-padded [nb*Lb, C] buffer plus the true N for the
    output slice. Returns (y [N, C], final internal state [D, C])."""
    C = x.shape[1]
    nb = x.shape[0] // Lb
    xt = x.reshape(nb, Lb, C)
    Yl = _ein("tu,buc->btc", H, xt)          # within-tile convolution
    E = _ein("du,buc->bdc", R, xt)           # carry injection per tile
    Cst = _carry_prefix_tiles(carry, E, c0)  # states BEFORE tiles
    y = Yl + _ein("td,bdc->btc", W, Cst)
    # final state after sample N-1 (exact despite zero tail padding: only
    # inputs u <= ki enter Px)
    zf_state = (_ein("dm,mc->dc", Pc, Cst[nb - 1])
                + _ein("du,uc->dc", Px, xt[nb - 1]))
    return y.reshape(nb * Lb, C)[:N], zf_state


def sosfilt_tileconv(sos, x: jax.Array, zi: jax.Array | None = None):
    """Cascade filter via the tile-conv engine. x: [N, C]; sos: host numpy
    [k, 6] (float64 tables) or traced [k, 6] (in-graph tables). zi: scipy
    layout [k, C, 2] or None. Returns (y [N, C], zf [k, C, 2])."""
    N, C = x.shape
    k = int(np.shape(sos)[0])
    dt = x.dtype
    Lb = _LB
    nb = -(-N // Lb)
    ki = (N - 1) % Lb
    xp = jnp.pad(x, ((0, nb * Lb - N), (0, 0)))

    host_known = isinstance(sos, np.ndarray) or (
        isinstance(sos, jax.Array) and not isinstance(sos, jax.core.Tracer))
    if host_known:
        sos64 = np.ascontiguousarray(np.asarray(sos, np.float64))
        key = (sos64.tobytes(), k, Lb, dt.name)
        pack = _host_pack_cached(*key)
        H, W, R = pack["H"], pack["W"], pack["R"]
        carry, Vf, Vi = pack["carry"], pack["Vf"], pack["Vi"]
        Pc, Px = _host_partial_cached(key[0], k, Lb, ki, dt.name)
    else:
        (H, W, R, carry, Pc, Px, Vf, Vi) = _traced_tables(
            jnp.asarray(sos, dt), Lb, ki,
            max(int(nb - 1).bit_length(), 1), dt)

    if zi is None:
        c0 = jnp.zeros((2 * k, C), dt)
    else:
        c0 = _zi_to_state(zi, Vi, dt)

    y, zf_state = _tileconv_run(
        xp, jnp.asarray(H, dt), jnp.asarray(W, dt), jnp.asarray(R, dt),
        jnp.asarray(carry, dt), jnp.asarray(Pc, dt), jnp.asarray(Px, dt),
        c0, N, Lb)
    return y, _zf_from_state(zf_state, Vf, dt)


# ---------------------------------------------------------------------------
# Traced-coefficient tables (quality mode's gain-dependent filters)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _traced_tables(sos, Lb, ki, n_carry_levels, dt):
    """In-graph construction of the tables. f32 squaring chains are fine
    here: quality-mode poles sit well inside the unit circle (the
    pathological Nyquist-clamped compat designs always take the host
    path)."""
    A, B, Crow, dpass = _cascade_state_space(sos, dt)
    Vi, Vf = _zi_transforms(sos, dt)
    D = A.shape[0]
    eye = jnp.eye(D, dtype=dt)

    # A^t table for t = 0..Lb-1 via doubling (log2(Lb) batched matmuls)
    T = jnp.where((jnp.arange(Lb) == 0)[:, None, None], eye[None], A[None])
    shift = 1
    while shift < Lb:
        Ts = jnp.concatenate(
            [jnp.broadcast_to(eye[None], (shift, D, D)), T[: Lb - shift]],
            axis=0)
        T = _ein("lij,ljk->lik", T, Ts)
        shift *= 2
    AL = _ein("ij,jk->ik", T[Lb - 1], A)  # A^Lb

    h0 = dpass[None]
    hrest = _ein("j,tjm,m->t", Crow, T[: Lb - 1], B)
    h = jnp.concatenate([h0, hrest])
    idx = jnp.arange(Lb)
    dif = idx[:, None] - idx[None, :]
    H = jnp.where(dif >= 0, h[jnp.clip(dif, 0, Lb - 1)], 0.0)
    W = _ein("j,tjm->tm", Crow, T)                       # [Lb, D]
    R = _ein("ujm,m->ju", T[::-1], B)                     # [D, Lb]

    carry = []
    M = AL
    for _ in range(n_carry_levels):
        carry.append(M)
        M = jnp.matmul(M, M, precision=_HI)
    carry = jnp.stack(carry)

    # partial final-state tables for a track ending at offset ki
    Pc = _ein("ij,jk->ik", T[ki], A)                      # A^(ki+1)
    mask = jnp.arange(Lb) <= ki
    Pxt = _ein("ujm,m->ju", T[jnp.clip(ki - idx, 0, Lb - 1)], B)
    Px = jnp.where(mask[None, :], Pxt, 0.0)
    return H, W, R, carry, Pc, Px, Vf, Vi


# ---------------------------------------------------------------------------
# Filter bank: G cascades over ONE shared input, one wide MXU contraction
# ---------------------------------------------------------------------------

def sosfilt_tileconv_bank(sos_list, x: jax.Array):
    """Run G host-designed cascades on the same input in one fused pass.

    The G within-tile convolutions stack into a single
    einsum("vu,buc->bvc") with v = G·Lb rows (the hot cost); each group
    keeps its own tiny carry prefix. Groups may have different section
    counts. Returns a list of G outputs [N, C]. Used by the multiband
    crossovers (graph/multiband.py) where the reference runs scipy sosfilt
    per band (audio_mastering_engine.py:301-303).
    """
    N, C = x.shape
    dt = x.dtype
    Lb = _LB
    nb = -(-N // Lb)
    xp = jnp.pad(x, ((0, nb * Lb - N), (0, 0)))

    packs = []
    for sos in sos_list:
        sos64 = np.ascontiguousarray(np.asarray(sos, np.float64))
        packs.append(_host_pack_cached(sos64.tobytes(),
                                       int(sos64.shape[0]), Lb, dt.name))
    H_wide = np.concatenate([p["H"] for p in packs], axis=0)  # [G*Lb, Lb]
    return _bank_run(xp, jnp.asarray(H_wide, dt),
                     tuple(jnp.asarray(p["R"], dt) for p in packs),
                     tuple(jnp.asarray(p["carry"], dt) for p in packs),
                     tuple(jnp.asarray(p["W"], dt) for p in packs),
                     N, Lb)


@partial(jax.jit, static_argnums=(5, 6))
def _bank_run(xp, H_wide, Rs, carries, Ws, N, Lb):
    C = xp.shape[1]
    nb = xp.shape[0] // Lb
    G = len(Rs)
    xt = xp.reshape(nb, Lb, C)
    Ywide = _ein("vu,buc->bvc", H_wide, xt)   # [nb, G*Lb, C]
    outs = []
    for g in range(G):
        E = _ein("du,buc->bdc", Rs[g], xt)
        c0 = jnp.zeros((Rs[g].shape[0], C), xp.dtype)
        Cst = _carry_prefix_tiles(carries[g], E, c0)
        y = (Ywide[:, g * Lb:(g + 1) * Lb, :]
             + _ein("td,bdc->btc", Ws[g], Cst))
        outs.append(y.reshape(nb * Lb, C)[:N])
    return outs
