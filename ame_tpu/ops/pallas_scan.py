"""Pallas one-pass cascade scan (TPU kernel) — a routed IIR alternative.

The DEFAULT engine is the MXU tile-convolution path (ops/tile_conv.py,
selected in ops/scan_iir.py); this kernel serves the host-designed k>=2
cascades behind AME_TPU_PALLAS=1 and remains the one-HBM-pass formulation.

The XLA blocked Kogge-Stone scan (ops/scan_iir.py) re-touches HBM once per
level (~7 passes over the [D, N, C] state at L=128). This kernel does the
whole cascade in ONE pass: the TPU grid walks time blocks sequentially, the
filter state carries across grid steps in a persistent VMEM scratch, and all
log2(TB) scan levels happen on VMEM-resident data — HBM traffic is read x +
write y, the optimum (round-1 ROADMAP item 1; measured 1.4-1.5x over the
XLA path at k >= 3).

Kronecker layout (everything 2-D — Mosaic lowers only 2-D contractions):
state rows are (state-dim, channel) pairs, S: [D*C, TB], level matrices are
A^(2^l) ⊗ I_C. The carry folds into the block's first scan element
(v0 += (A⊗I)·c), so the in-block scan directly produces TRUE states — no
correction table, and the carry out is just the last state column.

Per grid step i over blocks of TB samples:

    S        <- (B ⊗ 1_C) * tile(x_blk)      [DC, TB] scratch
    S[:, 0] += (A⊗I) c                        carry fold (c = zi at i == 0)
    level l:  S += (A^(2^l)⊗I) · shift_right(S, 2^l)
    z        = (Crow⊗I) S                     [C, TB]
    y_blk    = dpass·x_blk + shift1(z | Crow·c at column 0)
    c        <- S[:, TB-1]

Two matrix sources feed the same kernel:
  * host-designed (numpy) coefficients — float64 level packs (stable even
    for the reference's near-defective Nyquist-clamped filters);
  * TRACED coefficients (quality mode's gain-dependent RBJ filters) — the
    matrices and their squaring chain are built in-graph in f32; fine for
    quality-mode poles (well inside the unit circle), which is the only
    caller of the traced path.

Lengths that are not a TB multiple run the final partial block through the
XLA scan seeded with the kernel's carry — exact, no padding anywhere (a
trailing zero-pad would corrupt zf; a leading pad would corrupt zi).

Routing lives in scan_iir.sosfilt_scan: ON by default on TPU for k >= 3
cascades (k <= 2 measured faster on the XLA path); AME_TPU_PALLAS=0/1
forces it off/on.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Swept on v5e at 8.4M samples: k=4 cascade is ~21.5 ms at TB 4096/16384
# alike; smaller TB helps small-k cases and halves VMEM.
_TB = int(__import__("os").environ.get("AME_TPU_PALLAS_TB", 1 << 12))

_HI = jax.lax.Precision.HIGHEST


def _kernel(levels_ref, Ak_ref, Bcol_ref, Crowk_ref, dpass_ref, zi_ref,
            x_ref, o_ref, zf_ref, S, c, *, nlev, DC, C, TB):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        c[:] = zi_ref[:]

    xb = x_ref[:]  # [C, TB]
    xx = jnp.concatenate([xb] * (DC // C), axis=0)  # [DC, TB]
    S[:] = Bcol_ref[:] * xx

    # fold the carry into the first scan element: v0 += (A⊗I) c
    carry_fold = jnp.dot(Ak_ref[:], c[:],
                         preferred_element_type=jnp.float32,
                         precision=_HI)  # [DC, 1]
    t_dc = jax.lax.broadcasted_iota(jnp.int32, (DC, TB), 1)
    S[:] = S[:] + jnp.where(t_dc < 1, carry_fold, 0.0)

    # Kogge-Stone levels, all in VMEM
    for l in range(nlev):
        shift = 1 << l
        rolled = pltpu.roll(S[:], shift, 1)
        shifted = jnp.where(t_dc >= shift, rolled, 0.0)
        S[:] = S[:] + jnp.dot(levels_ref[l], shifted,
                              preferred_element_type=jnp.float32,
                              precision=_HI)

    # z[c, t] = Crow · S  (true state AFTER each sample)
    z = jnp.dot(Crowk_ref[:], S[:],
                preferred_element_type=jnp.float32, precision=_HI)
    # s_before contribution: shift1(z), with Crow·c entering at column 0
    zc = jnp.dot(Crowk_ref[:], c[:],
                 preferred_element_type=jnp.float32, precision=_HI)
    z_rolled = pltpu.roll(z, 1, 1)
    t_c = jax.lax.broadcasted_iota(jnp.int32, (C, TB), 1)
    z1 = jnp.where(t_c >= 1, z_rolled, zc)
    o_ref[:] = dpass_ref[0, 0] * xb + z1

    c[:] = S[:, TB - 1:TB]
    zf_ref[:] = c[:]  # last write (final grid step) = state after sample N-1


@functools.partial(jax.jit, static_argnums=(7, 8))
def _pallas_cascade(x_t, levels, Ak, Bcol, Crowk, dpass, zi_col, DC, C):
    """x_t: [C, N] with N a multiple of _TB; zi_col: [DC, 1] internal
    (coupled, kron-layout) initial state."""
    n = x_t.shape[1]
    nb = n // _TB
    nlev = int(math.log2(_TB))
    kern = functools.partial(_kernel, nlev=nlev, DC=DC, C=C, TB=_TB)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((nlev, DC, DC), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DC, DC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((DC, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, DC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((DC, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, _TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((C, _TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((DC, 1), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((C, n), jnp.float32),
                   jax.ShapeDtypeStruct((DC, 1), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((DC, _TB), jnp.float32),
            pltpu.VMEM((DC, 1), jnp.float32),
        ],
    )(levels, Ak, Bcol, Crowk, dpass, zi_col, x_t)


# ---------------------------------------------------------------------------
# Matrix packs
# ---------------------------------------------------------------------------

def _pack_host(sos_np: np.ndarray, C: int):
    """float64 level matrices for host-designed coefficients."""
    from ame_tpu.ops.scan_iir import _state_space_np

    A, B, Crow, dpass, Vf, Vi = _state_space_np(np.asarray(sos_np,
                                                           np.float64))
    eye = np.eye(C)
    nlev = int(math.log2(_TB))
    with np.errstate(over="ignore", invalid="ignore"):
        levels = []
        M = A.copy()
        for _ in range(nlev):
            levels.append(np.kron(M, eye))
            M = M @ M
    f32 = lambda a: jnp.asarray(
        np.nan_to_num(a, posinf=0.0, neginf=0.0), jnp.float32)
    return (f32(np.stack(levels)), f32(np.kron(A, eye)),
            f32(np.repeat(B, C)[:, None]), f32(np.kron(Crow[None, :], eye)),
            jnp.asarray([[dpass]], jnp.float32),
            f32(Vf), f32(Vi))


def _pack_traced(sos, C: int, dt):
    """In-graph (traced) level matrices — f32 squaring chain. Only used by
    quality-mode filters whose bounded gains keep poles comfortably inside
    the unit circle (the host path keeps float64 for the pathological
    compat designs)."""
    from ame_tpu.ops.scan_iir import _cascade_state_space, _zi_transforms

    A, B, Crow, dpass = _cascade_state_space(sos, dt)
    Vi, Vf = _zi_transforms(sos, dt)
    eye = jnp.eye(C, dtype=dt)
    nlev = int(math.log2(_TB))
    levels = []
    M = A
    for _ in range(nlev):
        levels.append(jnp.kron(M, eye))
        M = jnp.matmul(M, M, precision=_HI)
    return (jnp.stack(levels), jnp.kron(A, eye),
            jnp.repeat(B, C)[:, None],
            jnp.kron(Crow[None, :], eye),
            dpass.reshape(1, 1), Vf, Vi)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _zi_to_col(zi, Vi, k, C, dt):
    """scipy-layout zi [k, C, 2] -> internal kron-layout column [DC, 1]."""
    if zi is None:
        return jnp.zeros((2 * k * C, 1), jnp.float32)
    zi_int = jnp.einsum("kab,kcb->kac", Vi, jnp.asarray(zi, dt),
                        precision=_HI)          # [k, 2, C]
    return zi_int.reshape(2 * k * C, 1)


def _zf_from_col(zf_col, Vf, k, C):
    zf_int = zf_col.reshape(2 * k, C).reshape(k, 2, C)
    return jnp.einsum("kab,kbc->kca", Vf, zf_int, precision=_HI)


def sosfilt_pallas(sos, x: jax.Array, zi: jax.Array | None = None):
    """One-pass cascade filter. x: [N, C]; sos: host numpy [k, 6] (f64
    packs) or a traced [k, 6] array (in-graph f32 packs). zi: scipy layout
    [k, C, 2] or None. Returns (y [N, C], zf [k, C, 2]).

    A non-multiple-of-TB tail runs through the XLA scan seeded with the
    kernel's carry — exact at both ends, no padding.
    """
    n, C = x.shape
    host_known = isinstance(sos, np.ndarray)
    k = int(np.shape(sos)[0])
    DC = 2 * k * C
    dt = x.dtype

    if host_known:
        (levels, Ak, Bcol, Crowk, dpass, Vf, Vi) = _pack_host(sos, int(C))
    else:
        (levels, Ak, Bcol, Crowk, dpass, Vf, Vi) = _pack_traced(
            jnp.asarray(sos, dt), int(C), dt)

    n_main = (n // _TB) * _TB
    if n_main == 0:  # shorter than one kernel block: pure XLA
        y = jnp.zeros((0, C), dt)
        zf = None if zi is None else jnp.asarray(zi, dt)
    else:
        zi_col = _zi_to_col(zi, Vi, k, int(C), dt)
        y_main, zf_col = _pallas_cascade(
            x[:n_main].T, levels, Ak, Bcol, Crowk, dpass, zi_col, DC, int(C))
        y = y_main.T
        zf = _zf_from_col(zf_col, Vf, k, int(C))

    if n_main != n:  # exact partial tail on the XLA path
        from ame_tpu.ops import scan_iir as si
        tail = x[n_main:]
        if host_known:
            L = min(si._MAX_BLOCK, si._pow2ceil(tail.shape[0]))
            sos64 = np.ascontiguousarray(np.asarray(sos, np.float64))
            pack = si._host_pack_cached(sos64.tobytes(), k, L, dt.name)
            y_tail, zf = si._cascade_ks_pack(tail, pack, zf, L, k)
        else:
            L = min(si._MAX_BLOCK, si._pow2ceil(tail.shape[0]))
            y_tail, zf = si._cascade_ks_traced(tail, jnp.asarray(sos, dt),
                                               zf, L, k)
        y = jnp.concatenate([y, y_tail], axis=0)
    return y, zf
