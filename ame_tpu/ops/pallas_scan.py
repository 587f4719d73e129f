"""Pallas one-pass cascade scan (TPU kernel).

The XLA blocked Kogge-Stone scan (ops/scan_iir.py) re-touches HBM once per
level (~7 passes over the [D, N, C] state at L=128). This kernel does the
whole cascade in ONE pass: the TPU grid walks time blocks sequentially, the
filter state carries across grid steps in a persistent VMEM scratch, and all
log2(TB) scan levels happen on VMEM-resident data — HBM traffic is read x +
write y, the optimum (ROADMAP item 1).

Kronecker layout (everything 2-D — Mosaic lowers only 2-D contractions):
state rows are (state-dim, channel) pairs, S: [D*C, TB], level matrices are
A^(2^l) ⊗ I_C (host-precomputed in float64). The carry folds into the
block's first scan element (v0 += (A⊗I)·c), so the in-block scan directly
produces TRUE states — no correction table, and the carry out is just the
last state column.

Per grid step i over blocks of TB samples:

    S        <- (B ⊗ 1_C) * tile(x_blk)      [DC, TB] scratch
    S[:, 0] += (A⊗I) c                        carry fold
    level l:  S += (A^(2^l)⊗I) · shift_right(S, 2^l)
    z        = (Crow⊗I) S                     [C, TB]
    y_blk    = dpass·x_blk + shift1(z | Crow·c at column 0)
    c        <- S[:, TB-1]

Used for host-designed (numpy) coefficient cascades; enable with
AME_TPU_PALLAS=1 (kept opt-in until soak time accumulates — ROADMAP)."""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Swept on v5e at 8.4M samples: k=4 cascade is ~21.5 ms at TB 4096/16384
# alike; smaller TB helps small-k cases and halves VMEM. 1<<16 exceeds
# VMEM at DC=16.
_TB = int(__import__("os").environ.get("AME_TPU_PALLAS_TB", 1 << 12))


def _kernel(levels_ref, Ak_ref, Bcol_ref, Crowk_ref, x_ref, o_ref, zf_ref,
            S, c, *, nlev, DC, C, TB, dpass):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        c[:] = jnp.zeros((DC, 1), jnp.float32)

    xb = x_ref[:]  # [C, TB]
    xx = jnp.concatenate([xb] * (DC // C), axis=0)  # [DC, TB]
    S[:] = Bcol_ref[:] * xx

    # fold the carry into the first scan element: v0 += (A⊗I) c
    carry_fold = jnp.dot(Ak_ref[:], c[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)  # [DC, 1]
    t_dc = jax.lax.broadcasted_iota(jnp.int32, (DC, TB), 1)
    S[:] = S[:] + jnp.where(t_dc < 1, carry_fold, 0.0)

    # Kogge-Stone levels, all in VMEM
    for l in range(nlev):
        shift = 1 << l
        rolled = pltpu.roll(S[:], shift, 1)
        shifted = jnp.where(t_dc >= shift, rolled, 0.0)
        S[:] = S[:] + jnp.dot(levels_ref[l], shifted,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)

    # z[c, t] = Crow · S  (true state AFTER each sample)
    z = jnp.dot(Crowk_ref[:], S[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [C, TB]
    # s_before contribution: shift1(z), with Crow·c entering at column 0
    zc = jnp.dot(Crowk_ref[:], c[:],
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)  # [C, 1]
    z_rolled = pltpu.roll(z, 1, 1)
    t_c = jax.lax.broadcasted_iota(jnp.int32, (C, TB), 1)
    z1 = jnp.where(t_c >= 1, z_rolled, zc)
    o_ref[:] = dpass * xb + z1

    c[:] = S[:, TB - 1:TB]
    zf_ref[:] = c[:]  # last write (final grid step) = state after sample N-1


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _pallas_cascade(x_t, levels, Ak, Bcol, Crowk, DC, C, dpass):
    """x_t: [C, N] with N a multiple of _TB."""
    n = x_t.shape[1]
    nb = n // _TB
    nlev = int(math.log2(_TB))
    kern = functools.partial(_kernel, nlev=nlev, DC=DC, C=C, TB=_TB,
                             dpass=dpass)
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
    )(levels, Ak, Bcol, Crowk, x_t)


def sosfilt_pallas(sos_np: np.ndarray, x: jax.Array):
    """One-pass cascade filter. x: [N, C]; sos: host numpy [k, 6].
    Zero initial state; returns (y [N, C], zf [k, C, 2] scipy layout)."""
    from ame_tpu.ops.scan_iir import _state_space_np

    sos_np = np.asarray(sos_np, np.float64)
    k = sos_np.shape[0]
    D = 2 * k
    A, B, Crow, dpass, Vf, Vi = _state_space_np(sos_np)

    n, C = x.shape
    DC = D * C
    eye = np.eye(C)
    nlev = int(math.log2(_TB))
    with np.errstate(over="ignore", invalid="ignore"):
        levels = []
        M = A.copy()
        for _ in range(nlev):
            levels.append(np.kron(M, eye))
            M = M @ M
    Ak = np.kron(A, eye)
    Bcol = np.repeat(B, C)[:, None]          # B ⊗ 1_C
    Crowk = np.kron(Crow[None, :], eye)      # [C, DC]

    f32 = lambda a: jnp.asarray(np.nan_to_num(a, posinf=0.0, neginf=0.0),
                                jnp.float32)
    n_pad = -(-n // _TB) * _TB
    # Pad at the FRONT: zero state through leading zero input stays exactly
    # zero, so the carry out of the last block IS the state after the last
    # real sample — no inversion of the (exponentially ill-conditioned)
    # A^pad needed, unlike trailing padding.
    x_t = jnp.pad(x, ((n_pad - n, 0), (0, 0))).T  # [C, n_pad]
    y_t, zf_col = _pallas_cascade(x_t, f32(np.stack(levels)), f32(Ak),
                                  f32(Bcol), f32(Crowk), DC, int(C),
                                  float(dpass))
    zf_int = zf_col.reshape(D, C)  # d-major rows
    Vf64 = Vf  # [k, 2, 2]
    zf = jnp.einsum("kab,kbc->kca",
                    jnp.asarray(Vf64, jnp.float32),
                    zf_int.reshape(k, 2, C))
    return y_t.T[n_pad - n:], zf
