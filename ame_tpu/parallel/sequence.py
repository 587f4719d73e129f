"""Sequence-parallel IIR filtering: the scan-IIR carry over ICI.

For programs too long for one chip's HBM (or latency budget), the time axis
shards over the mesh. The same decomposition that makes the single-chip scan
blocked (local zero-state scan + boundary-state carry + A^k correction)
works across chips: each device scans its local shard with zero state, the
per-shard final states are all-gathered (one small ICI collective of
[ndev, k, C, 2] floats), every device composes the states of the shards
before it (a static ndev-step loop of 2k-dim matvecs), and adds the
SUPERPOSITION term Crow·A^m·c — the zero-input response from the composed
carry — to its local output. Linearity makes this exact, and the correction
costs ~1/7 of a scan pass (it reuses the float64 matrix pack's Crow·A^l
tables), so the whole parallel filter does ~1.15x one chip's work instead
of the 2x of a seeded re-scan. Shard lengths need not be powers of two
(A^{local_n} is composed on the host in float64).

This is the direct analog of ring/blockwise sequence parallelism for audio
(SURVEY.md §5.7): continuous filter state across shard boundaries, no 30 s
resets, communication volume independent of track length.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # jax < 0.6
    from jax.experimental.shard_map import shard_map

from ame_tpu.ops.scan_iir import (_state_space_np, sosfilt_scan,
                                  zero_input_response)


def sosfilt_sequence_parallel(sos, x: jax.Array, mesh: Mesh,
                              axis: str = "sp") -> jax.Array:
    """Filter [N, C] x with the time axis sharded over mesh axis ``axis``.

    ``sos`` must be host-designed (numpy / concrete) coefficients — true of
    every compat/quality filter in the mastering graph except the traced
    RBJ EQ, which is single-chip-resident anyway. N must divide evenly by
    the axis size. Exact: matches the single-chip scan bit-for-tolerance.
    """
    if isinstance(sos, jax.core.Tracer):
        raise NotImplementedError(
            "sequence-parallel filtering requires host-known coefficients")
    ndev = mesh.shape[axis]
    n = x.shape[0]
    if n % ndev:
        raise ValueError(f"N={n} not divisible by {ndev} shards")
    local_n = n // ndev
    sos_np = np.ascontiguousarray(np.asarray(sos, np.float64))
    if ndev == 1:
        # one shard: the inbound carry is identically zero, so the whole
        # gather/compose/superposition machinery computes y0 + 0 — skip it
        # (the mesh-1 sp fixed cost was ~1 zero-input response per cascade)
        fn = shard_map(lambda xl: sosfilt_scan(sos_np, xl)[0], mesh=mesh,
                       in_specs=(P(axis, None),), out_specs=P(axis, None))
        return fn(x)
    k = sos_np.shape[0]
    D = 2 * k

    # A^{local_n} in float64 on the host (any local_n — no power-of-two
    # restriction), plus the scipy<->internal state maps
    A, _, _, _, Vf, Vi = _state_space_np(sos_np)
    AL = np.eye(D)
    Apow = A.copy()
    m = local_n
    while m:
        if m & 1:
            AL = Apow @ AL
        Apow = Apow @ Apow
        m >>= 1

    def local_fn(x_local):
        dt = x_local.dtype
        y0, zf0 = sosfilt_scan(sos_np, x_local)          # zero-state pass
        # gather every shard's zero-state end state: [ndev, k, C, 2]
        all_zf = jax.lax.all_gather(zf0, axis)
        idx = jax.lax.axis_index(axis)
        # compose the internal states of all shards before me
        Vi_j = jnp.asarray(Vi, dt)
        AL_j = jnp.asarray(AL, dt)
        hi = jax.lax.Precision.HIGHEST
        c = jnp.zeros((D,) + x_local.shape[1:], dt)
        for d in range(ndev - 1):
            e_int = jnp.einsum("kab,kb...->ka...", Vi_j,
                               jnp.moveaxis(all_zf[d], -1, 1),
                               precision=hi).reshape((D,) + x_local.shape[1:])
            nxt = jnp.einsum("jm,m...->j...", AL_j, c, precision=hi) + e_int
            c = jnp.where(d < idx, nxt, c)
        # back to scipy layout for the correction helper
        c_scipy = jnp.moveaxis(
            jnp.einsum("kab,kb...->ka...", jnp.asarray(Vf, dt),
                       c.reshape((k, 2) + x_local.shape[1:]),
                       precision=hi), 1, -1)
        # superposition: y = zero-state output + zero-input response
        return y0 + zero_input_response(sos_np, c_scipy, local_n)

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=P(axis, None))
    return fn(x)
