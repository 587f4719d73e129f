"""Sequence-parallel IIR filtering: the scan-IIR carry over ICI.

For programs too long for one chip's HBM (or latency budget), the time axis
shards over the mesh. The same decomposition that makes the single-chip scan
blocked (local zero-state scan + boundary-state carry + A^k correction)
works across chips: each device scans its local shard with zero state, the
per-shard final states are all-gathered (one small ICI collective of
[ndev, k, C, 2] floats), every device composes the states of the shards
before it (a static ndev-step loop of 2k-dim matvecs), and re-runs its local
scan seeded with the composed carry.

This is the direct analog of ring/blockwise sequence parallelism for audio
(SURVEY.md §5.7): continuous filter state across shard boundaries, no 30 s
resets, communication volume independent of track length.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ame_tpu.ops.scan_iir import sosfilt_scan, _cascade_state_space


def _advance_state(A, zi_flat, e_flat):
    """state-after-shard = A^(Ld) applied via... here A is already A^Ld."""
    return jnp.einsum("jm,m...->j...", A, zi_flat,
                      precision=jax.lax.Precision.HIGHEST) + e_flat


def sosfilt_sequence_parallel(sos, x: jax.Array, mesh: Mesh,
                              axis: str = "sp") -> jax.Array:
    """Filter [N, C] x with the time axis sharded over mesh axis ``axis``.

    N must divide evenly by the axis size. Exact (not windowed-approximate):
    the result matches the single-chip scan bit-for-tolerance.
    """
    ndev = mesh.shape[axis]
    n = x.shape[0]
    if n % ndev:
        raise ValueError(f"N={n} not divisible by {ndev} shards")
    local_n = n // ndev
    sos = jnp.asarray(sos, x.dtype)
    k = sos.shape[0]
    D = 2 * k

    def local_fn(sos_l, x_local):
        # x_local: [local_n, C]
        y0, zf0 = sosfilt_scan(sos_l, x_local)           # zero-state pass
        # gather every shard's zero-state end state: [ndev, k, C, 2]
        all_zf = jax.lax.all_gather(zf0, axis)
        idx = jax.lax.axis_index(axis)
        # A^(local_n) by repeated squaring (log2 steps, tiny matrices)
        A, _, _, _ = _cascade_state_space(sos_l, x_local.dtype)
        AL = A
        m = 1
        while m < local_n:
            AL = jnp.matmul(AL, AL, precision=jax.lax.Precision.HIGHEST)
            m *= 2
        if m != local_n:
            raise ValueError("local shard length must be a power of two")
        # compose states of all shards before me (static ndev loop)
        c = jnp.zeros((D,) + x_local.shape[1:], x_local.dtype)
        for d in range(ndev - 1):
            e_flat = jnp.moveaxis(all_zf[d], -1, 1).reshape(
                (D,) + x_local.shape[1:])
            nxt = _advance_state(AL, c, e_flat)
            c = jnp.where(d < idx, nxt, c)
        zi = jnp.moveaxis(c.reshape((k, 2) + x_local.shape[1:]), 1, -1)
        y, _ = sosfilt_scan(sos_l, x_local, zi=zi)
        return y

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(axis, None),
        check_rep=False)
    return fn(sos, x)
