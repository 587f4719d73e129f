"""Band-parallel ("expert"-style) multiband compression over a device mesh.

Each device owns ONE crossover band: its own LR4 filter cascade (the
"expert") and its own compressor threshold/ratio, computed straight off the
replicated input; the compressed bands recombine with one ``psum`` over the
``band`` axis — an ICI all-reduce. This is model parallelism over the
frequency axis, the complement of the other two distribution strategies:

  * dp (parallel/batch.py)    — throughput over independent tracks,
  * sp (parallel/sp_master.py) — one track sharded along time,
  * band-parallel (this)      — one track's MULTIBAND work-set sharded
    across chips: G-band mastering (graph/multiband.multiband_quality_n)
    at a single band's memory/compute footprint per chip. At large G
    (mastering-grade 6..16-band dynamics) the G full-length band copies +
    detector state are the dominant working set; splitting them over the
    mesh is what makes G-band processing of long tracks fit at all.

Reference: the 3-band multiband stage (audio_mastering_engine.py:299-309),
generalized to G bands and distributed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ame_tpu.graph import multiband as mb
from ame_tpu.ops import compressor
from ame_tpu.ops.scan_iir import sosfilt_scan, _route_tileconv

try:
    from jax import shard_map
except ImportError:  # jax < 0.6
    from jax.experimental.shard_map import shard_map


def _apply_cascade(sos, xi):
    """One band's cascade via the default MXU tile-conv engine (same
    routing as the single-device multiband crossovers)."""
    if _route_tileconv(xi):
        from ame_tpu.ops.tile_conv import sosfilt_tileconv_bank
        return sosfilt_tileconv_bank([sos], xi)[0]
    return sosfilt_scan(sos, xi)[0]


def multiband_band_parallel(x: jax.Array, sample_rate: float, edges,
                            threshs, ratios, mesh, axis: str = "band",
                            attack_ms: float = 5.0,
                            release_ms: float = 50.0) -> jax.Array:
    """G-band multiband compression with one band per mesh slice.

    Args:
      x: [N, C] float32, replicated to every device on the ``axis`` slice.
      edges: G-1 crossover frequencies (Hz, ascending); G must equal the
        mesh's ``axis`` size.
      threshs / ratios: per-band compressor parameters, length G.
      mesh: Mesh with a ``band`` (or ``axis``-named) dimension of size G.

    Returns the recombined [N, C] master (replicated).
    """
    G = len(tuple(edges)) + 1
    if mesh.shape[axis] != G:
        raise ValueError(
            f"mesh axis '{axis}' has {mesh.shape[axis]} slices; "
            f"{G} bands need exactly G slices (edges={tuple(edges)})")
    cascades = mb._band_cascades_n(float(sample_rate), tuple(edges))
    th = jnp.asarray(threshs, jnp.float32)
    ra = jnp.asarray(ratios, jnp.float32)

    def shard_fn(xl, th_l, ra_l):
        g = jax.lax.axis_index(axis)
        # Each branch closes over its band's STATIC cascade coefficients —
        # the per-device program selects its expert with lax.switch (every
        # device compiles all G branches once, runs one).
        branches = [
            (lambda xi, sos=sos: _apply_cascade(sos, xi))
            for sos in cascades
        ]
        band = jax.lax.switch(g, branches, xl)
        comp = compressor.compress_quality_multi(
            [band], float(sample_rate), [th_l[g]], [ra_l[g]],
            attack_ms=attack_ms, release_ms=release_ms)[0]
        return jax.lax.psum(comp, axis)

    repl = NamedSharding(mesh, P())
    x = jax.device_put(x, repl)
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P(), P()), out_specs=P())
    return jax.jit(fn)(x, th, ra)
