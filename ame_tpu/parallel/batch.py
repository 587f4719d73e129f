"""Fleet mastering: data-parallel batch of tracks over a device mesh.

Tracks are independent (SURVEY.md §5.8 — "pure data parallelism; tracks are
independent"), so the batch axis shards over the mesh with NO collectives.

Round-3 layout finding (TPU-measured, 2^23-sample tracks, B=4, one chip):

    host-serial single-track dispatches   8.4 ms/track   (device-optimal)
    vmapped [B, N, 2] batch              11.9 ms/track   (lane-padded temps)
    channel-stacked [N, 2B]              16.4 ms/track   (worse still)

The single-track chain already saturates a chip, so no single-chip batch
layout can beat B serial dispatches on DEVICE time — the wins available
are (a) amortizing the per-dispatch host/tunnel round trip over the whole
batch and (b) multi-chip scaling. This module therefore runs the
UNMODIFIED single-track program B times inside one dispatch
(``lax.map`` = sequential on-device loop over the shard) under a
``shard_map`` over the mesh's data axis: per-chip throughput equals the
single-track number by construction, B tracks cost ONE round trip, and
D chips give D-fold aggregate. (The [N, 2B] experiment lives in
parallel/stacked.py for the record.)
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ame_tpu import config as C
from ame_tpu.ops import eq, saturate, stereo
from ame_tpu.graph import multiband as mb
from ame_tpu.ops.limiter import lookahead_limiter
from ame_tpu.ops.loudness import normalize_two_pass
from ame_tpu.graph.chain import params_from_settings


def _one_track_quality(x, p, sample_rate, analog_on, width_on, multiband_on,
                       lufs_on, mb_edges=None):
    if analog_on:
        x = saturate.analog_character_quality(x, sample_rate, p["analog"])
    x = eq.apply_eq_quality(x, sample_rate, p["bass"], p["mid_cut"],
                            p["presence"], p["treble"])
    if width_on:
        x = stereo.stereo_width_quality(x, p["width"])
    if multiband_on:
        if mb_edges is not None:
            x = mb.multiband_quality_n(x, sample_rate, mb_edges,
                                       p["threshs"], p["ratios"])
        else:
            x = mb.multiband_quality(x, sample_rate, p["threshs"],
                                     p["ratios"])
    if lufs_on:
        x, _ = normalize_two_pass(x, sample_rate, p["lufs"])
    x = lookahead_limiter(x, sample_rate, C.LIMITER_CEILING,
                          C.LIMITER_ATTACK_MS, C.LIMITER_RELEASE_MS)
    return x


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _batch_jit(xs, p, sample_rate, analog_on, width_on, multiband_on,
               lufs_on, mb_edges=None):
    fn = lambda x: _one_track_quality(x, p, sample_rate, analog_on,
                                      width_on, multiband_on, lufs_on,
                                      mb_edges)
    # on-device sequential loop over tracks: each iteration is the
    # single-track program in its natural [N, 2] layout
    return jax.lax.map(fn, xs)


def master_batch(xs: jax.Array, sample_rate: float, settings,
                 mesh=None) -> jax.Array:
    """Master a batch of tracks.

    Args:
      xs: [B, N, 2] float32; B should be a multiple of the mesh's 'data'
          axis size when a mesh is given.
      settings: MasterSettings or reference settings dict (quality mode).
      mesh: optional jax.sharding.Mesh with a 'data' axis.

    Returns mastered [B, N, 2].
    """
    from ame_tpu.config import MasterSettings
    if isinstance(settings, dict):
        settings = MasterSettings.from_dict(settings)
    p = params_from_settings(settings)
    static = (float(sample_rate),
              settings.analog_character > 0,
              settings.width != 1.0,
              bool(settings.multiband),
              settings.lufs is not None,
              settings.mb_edges)
    if mesh is not None:
        from jax.sharding import Mesh  # noqa: F401  (doc aid)
        try:
            from jax import shard_map
        except ImportError:  # jax < 0.6
            from jax.experimental.shard_map import shard_map
        sharding = NamedSharding(mesh, P("data"))
        xs = jax.device_put(xs, sharding)
        body = shard_map(
            lambda xl, pl: _batch_jit(xl, pl, *static),
            mesh=mesh, in_specs=(P("data"), P()), out_specs=P("data"))
        return jax.jit(body)(xs, p)
    return _batch_jit(xs, p, *static)
