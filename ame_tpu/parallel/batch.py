"""Fleet mastering: data-parallel batch of tracks over a device mesh.

Tracks are independent (SURVEY.md §5.8 — "pure data parallelism; tracks are
independent"), so the batch axis shards over the mesh with NO collectives:
each chip masters its shard at single-chip speed. Stages are vmapped and
jitted individually (same staged-compilation strategy as graph.chain).
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
                       lufs_on):
    if analog_on:
        x = saturate.analog_character_quality(x, sample_rate, p["analog"])
    x = eq.apply_eq_quality(x, sample_rate, p["bass"], p["mid_cut"],
                            p["presence"], p["treble"])
    if width_on:
        x = stereo.stereo_width_quality(x, p["width"])
    if multiband_on:
        x = mb.multiband_quality(x, sample_rate, p["threshs"], p["ratios"])
    if lufs_on:
        x, _ = normalize_two_pass(x, sample_rate, p["lufs"])
    x = lookahead_limiter(x, sample_rate, C.LIMITER_CEILING,
                          C.LIMITER_ATTACK_MS, C.LIMITER_RELEASE_MS)
    return x


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _batch_jit(xs, p, sample_rate, analog_on, width_on, multiband_on,
               lufs_on):
    fn = lambda x: _one_track_quality(x, p, sample_rate, analog_on,
                                      width_on, multiband_on, lufs_on)
    return jax.vmap(fn)(xs)


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
    if mesh is not None:
        sharding = NamedSharding(mesh, P("data"))
        xs = jax.device_put(xs, sharding)
    return _batch_jit(xs, p, float(sample_rate),
                      settings.analog_character > 0,
                      settings.width != 1.0,
                      bool(settings.multiband),
                      settings.lufs is not None)
