"""Lookahead peak limiter — replaces ffmpeg ``alimiter`` (SURVEY.md N4).

The reference always runs ``alimiter=level_in=1:level_out=1:limit=0.98:
attack=5:release=50`` as the final stage (audio_mastering_engine.py:223,
quirk Q8). This kernel provides the same contract — true hard ceiling at
``limit`` with a 5 ms anticipatory ramp and 50 ms smooth release — built
entirely from associative primitives:

  1. instantaneous target  g_t[n] = min(1, ceiling / peak[n])
  2. lookahead             g_a[n] = min over the NEXT ``attack`` window
                           (sliding-min-ahead, van Herk block scans)
  3. attack ramp           g_r[n] = mean over the PAST ``attack`` window
                           — every term of the mean is <= g_t[n] by (2),
                           so the ceiling guarantee survives smoothing
  4. release               1 - g[n] = max(1 - g_r[n], rho * (1 - g[n-1]))
                           — (×, max)-semiring scan, exponential recovery

Offline whole-track formulation: the gain is *anticipatory* rather than
delayed, so (unlike ffmpeg's streaming alimiter) the output is sample-
aligned with the input — no attack-length latency to trim. The spectral
behavior (no overshoot, ~5 ms ramp, 50 ms release) matches the alimiter
parameter contract; exact sample parity with ffmpeg's internal ramp logic
is not claimed (SURVEY.md §7.4 item 5: derive from behavior).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ame_tpu.ops import window as W


@partial(jax.jit, static_argnums=(1, 2))
def _limiter_jit(x, attack_samples, _n, ceiling, release_decay):
    peak = jnp.max(jnp.abs(x), axis=1)  # linked channels
    g_t = jnp.minimum(1.0, ceiling / jnp.maximum(peak, 1e-9))
    g_a = W.sliding_min_ahead(g_t, attack_samples)
    g_r = W.moving_mean_past(g_a, attack_samples)
    u = W.release_scan(1.0 - g_r, release_decay)
    gain = 1.0 - u
    return x * gain[:, None], gain


def lookahead_limiter(x: jax.Array, sample_rate: float,
                      ceiling: float = 0.98, attack_ms: float = 5.0,
                      release_ms: float = 50.0,
                      return_gain: bool = False):
    """Limit ``x`` [N, C] to +-ceiling. Gain is linked across channels."""
    attack_samples = max(int(attack_ms * sample_rate / 1000.0), 1)
    release_decay = math.exp(-1.0 / (release_ms * sample_rate / 1000.0))
    y, gain = _limiter_jit(x, attack_samples, x.shape[0],
                           jnp.asarray(ceiling, x.dtype),
                           jnp.asarray(release_decay, x.dtype))
    return (y, gain) if return_gain else y
