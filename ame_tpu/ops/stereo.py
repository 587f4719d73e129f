"""Mid/side stereo width (reference apply_stereo_width, engine:267-271)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stereo_width(x: jax.Array, width: jax.Array) -> jax.Array:
    """x: [N, 2]; width scalar. mid = (L+R)/2, side = (L-R)/2 * width,
    re-matrixed with a clip to [-1, 1] (the reference clips here and only
    here, engine:270). Mono/ndim!=2 inputs pass through untouched."""
    if x.ndim != 2 or x.shape[-1] != 2:
        return x
    left, right = x[:, 0], x[:, 1]
    mid = (left + right) * 0.5
    side = (left - right) * 0.5 * width
    new_left = jnp.clip(mid + side, -1.0, 1.0)
    new_right = jnp.clip(mid - side, -1.0, 1.0)
    return jnp.stack([new_left, new_right], axis=1)


def stereo_width_quality(x: jax.Array, width: jax.Array) -> jax.Array:
    """Quality-mode width: same M/S math WITHOUT the hard clip (headroom is
    preserved for the downstream loudness/limiter stages instead of being
    truncated mid-chain as the reference does at engine:270)."""
    if x.ndim != 2 or x.shape[-1] != 2:
        return x
    left, right = x[:, 0], x[:, 1]
    mid = (left + right) * 0.5
    side = (left - right) * 0.5 * width
    return jnp.stack([mid + side, mid - side], axis=1)
