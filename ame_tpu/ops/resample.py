"""Sample-rate conversion on device (part of N9 — librosa/soxr's role).

Windowed-sinc interpolation evaluated directly at output positions: for each
output sample, gather ``taps`` neighboring input samples and dot with
sinc×Kaiser weights computed in-graph from the fractional offset. Fully
general ratios (44.1k->22.05k for the Musicologist, 192k oversampling, ...),
one gather + one small matvec per output sample — batched into [n_out, taps]
matmuls that XLA maps to the MXU.

Not a bit-match of librosa's default soxr_hq resampler (different window
design); the Musicologist's buckets are coarse (SURVEY.md C13), and parity
there is behavioral, not bitwise.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _resample_jit(x, n_out, ratio, taps, beta):
    """x: [N] or [N, C]; ratio = in_rate / out_rate."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n_in = x.shape[0]
    half = taps // 2
    # output m maps to input position m * ratio
    pos = jnp.arange(n_out, dtype=jnp.float64) * ratio
    base = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - base).astype(jnp.float32)

    k = jnp.arange(-half + 1, half + 1, dtype=jnp.int32)  # [taps]
    idx = base[:, None] + k[None, :]
    idx_c = jnp.clip(idx, 0, n_in - 1)
    valid = (idx >= 0) & (idx < n_in)

    # sinc lowpass at the lower of the two Nyquists, Kaiser window
    cutoff = min(1.0, 1.0 / ratio)
    t = k[None, :].astype(jnp.float32) - frac[:, None]  # [n_out, taps]
    w_sinc = cutoff * jnp.sinc(cutoff * t)
    # Kaiser window in-graph: i0(beta*sqrt(1-(t/half)^2)) / i0(beta)
    tw = jnp.clip(t / half, -1.0, 1.0)
    win = jax.scipy.special.i0(beta * jnp.sqrt(1.0 - tw * tw)) / \
        jax.scipy.special.i0(jnp.asarray(beta, jnp.float32))
    w = jnp.where(valid, w_sinc * win, 0.0)

    gathered = x[idx_c]                      # [n_out, taps, C]
    y = jnp.einsum("ot,otc->oc", w, gathered,
                   precision=jax.lax.Precision.HIGHEST)
    return y[:, 0] if squeeze else y


def resample(x: jax.Array, in_rate: float, out_rate: float,
             taps: int = 64, beta: float = 8.6) -> jax.Array:
    """Resample along axis 0. Returns floor(N * out/in) samples."""
    if in_rate == out_rate:
        return x
    n_out = int(x.shape[0] * out_rate / in_rate)
    return _resample_jit(x, n_out, float(in_rate) / float(out_rate),
                         int(taps), float(beta))
