"""Sample-rate conversion on device (part of N9 — librosa/soxr's role).

Windowed-sinc interpolation evaluated directly at output positions: for each
output sample, gather ``taps`` neighboring input samples and dot with
sinc×Kaiser weights computed in-graph from the fractional offset. Fully
general ratios (44.1k->22.05k for the Musicologist, 192k oversampling, ...),
one gather + one small matvec per output sample — batched into [n_out, taps]
matmuls that XLA maps to the MXU.

Output positions use an exact INTEGER-PHASE decomposition computed on the
host: with rates as a reduced fraction num/den, output sample m sits at
input position (m*num) // den + ((m*num) % den) / den. int64 arithmetic is
exact for any track length, so there is no cumulative phase drift — the
earlier float32 position accumulation drifted ~0.1 sample by minute 5
(round-1 ROADMAP item 9) and emitted x64-truncation warnings.

Not a bit-match of librosa's default soxr_hq resampler (different window
design); the Musicologist's buckets are coarse (SURVEY.md C13), and parity
there is behavioral, not bitwise.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(3, 4, 5))
def _resample_jit(x, base, frac, taps, beta, cutoff):
    """x: [N] or [N, C]; base [n_out] int32 / frac [n_out] f32: exact
    integer-phase positions (output m sits at input base[m] + frac[m])."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n_in = x.shape[0]
    half = taps // 2

    k = jnp.arange(-half + 1, half + 1, dtype=jnp.int32)  # [taps]
    idx = base[:, None] + k[None, :]
    idx_c = jnp.clip(idx, 0, n_in - 1)
    valid = (idx >= 0) & (idx < n_in)

    # sinc lowpass at the lower of the two Nyquists, Kaiser window
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


def _positions(n_out: int, in_rate: float, out_rate: float):
    """Exact integer-phase output positions (host, int64 — no drift)."""
    # reduce in/out to an integer fraction; float rates are scaled first
    # (audio rates are integers in practice; 1e6 covers e.g. 44.1 exactly)
    num = int(round(in_rate * 1_000_000))
    den = int(round(out_rate * 1_000_000))
    g = math.gcd(num, den)
    num //= g
    den //= g
    m = np.arange(n_out, dtype=np.int64) * num
    base = (m // den).astype(np.int32)
    frac = ((m % den).astype(np.float64) / den).astype(np.float32)
    return base, frac


def resample(x: jax.Array, in_rate: float, out_rate: float,
             taps: int = 64, beta: float = 8.6) -> jax.Array:
    """Resample along axis 0. Returns floor(N * out/in) samples.

    ``taps`` is the kernel length at the LOWER of the two rates; when
    downsampling it is scaled by in/out so the anti-alias transition band
    stays proportional to the output Nyquist. Without this a 44.1k->16k
    conversion left a 9 kHz tone only ~25 dB down (ffmpeg aresample: ~62 dB
    — measured via the golden harness, tests/test_golden_ffmpeg.py); with
    it both sit at ~60+ dB."""
    if in_rate == out_rate:
        return x
    n_out = int(x.shape[0] * out_rate / in_rate)
    base, frac = _positions(n_out, float(in_rate), float(out_rate))
    cutoff = min(1.0, float(out_rate) / float(in_rate))
    if cutoff < 1.0:
        taps = int(math.ceil(taps / cutoff / 8.0)) * 8
    return _resample_jit(x, jnp.asarray(base), jnp.asarray(frac),
                         int(taps), float(beta), cutoff)
