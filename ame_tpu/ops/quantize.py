"""int16 round-trip compat ops (quirk Q5).

Every L2<->pydub boundary in the reference re-quantizes to int16:
  float -> int16:  trunc(clip(x, -1, 1) * 32767)        (engine:255-256)
  int16 -> float:  i / 32768                            (engine:253, width=2)
Note the asymmetry (*32767 on the way in, /32768 on the way out) and the
truncation toward zero (numpy astype(int16) semantics). Compat mode inserts
``int16_roundtrip`` at each stage boundary; quality mode stays f32 end-to-end.

Also here: the saturating int16 add used by pydub's ``overlay`` when the
reference recombines compressor bands (engine:309, quirk Q7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flatwise(f, *arrays):
    """Apply an elementwise fn in [., 128] layout.

    Audio rides as [N, 2]; TPU tiles the last dim onto 128 vector lanes,
    so [N, 2] elementwise work runs at 2/128 lane occupancy (measured
    ~12x slower than flat at 2^23 samples). The row-major reshape to
    [N*2/128, 128] is a free bitcast (same bytes, same order), so pure
    elementwise stages compute at full lane width and reshape back.
    Only safe for PURE elementwise fns (no axis semantics)."""
    n = arrays[0].size
    if n % 128 != 0 or any(a.shape != arrays[0].shape for a in arrays):
        return f(*arrays)
    shape = arrays[0].shape
    flat = [a.reshape(-1, 128) for a in arrays]
    return f(*flat).reshape(shape)


def float_to_int16(x: jax.Array) -> jax.Array:
    """trunc(clip(x)*32767) as float32-held integer values."""
    return _flatwise(
        lambda v: jnp.trunc(jnp.clip(v, -1.0, 1.0) * 32767.0), x)


def int16_to_float(i: jax.Array) -> jax.Array:
    return i * (1.0 / 32768.0)


def int16_roundtrip(x: jax.Array) -> jax.Array:
    """The exact quantization the reference injects between stages."""
    return _flatwise(
        lambda v: jnp.trunc(jnp.clip(v, -1.0, 1.0) * 32767.0)
        * (1.0 / 32768.0), x)


def saturating_add_int16(a: jax.Array, b: jax.Array) -> jax.Array:
    """audioop.add semantics on int16-valued floats: sum clamped to
    [-32768, 32767]."""
    return _flatwise(
        lambda u, v: jnp.clip(u + v, -32768.0, 32767.0), a, b)
