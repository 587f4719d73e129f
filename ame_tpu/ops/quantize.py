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


def float_to_int16(x: jax.Array) -> jax.Array:
    """trunc(clip(x)*32767) as float32-held integer values."""
    return jnp.trunc(jnp.clip(x, -1.0, 1.0) * 32767.0)


def int16_to_float(i: jax.Array) -> jax.Array:
    return i * (1.0 / 32768.0)


def int16_roundtrip(x: jax.Array) -> jax.Array:
    """The exact quantization the reference injects between stages."""
    return float_to_int16(x) * (1.0 / 32768.0)


def saturating_add_int16(a: jax.Array, b: jax.Array) -> jax.Array:
    """audioop.add semantics on int16-valued floats: sum clamped to
    [-32768, 32767]."""
    return jnp.clip(a + b, -32768.0, 32767.0)
