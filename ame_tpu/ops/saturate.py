"""Analog character: tanh drive + tilt shelves (reference
apply_analog_character, engine:258-266).

    drive = 1 + 0.5 * (percent/100)
    y = tanh(x * drive)
    y = shelf(y, 120 Hz, percent/100 * 1.0 dB, 'low')    (compat blend)
    y = shelf(y, 12 kHz, percent/100 * 1.5 dB, 'high')

In the reference this stage runs on the int16-decoded chunk and re-quantizes
to int16 on exit (engine:261, 266 — quirk Q5); the graph layer inserts the
quantize ops around this in compat mode.

The tanh is pure VPU work; XLA fuses it with the following scan prologue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ame_tpu import config as C
from ame_tpu.ops import eq


def analog_character_compat(x: jax.Array, sample_rate: float,
                            character_percent: jax.Array,
                            chunk_len: int | None = None) -> jax.Array:
    factor = character_percent / 100.0
    drive = 1.0 + factor * 0.5
    y = jnp.tanh(x * drive)
    y = eq.apply_shelf_compat(y, sample_rate, C.ANALOG_LOW_SHELF_HZ,
                              factor * 1.0, "low", chunk_len)
    y = eq.apply_shelf_compat(y, sample_rate, C.ANALOG_HIGH_SHELF_HZ,
                              factor * 1.5, "high", chunk_len)
    return y


def analog_character_quality(x: jax.Array, sample_rate: float,
                             character_percent: jax.Array) -> jax.Array:
    """Quality mode: same voicing intent with true RBJ shelves and
    continuous state (no chunk resets, no int16 round-trip)."""
    from ame_tpu.ops.eq import _rbj_shelf_coeffs_jnp
    from ame_tpu.ops.scan_iir import sosfilt_scan

    factor = character_percent / 100.0
    drive = 1.0 + factor * 0.5
    y = jnp.tanh(x * drive)
    sos = jnp.stack([
        _rbj_shelf_coeffs_jnp(C.ANALOG_LOW_SHELF_HZ, sample_rate,
                              jnp.asarray(factor * 1.0), 0.7071, "low"),
        _rbj_shelf_coeffs_jnp(C.ANALOG_HIGH_SHELF_HZ, sample_rate,
                              jnp.asarray(factor * 1.5), 0.7071, "high"),
    ]).astype(y.dtype)
    y, _ = sosfilt_scan(sos, y)  # one fused cascade scan
    return y
