"""EQ stage kernels: shelf/peak *blend* math over scan-IIR filter cores.

The reference's EQ is unusual (SURVEY.md C7/C8, quirks Q1/Q2): a "shelf" is a
Butterworth LP/HP blended with the dry signal —

    gain_db > 0:  y = x + (lp(x) - x) * (g - 1)          (engine:288)
    gain_db < 0:  y = x*g + (lp(x) - x*g)  ==  lp(x)     (engine:289, Q1)

and a "peak" is an order-4 Butterworth bandpass mixed back in:

    y = x + bp(x) * (g - 1)                              (engine:298)

Compat mode reproduces these formulas exactly (including the negative-gain
collapse). Quality mode uses true RBJ shelving/peaking biquads instead.

Everything here is pure elementwise math around ``sosfilt_scan`` — XLA fuses
the blends into the scan's epilogue, so each band costs one scan pass.

Note on gain==0: the reference skips the filter entirely when gain_db == 0
(engine:284, 291). The blend formulas are *exactly* identity at g == 1
(x + (y-x)*0 == x in float), so compat mode can keep a fixed traced graph
with dynamic gains and still match the reference bit-wise at gain 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ame_tpu.dsp import design
from ame_tpu.ops.scan_iir import sosfilt_scan, sosfilt_chunked


def _run_sos(sos, x, chunk_len=None):
    if chunk_len is None:
        y, _ = sosfilt_scan(sos, x)
        return y
    return sosfilt_chunked(sos, x, chunk_len)


def shelf_blend_compat(x: jax.Array, filtered: jax.Array,
                       gain_db: jax.Array) -> jax.Array:
    """The reference shelf blend (engine:287-289), branch-free.

    gain_db is a traced scalar; the two branches are combined with where()
    so one compiled graph serves all gains (including the Q1 collapse to the
    raw filtered signal for negative gains, and exact identity at 0).
    """
    gain = 10.0 ** (gain_db / 20.0)
    pos = x + (filtered - x) * (gain - 1.0)
    neg = filtered  # x*g + (y - x*g) == y, quirk Q1 kept verbatim
    return jnp.where(gain_db > 0, pos, jnp.where(gain_db < 0, neg, x))


def peak_blend_compat(x: jax.Array, band: jax.Array,
                      gain_db: jax.Array) -> jax.Array:
    """The reference peak blend (engine:297-298): x + band*(g-1)."""
    gain = 10.0 ** (gain_db / 20.0)
    return x + band * (gain - 1.0)


def apply_shelf_compat(x: jax.Array, sample_rate: float, cutoff_hz: float,
                       gain_db: jax.Array, filter_type: str,
                       chunk_len: int | None = None) -> jax.Array:
    """Reference apply_shelf_filter (engine:283-289): order-2 Butterworth
    LP/HP core + compat blend. The normalized cutoff is clamped below
    Nyquist (the reference would crash in scipy at sample rates where a
    shelf frequency reaches Nyquist; the fixed-graph design must stay
    constructible even when that band's gain is 0).

    gain_db == 0 is an exact no-op in the reference (engine:284 returns
    the input before filtering), and the blend here reproduces that — so
    the whole filter runs under an on-device lax.cond and zero-gain
    stages cost one predicate instead of a biquad pass over the track.
    One compiled graph still serves every gain (under vmap the cond
    lowers to a select and both branches run, exactly as before)."""
    cutoff_norm = min(cutoff_hz / (0.5 * sample_rate), 0.999999)
    b, a = design.butter_ba(2, cutoff_norm, filter_type)
    sos = design.ba_to_sos_biquad(b, a)

    def run(x):
        return shelf_blend_compat(x, _run_sos(sos, x, chunk_len), gain_db)

    return jax.lax.cond(jnp.asarray(gain_db) == 0.0, lambda v: v, run, x)


def apply_peak_compat(x: jax.Array, sample_rate: float, center_hz: float,
                      gain_db: jax.Array, q: float = 1.41,
                      chunk_len: int | None = None) -> jax.Array:
    """Reference apply_peak_filter (engine:290-298): order-4 bandpass core
    (edge clamps Q14) + additive blend. gain_db == 0 skips the bandpass
    at runtime (engine:291 no-op quirk — the blend is exact identity
    there), same lax.cond scheme as apply_shelf_compat."""
    sos = design.reference_peak_band_sos(sample_rate, center_hz, q)

    def run(x):
        return peak_blend_compat(x, _run_sos(sos, x, chunk_len), gain_db)

    return jax.lax.cond(jnp.asarray(gain_db) == 0.0, lambda v: v, run, x)


def apply_eq_compat(x: jax.Array, sample_rate: float, bass_db, mid_cut_db,
                    presence_db, treble_db,
                    chunk_len: int | None = None) -> jax.Array:
    """The reference 4-band chain (engine:277-281): low shelf 250 Hz ->
    peak 1 kHz (mid_cut NEGATED, quirk Q3) -> peak 4 kHz -> high shelf 8 kHz.

    The reference loops channels and filters each independently
    (engine:273-274); coefficients are channel-independent, so both channels
    ride one scan here.
    """
    from ame_tpu import config as C
    x = apply_shelf_compat(x, sample_rate, C.BASS_SHELF_HZ, bass_db, "low",
                           chunk_len)
    x = apply_peak_compat(x, sample_rate, C.MID_PEAK_HZ, -mid_cut_db,
                          C.PEAK_Q, chunk_len)
    x = apply_peak_compat(x, sample_rate, C.PRESENCE_PEAK_HZ, presence_db,
                          C.PEAK_Q, chunk_len)
    x = apply_shelf_compat(x, sample_rate, C.TREBLE_SHELF_HZ, treble_db,
                           "high", chunk_len)
    return x


# ---------------------------------------------------------------------------
# Quality mode: true shelving / peaking EQ
# ---------------------------------------------------------------------------

def _rbj_shelf_coeffs_jnp(f0, fs, gain_db, q, kind):
    """RBJ low/high shelf with *traced* gain (closed-form in jnp, f32)."""
    A = 10.0 ** (gain_db / 40.0)
    w0 = 2.0 * np.pi * f0 / fs
    cw = np.cos(w0)
    alpha = np.sin(w0) / (2.0 * q)
    sa = 2.0 * jnp.sqrt(A) * alpha
    if kind == "high":
        b0 = A * ((A + 1) + (A - 1) * cw + sa)
        b1 = -2 * A * ((A - 1) + (A + 1) * cw)
        b2 = A * ((A + 1) + (A - 1) * cw - sa)
        a0 = (A + 1) - (A - 1) * cw + sa
        a1 = 2 * ((A - 1) - (A + 1) * cw)
        a2 = (A + 1) - (A - 1) * cw - sa
    else:
        b0 = A * ((A + 1) - (A - 1) * cw + sa)
        b1 = 2 * A * ((A - 1) - (A + 1) * cw)
        b2 = A * ((A + 1) - (A - 1) * cw - sa)
        a0 = (A + 1) + (A - 1) * cw + sa
        a1 = -2 * ((A - 1) + (A + 1) * cw)
        a2 = (A + 1) + (A - 1) * cw - sa
    return jnp.stack([b0 / a0, b1 / a0, b2 / a0,
                      jnp.ones_like(a0), a1 / a0, a2 / a0])


def _rbj_peaking_coeffs_jnp(f0, fs, gain_db, q):
    A = 10.0 ** (gain_db / 40.0)
    w0 = 2.0 * np.pi * f0 / fs
    cw = np.cos(w0)
    alpha = np.sin(w0) / (2.0 * q)
    b0 = 1 + alpha * A
    b1 = -2 * cw * jnp.ones_like(A)
    b2 = 1 - alpha * A
    a0 = 1 + alpha / A
    a1 = b1
    a2 = 1 - alpha / A
    return jnp.stack([b0 / a0, b1 / a0, b2 / a0,
                      jnp.ones_like(a0), a1 / a0, a2 / a0])


def apply_eq_quality(x: jax.Array, sample_rate: float, bass_db, mid_cut_db,
                     presence_db, treble_db, peak_q: float = 1.41) -> jax.Array:
    """Product-grade 4-band EQ: true RBJ low shelf 250 Hz, peaking 1 kHz
    (cut), peaking 4 kHz, high shelf 8 kHz. Gains are traced scalars — the
    coefficients are computed in-graph, so one compile serves all settings.
    The four biquads run as ONE fused cascade scan."""
    from ame_tpu import config as C
    from ame_tpu.ops.scan_iir import sosfilt_scan

    sos = jnp.stack([
        _rbj_shelf_coeffs_jnp(C.BASS_SHELF_HZ, sample_rate,
                              jnp.asarray(bass_db), 0.7071, "low"),
        _rbj_peaking_coeffs_jnp(C.MID_PEAK_HZ, sample_rate,
                                -jnp.asarray(mid_cut_db), peak_q),
        _rbj_peaking_coeffs_jnp(C.PRESENCE_PEAK_HZ, sample_rate,
                                jnp.asarray(presence_db), peak_q),
        _rbj_shelf_coeffs_jnp(C.TREBLE_SHELF_HZ, sample_rate,
                              jnp.asarray(treble_db), 0.7071, "high"),
    ]).astype(x.dtype)
    y, _ = sosfilt_scan(sos, x)
    return y
