"""3-band multiband compression stage.

Compat path mirrors the reference wiring (audio_mastering_engine.py:299-309):
subtractive crossover (mid = full - low - high, quirk Q4), per-band int16
quantization (Q5), pydub-semantics compression, saturating ``overlay`` adds
(Q7). Quality path uses Linkwitz-Riley flat-sum crossovers and the
all-associative quality compressor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ame_tpu import config as C
from ame_tpu.dsp import design
from ame_tpu.ops import compressor, quantize
from ame_tpu.ops.scan_iir import sosfilt_scan, sosfilt_chunked


def _crossover_compat(x, sample_rate, chunk_len=None):
    low_sos = design.butter_sos(4, C.MB_LOW_CROSSOVER_HZ, "lowpass",
                                fs=sample_rate)
    high_sos = design.butter_sos(4, C.MB_HIGH_CROSSOVER_HZ, "highpass",
                                 fs=sample_rate)
    if chunk_len is None:
        from ame_tpu.ops.scan_iir import _route_tileconv
        if _route_tileconv(x):
            # both crossover filters share the input: one fused MXU pass
            from ame_tpu.ops.tile_conv import sosfilt_tileconv_bank
            low, high = sosfilt_tileconv_bank([low_sos, high_sos], x)
        else:
            low, _ = sosfilt_scan(low_sos, x)
            high, _ = sosfilt_scan(high_sos, x)
    else:
        low = sosfilt_chunked(low_sos, x, chunk_len)
        high = sosfilt_chunked(high_sos, x, chunk_len)
    mid = x - low - high  # quirk Q4: phase-imperfect subtractive crossover
    return low, mid, high


def _compress_band(band_float, sample_rate, thresh, ratio, exact, chunk_len):
    """Quantize to int16 (Q5) then pydub-compress; returns int16-valued.
    Only the fast (clamp-approximation) path routes here — exact goes
    through the batched multi-band entry points above this call site."""
    band_int = quantize.float_to_int16(band_float)
    if exact:
        fn = partial(compressor.pydub_compress_exact,
                     force_scan=chunk_len is not None)
    else:
        fn = compressor.pydub_compress_fast
    if chunk_len is None:
        return fn(band_int, sample_rate, thresh, ratio)
    n = band_int.shape[0]
    nc = -(-n // chunk_len)
    pad = nc * chunk_len - n
    bi = jnp.pad(band_int, ((0, pad), (0, 0)))
    bi = bi.reshape(nc, chunk_len, band_int.shape[1])
    out = jax.vmap(lambda xb: fn(xb, sample_rate, thresh, ratio))(bi)
    return out.reshape(nc * chunk_len, band_int.shape[1])[:n]


def multiband_compat(x: jax.Array, sample_rate: float, threshs: jax.Array,
                     ratios: jax.Array, exact: bool = True,
                     chunk_len: int | None = None) -> jax.Array:
    """x: [N, 2] float (int16-grid values, as the reference receives from an
    AudioSegment). Returns float in int16 grid (value/32768)."""
    low, mid, high = _crossover_compat(x, sample_rate, chunk_len)
    if exact:
        # one batched gain pass for all 3 bands (exact at any length);
        # chunked mode resets detector + gain state at chunk boundaries
        band_ints = [quantize.float_to_int16(b) for b in (low, mid, high)]
        ths = [threshs[0], threshs[1], threshs[2]]
        ras = [ratios[0], ratios[1], ratios[2]]
        if chunk_len is None:
            outs = compressor.pydub_compress_exact_multi(
                band_ints, sample_rate, ths, ras)
        else:
            outs = compressor.pydub_compress_exact_multi_chunked(
                band_ints, sample_rate, ths, ras, chunk_len)
    else:
        outs = []
        for i, band in enumerate((low, mid, high)):
            outs.append(_compress_band(band, sample_rate, threshs[i],
                                       ratios[i], exact, chunk_len))
    acc = quantize.saturating_add_int16(outs[0], outs[1])
    acc = quantize.saturating_add_int16(acc, outs[2])  # quirk Q7
    return acc * (1.0 / 32768.0)


def quality_band_split(x: jax.Array, sample_rate: float):
    """Linkwitz-Riley LR4 crossover split: [N, C] -> (low, mid, high),
    flat magnitude sum (fixes Q4). Differentiable in x."""
    import numpy as np

    lo_sos = design.linkwitz_riley_sos(4, C.MB_LOW_CROSSOVER_HZ, "lowpass",
                                       sample_rate)
    lo_hp = design.linkwitz_riley_sos(4, C.MB_LOW_CROSSOVER_HZ, "highpass",
                                      sample_rate)
    hi_sos = design.linkwitz_riley_sos(4, C.MB_HIGH_CROSSOVER_HZ, "highpass",
                                       sample_rate)
    hi_lp = design.linkwitz_riley_sos(4, C.MB_HIGH_CROSSOVER_HZ, "lowpass",
                                      sample_rate)
    from ame_tpu.ops.scan_iir import _route_tileconv
    if _route_tileconv(x):
        # all three bands as cascades straight off x (mid = LP4k∘HP250,
        # high = HP4k∘HP250 — cascade composition is exact), fused into
        # ONE MXU pass: 4 sequential scans become one bank call
        from ame_tpu.ops.tile_conv import sosfilt_tileconv_bank
        low, mid, high = sosfilt_tileconv_bank(
            [lo_sos, np.concatenate([lo_hp, hi_lp]),
             np.concatenate([lo_hp, hi_sos])], x)
    else:
        low, _ = sosfilt_scan(lo_sos, x)
        rest, _ = sosfilt_scan(lo_hp, x)
        high, _ = sosfilt_scan(hi_sos, rest)
        mid, _ = sosfilt_scan(hi_lp, rest)
    return low, mid, high


def _band_cascades_n(sample_rate: float, edges: tuple):
    """Per-band SOS cascades straight off x for a G = len(edges)+1 way
    Linkwitz-Riley LR4 crossover tree (left-to-right splits): band g is
    LP(e_g) composed with the highpasses of every edge below it, PLUS the
    LR4 allpasses of every edge ABOVE it (phase compensation — band g
    never passes through the higher splits, whose LP+HP sum is an
    allpass, so without A(e_{g+1})..A(e_last) the tree sum is not flat:
    measured -4.4 dB dips at G=8). With compensation the recombined sum
    is magnitude-flat to f32 rounding at any G. The top band is the pure
    highpass cascade."""
    import numpy as np

    cascades, prefix = [], []
    for i, e in enumerate(edges):
        lp = design.linkwitz_riley_sos(4, float(e), "lowpass", sample_rate)
        comp = [design.lr4_allpass_sos(float(e2), sample_rate)
                for e2 in edges[i + 1:]]
        cascades.append(np.concatenate(prefix + [lp] + comp))
        prefix = prefix + [design.linkwitz_riley_sos(4, float(e), "highpass",
                                                     sample_rate)]
    cascades.append(np.concatenate(prefix))
    return cascades


def quality_band_split_n(x: jax.Array, sample_rate: float, edges: tuple):
    """[N, C] -> list of G = len(edges)+1 bands (LR4 tree crossover with
    allpass phase compensation: the sum of the returned bands is
    magnitude-flat at any G). The generalization of ``quality_band_split``
    to any band count; each band is one cascade off x, so the split is a
    single fused MXU bank pass when the tile-conv engine routes."""
    cascades = _band_cascades_n(sample_rate, tuple(edges))
    from ame_tpu.ops.scan_iir import _route_tileconv
    if _route_tileconv(x):
        from ame_tpu.ops.tile_conv import sosfilt_tileconv_bank
        return list(sosfilt_tileconv_bank(cascades, x))
    return [sosfilt_scan(c, x)[0] for c in cascades]


def multiband_quality_n(x: jax.Array, sample_rate: float, edges, threshs,
                        ratios, attack_ms: float = 5.0,
                        release_ms: float = 50.0) -> jax.Array:
    """G-band quality multiband compression (G = len(edges)+1): the N-band
    generalization of the reference's fixed 3-band stage
    (audio_mastering_engine.py:299-309). ``threshs``/``ratios`` are
    per-band (length G, traced). Bands recombine by flat sum."""
    bands = quality_band_split_n(x, sample_rate, tuple(edges))
    comp = compressor.compress_quality_multi(
        bands, sample_rate, [threshs[g] for g in range(len(bands))],
        [ratios[g] for g in range(len(bands))],
        attack_ms=attack_ms, release_ms=release_ms)
    out = comp[0]
    for b in comp[1:]:
        out = out + b
    return out


def multiband_quality(x: jax.Array, sample_rate: float, threshs, ratios,
                      attack_ms: float = 5.0,
                      release_ms: float = 50.0) -> jax.Array:
    """Linkwitz-Riley LR4 crossover (flat magnitude sum — fixes Q4), f32
    throughout (fixes Q5/Q7), quality compressor per band."""
    low, mid, high = quality_band_split(x, sample_rate)
    # one stacked gain pipeline for all three bands (detector + release +
    # attack scans run once on [N, 3] instead of three times)
    comp = compressor.compress_quality_multi(
        [low, mid, high], sample_rate,
        [threshs[0], threshs[1], threshs[2]],
        [ratios[0], ratios[1], ratios[2]],
        attack_ms=attack_ms, release_ms=release_ms)
    return comp[0] + comp[1] + comp[2]
