"""Channel-stacked fleet mastering: B tracks as ONE [N, 2B] signal.

Round-2 finding (ROADMAP "Performance headroom" #4): the vmapped
[B, N, 2] fleet layout made XLA materialize lane-padded temporary copies
of every stage operand, so B=4 batched mastering ran BELOW serial
dispatch. This module lands the proposed fix: tracks are column-stacked
into one [N, 2B] array (track b owns columns 2b, 2b+1), so every filter /
window / scan runs ONCE on a single wide signal in its natural layout —
the same code paths the single-track chain uses, which XLA already
compiles well. Only the stages with per-track (stereo-pair) semantics —
width, detector RMS, loudness gating, true peak, limiter link — get
"track-halved" variants here; everything per-sample or per-column
(saturation, EQ, crossovers) is reused untouched.

Quality chain only (the fleet product path — parallel/fleet.py).

OUTCOME (TPU-measured, round 3): this layout ran 16.4 ms/track at B=4 —
WORSE than both the vmapped [B, N, 2] batch (11.9) and host-serial
single-track dispatches (8.4). The shipped fleet path is therefore
parallel/batch.py's ``lax.map`` of the unmodified single-track program
(4.9 ms/track at B=4, one dispatch per batch); this module is kept as the
documented experiment and for its track-halved stacked kernels
(parity-tested in tests/test_parallel.py).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ame_tpu import config as C
from ame_tpu.dsp import design
from ame_tpu.ops import eq, saturate
from ame_tpu.ops import window as W
from ame_tpu.ops.compressor import biquad_scan
from ame_tpu.ops.loudness import (_power_to_lufs, _tp_tile_matrix, _TP_LB)
from ame_tpu.ops.scan_iir import _ein, sosfilt_scan
from ame_tpu.graph.multiband import quality_band_split
from ame_tpu.graph.chain import params_from_settings


def _pair_sum_sq(x2b):
    """[N, 2B] -> per-track channel-summed square [N, B]."""
    n, c2 = x2b.shape
    sq = x2b * x2b
    return sq.reshape(n, c2 // 2, 2).sum(axis=2)


def _per_pair(g_b, c2):
    """Broadcast a per-track [..., B] gain to [..., 2B] columns."""
    return jnp.repeat(g_b, 2, axis=-1)


def stereo_width_stacked(x2b, width):
    n, c2 = x2b.shape
    p = x2b.reshape(n, c2 // 2, 2)
    mid = (p[:, :, 0] + p[:, :, 1]) * 0.5
    side = (p[:, :, 0] - p[:, :, 1]) * 0.5 * width
    return jnp.stack([mid + side, mid - side], axis=2).reshape(n, c2)


def compress_quality_multi_stacked(bands, sample_rate, thresholds_db,
                                   ratios, attack_ms=5.0, release_ms=50.0,
                                   rms_ms=5.0):
    """G bands of [N, 2B] stacked tracks: detector/release/attack scans run
    once on [N, G*B] (tracks AND bands share the scan passes)."""
    G = len(bands)
    n, c2 = bands[0].shape
    B = c2 // 2
    dt = bands[0].dtype
    rms_w = max(int(rms_ms * sample_rate / 1000.0), 1)

    # [N, G*B]: per-track per-band mean square (channel mean, as the
    # single-track detector's jnp.mean(b*b, axis=1))
    sq = jnp.concatenate([_pair_sum_sq(b) * 0.5 for b in bands], axis=1)
    mean_sq = W.moving_mean_past(sq, rms_w)
    level_db = 10.0 * jnp.log10(jnp.maximum(mean_sq, 1e-12))

    th = jnp.repeat(jnp.asarray(thresholds_db, dt), B).reshape(1, G * B)
    ra = jnp.repeat(jnp.asarray(ratios, dt), B).reshape(1, G * B)
    over = jnp.maximum(level_db - th, 0.0)
    gr_db = over * (1.0 - 1.0 / ra)

    rel_decay = math.exp(-1.0 / (release_ms * sample_rate / 1000.0))
    gr_rel = W.release_scan(gr_db, rel_decay)
    a = math.exp(-1.0 / (attack_ms * sample_rate / 1000.0))
    coeffs = jnp.array([1.0 - a, 0.0, 0.0, 1.0, -a, 0.0], dt)
    gr_smooth, _ = biquad_scan(gr_rel, coeffs)      # [N, G*B]

    gains = 10.0 ** (-gr_smooth / 20.0)
    out = []
    for g in range(G):
        out.append(bands[g] * _per_pair(gains[:, g * B:(g + 1) * B], c2))
    return out


def multiband_quality_stacked(x2b, sample_rate, threshs, ratios):
    low, mid, high = quality_band_split(x2b, sample_rate)
    comp = compress_quality_multi_stacked(
        [low, mid, high], sample_rate,
        [threshs[0], threshs[1], threshs[2]],
        [ratios[0], ratios[1], ratios[2]],
        attack_ms=C.MB_ATTACK_MS, release_ms=C.MB_RELEASE_MS,
        rms_ms=C.MB_RMS_MS)
    return comp[0] + comp[1] + comp[2]


# ---------------------------------------------------------------------------
# Per-track loudness on the stacked layout
# ---------------------------------------------------------------------------

def _block_powers_stacked(y2b, sample_rate, block_s, hop_s):
    """[N, 2B] K-weighted audio -> per-track gating-block powers
    [n_blocks, B] (BS.1770 channel-sum of per-channel mean squares)."""
    n = y2b.shape[0]
    hop = int(round(hop_s * sample_rate))
    steps = int(round(block_s / hop_s))
    n_hops = n // hop
    sq = _pair_sum_sq(y2b)                                  # [N, B]
    hop_sums = sq[: n_hops * hop].reshape(n_hops, hop, -1).sum(axis=1)
    n_blocks = n_hops - steps + 1
    cs = jnp.concatenate([jnp.zeros((1, sq.shape[1]), y2b.dtype),
                          jnp.cumsum(hop_sums, axis=0)])
    return (cs[steps:steps + n_blocks] - cs[:n_blocks]) / (hop * steps)


def measure_stacked(x2b, sample_rate):
    """Per-track (integrated LUFS [B], true peak dB [B]) on [N, 2B]."""
    sos = design.k_weighting_sos(sample_rate)
    y, _ = sosfilt_scan(sos, x2b)
    p = _block_powers_stacked(y, sample_rate, 0.400, 0.100)  # [nb, B]
    l = _power_to_lufs(p)
    abs_m = l > -70.0
    cnt = jnp.maximum(abs_m.sum(axis=0), 1)
    mean_abs = jnp.where(abs_m, p, 0.0).sum(axis=0) / cnt
    rel = _power_to_lufs(mean_abs) - 10.0
    gate = abs_m & (l > rel[None])
    gcnt = jnp.maximum(gate.sum(axis=0), 1)
    gp = jnp.where(gate, p, 0.0).sum(axis=0) / gcnt
    integ = jnp.where(jnp.any(gate, axis=0), _power_to_lufs(gp),
                      -jnp.inf)                              # [B]

    # per-track 4x true peak via the shared tile matmul
    n, c2 = x2b.shape
    Lb = _TP_LB
    nb = -(-n // Lb)
    xp = jnp.pad(x2b, ((Lb, nb * Lb - n), (0, 0)))
    xt = xp.reshape(nb + 1, Lb, c2)
    xcat = jnp.concatenate([xt[:-1], xt[1:]], axis=1)
    M = jnp.asarray(_tp_tile_matrix(), x2b.dtype)
    os4 = _ein("vu,buc->bvc", M, xcat)                       # [nb, 4Lb, 2B]
    pk = jnp.abs(os4).reshape(nb, 4 * Lb, c2 // 2, 2).max(axis=(0, 1, 3))
    pk = jnp.maximum(
        pk, jnp.abs(x2b).reshape(n, c2 // 2, 2).max(axis=(0, 2)))
    tp_db = 20.0 * jnp.log10(jnp.maximum(pk, 1e-12))          # [B]
    return integ, tp_db


def normalize_stacked(x2b, sample_rate, target_lufs):
    """Per-track two-pass linear normalization (quality semantics: clean
    gain; silent tracks pass through — quirk Q9)."""
    integ, tp_db = measure_stacked(x2b, sample_rate)
    gain_db = jnp.asarray(target_lufs, x2b.dtype) - integ
    gain_db = jnp.where(jnp.isfinite(integ), gain_db, 0.0)   # [B]
    return x2b * _per_pair(10.0 ** (gain_db / 20.0), x2b.shape[1])[None]


def limiter_stacked(x2b, sample_rate, ceiling=C.LIMITER_CEILING,
                    attack_ms=C.LIMITER_ATTACK_MS,
                    release_ms=C.LIMITER_RELEASE_MS):
    """Per-track channel-linked lookahead limiting on the stacked layout
    (ops/limiter.lookahead_limiter semantics, one scan pass for all B)."""
    n, c2 = x2b.shape
    attack = max(int(attack_ms * sample_rate / 1000.0), 1)
    decay = math.exp(-1.0 / (release_ms * sample_rate / 1000.0))
    peak = jnp.abs(x2b).reshape(n, c2 // 2, 2).max(axis=2)   # [N, B]
    g_t = jnp.minimum(1.0, ceiling / jnp.maximum(peak, 1e-9))
    g_a = W.sliding_min_ahead(g_t, attack)
    g_r = W.moving_mean_past(g_a, attack)
    u = W.release_scan(1.0 - g_r, decay)
    return x2b * _per_pair(1.0 - u, c2)


# ---------------------------------------------------------------------------
# The stacked batch graph
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _stacked_jit(x2b, p, sample_rate, analog_on, width_on, multiband_on,
                 lufs_on):
    if analog_on:
        x2b = saturate.analog_character_quality(x2b, sample_rate,
                                                p["analog"])
    x2b = eq.apply_eq_quality(x2b, sample_rate, p["bass"], p["mid_cut"],
                              p["presence"], p["treble"])
    if width_on:
        x2b = stereo_width_stacked(x2b, p["width"])
    if multiband_on:
        x2b = multiband_quality_stacked(x2b, sample_rate, p["threshs"],
                                        p["ratios"])
    if lufs_on:
        x2b = normalize_stacked(x2b, sample_rate, p["lufs"])
    return limiter_stacked(x2b, sample_rate)


def master_batch_stacked(xs, sample_rate: float, settings) -> jax.Array:
    """Master B tracks as one channel-stacked program.

    Args:
      xs: [B, N, 2] (stacked on host) or [N, 2B] float32.
    Returns the same shape it was given.
    """
    from ame_tpu.config import MasterSettings
    if isinstance(settings, dict):
        settings = MasterSettings.from_dict(settings)
    if settings.mb_edges is not None:
        raise NotImplementedError("G-band multiband is not implemented for "
                                  "the channel-stacked layout (use "
                                  "parallel.batch.master_batch)")
    p = params_from_settings(settings)
    batched_in = hasattr(xs, "ndim") and xs.ndim == 3
    if batched_in:
        b, n, _ = xs.shape
        # stack on host: the [B, N, 2] -> [N, 2B] transpose is seconds-slow
        # as an XLA relayout but trivial for numpy
        x2b = jnp.asarray(
            np.ascontiguousarray(np.moveaxis(np.asarray(xs), 0, 1)
                                 ).reshape(n, 2 * b))
    else:
        x2b = jnp.asarray(xs)
    y = _stacked_jit(x2b, p, float(sample_rate),
                     settings.analog_character > 0,
                     settings.width != 1.0,
                     bool(settings.multiband),
                     settings.lufs is not None)
    if batched_in:
        return jnp.asarray(np.moveaxis(
            np.asarray(y).reshape(y.shape[0], -1, 2), 1, 0))
    return y
