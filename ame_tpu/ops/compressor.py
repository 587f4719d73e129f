"""Dynamic-range compression kernels.

Replaces pydub ``compress_dynamic_range`` + the reference's 3-band wiring
(audio_mastering_engine.py:299-309 — SURVEY.md C10/N7). Three device paths:

1. ``pydub_compress_exact`` — bit-faithful pydub semantics, including its
   quirks, at ANY track length. The detector (windowed integer RMS) is
   fully parallel; the 1-D gain recurrence runs through ops/pydub_gain's
   two-pass exact TPU kernel (sequential SMEM walk + parallel block
   re-run; lax.scan for short inputs / CPU). This is compat mode's
   default compressor. ``pydub_compress_exact_multi`` batches the three
   bands into one gain-kernel pass.

2. ``pydub_compress_fast`` — same detector, with the gain recurrence
   recast as an associative scan over *clamped-accumulator* maps
   f(g) = clip(g + d, lo, hi), which compose closed-form. Approximation:
   when max-attenuation dips below the current attenuation while the
   detector is still above threshold, pydub walks down at the release rate
   but the clamp snaps immediately — and because pydub FREEZES attenuation
   once the signal falls below threshold, a snap near the last
   above-threshold sample persists into the tail. Measured on program
   material: mean error ~0.05 dB, worst-case tail offset a few dB
   (tests/test_compressor.py). Compat mode therefore defaults to the exact
   path; the fast path is for throughput-first use.

3. ``compress_quality`` — the product-grade compressor: windowed-RMS level
   in dB, threshold/ratio gain computer, smooth decoupled peak detector
   (release = (×,max)-semiring scan, attack = one-pole biquad scan). All
   stages associative — O(log N) depth, no sequential loop.

pydub semantics notes (derived from pydub 0.25 effects.compress_dynamic_range
behavior; pydub is not installed here, so the numpy oracle in
tests/oracles.py encodes the same spec):
  * detector RMS is the *integer* audioop rms over the previous
    ``attack_ms`` worth of frames, both channels interleaved, window
    exclusive of the current frame; empty window (first frames) -> rms 0.
  * thresh_rms = 32768 * 10^(threshold_db/20).
  * max_attenuation_db = (1 - 1/ratio) * max(0, 20*log10(rms/thresh_rms)).
  * per-sample: if rms > thresh and att <= max_att:
        att = min(att + max_att/attack_frames, max_att)
    else:
        att = max(att - max_att/release_frames, 0)
    — note: when rms <= thresh, max_att is 0, so the decrement is 0 and the
    attenuation FREEZES (pydub never releases below-threshold; kept
    verbatim in compat).
  * output sample = trunc(int_sample * 10^(-att/20)) with int16 saturation,
    applied only when att != 0.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ame_tpu.ops import window as W
from ame_tpu.ops.scan_iir import biquad_scan


# ---------------------------------------------------------------------------
# Shared detector
# ---------------------------------------------------------------------------

def _detector_from_wsum(wsum, count: float, idx_ge_look, threshold_db,
                        ratio):
    """The pydub detector math downstream of the window sum — shared by
    the single-chip detector and the sequence-parallel one (which builds
    ``wsum`` from a haloed shard-local window and ``idx_ge_look`` from
    GLOBAL sample indices). Returns (rms, max_att_db, thresh_rms)."""
    # audioop.rms floors to int
    rms = jnp.floor(jnp.sqrt(jnp.maximum(wsum, 0.0) / count))
    rms = jnp.where(idx_ge_look, rms, 0.0)
    thresh_rms = 32768.0 * 10.0 ** (jnp.asarray(threshold_db) / 20.0)
    db_over = jnp.where(
        rms > 0,
        jnp.maximum(20.0 * jnp.log10(jnp.maximum(rms, 1e-9) / thresh_rms),
                    0.0),
        0.0)
    max_att = (1.0 - 1.0 / jnp.asarray(ratio)) * db_over
    return rms, max_att, thresh_rms


@partial(jax.jit, static_argnums=(1, 4))
def pydub_detector(x_int: jax.Array, sample_rate: float, threshold_db,
                   ratio, attack_ms: float = 5.0):
    """Per-frame integer RMS + max-attenuation, pydub conventions.

    x_int: [N, C] int16-valued float32 (output of quantize.float_to_int16).
    Returns (rms, max_att_db, thresh_rms): all [N] float32.
    """
    n, c = x_int.shape
    look = int(int(attack_ms * sample_rate / 1000.0))  # int(frame_count)
    sq = jnp.sum(x_int * x_int, axis=1)  # per-frame sum over channels
    if look > 0:
        wsum = W.windowed_sum_exclusive(sq, look)
    else:
        wsum = jnp.zeros_like(sq)
    count = float(max(look, 1) * c)
    return _detector_from_wsum(wsum, count, jnp.arange(n) >= look,
                               threshold_db, ratio)


@jax.jit
def _apply_attenuation_int(x_int: jax.Array, att_db: jax.Array) -> jax.Array:
    """audioop.mul semantics: scale int16 samples, truncate toward zero,
    saturate. att == 0 exactly -> bit-identical passthrough."""
    factor = 10.0 ** (-att_db / 20.0)
    scaled = jnp.trunc(x_int * factor[:, None])
    scaled = jnp.clip(scaled, -32768.0, 32767.0)
    return jnp.where((att_db == 0.0)[:, None], x_int, scaled)


# ---------------------------------------------------------------------------
# 1. Exact path (any length — ops/pydub_gain two-pass kernel on TPU)
# ---------------------------------------------------------------------------
# The branchy recurrence folds to a pure function of max_att because
# max_att == 0 exactly whenever rms <= thresh (the release decrement is then
# 0, reproducing pydub's below-threshold freeze) — see ops/pydub_gain.

def pydub_compress_exact(x_int: jax.Array, sample_rate: float, threshold_db,
                         ratio, attack_ms: float = 5.0,
                         release_ms: float = 50.0,
                         force_scan: bool = False) -> jax.Array:
    from ame_tpu.ops.pydub_gain import pydub_gain_multi
    _, max_att, _ = pydub_detector(
        x_int, sample_rate, threshold_db, ratio, attack_ms)
    (att,) = pydub_gain_multi([max_att], attack_ms * sample_rate / 1000.0,
                              release_ms * sample_rate / 1000.0,
                              force_scan=force_scan)
    return _apply_attenuation_int(x_int, att)


def pydub_compress_exact_multi_chunked(bands, sample_rate: float, threshs,
                                       ratios, chunk_len: int,
                                       attack_ms: float = 5.0,
                                       release_ms: float = 50.0,
                                       force_scan: bool = False):
    """Chunked-compat exact compression (quirk Q6): both the detector
    window AND the gain state reset at every ``chunk_len`` boundary, as a
    fresh per-chunk pydub call would. The detector vmaps over chunk rows
    (fully parallel); the gain runs through pydub_gain's reset-aware
    two-pass kernel — the old vmapped 1.3M-step lax.scan cost seconds on
    TPU."""
    from ame_tpu.ops.pydub_gain import pydub_gain_chunked
    n = bands[0].shape[0]
    c = bands[0].shape[1]
    nc = -(-n // chunk_len)
    ms = []
    for i, band in enumerate(bands):
        bi = jnp.pad(band, ((0, nc * chunk_len - n), (0, 0)))
        bi = bi.reshape(nc, chunk_len, c)
        det = jax.vmap(lambda xb, t=threshs[i], r=ratios[i]: pydub_detector(
            xb, sample_rate, t, r, attack_ms)[1])(bi)
        ms.append(det.reshape(-1)[:n])
    atts = pydub_gain_chunked(ms, attack_ms * sample_rate / 1000.0,
                              release_ms * sample_rate / 1000.0, chunk_len,
                              force_scan=force_scan)
    return [_apply_attenuation_int(bands[g], atts[g])
            for g in range(len(bands))]


def pydub_compress_exact_multi(bands, sample_rate: float, threshs, ratios,
                               attack_ms: float = 5.0,
                               release_ms: float = 50.0):
    """Compress G bands exactly in ONE gain-kernel pass: the sequential
    pass-1 walk interleaves the G independent chains, so 3 bands cost the
    wall time of 1 (ops/pydub_gain). bands: list of [N, C]; returns list."""
    from ame_tpu.ops.pydub_gain import pydub_gain_multi
    ms = []
    for i, band in enumerate(bands):
        _, max_att, _ = pydub_detector(band, sample_rate, threshs[i],
                                       ratios[i], attack_ms)
        ms.append(max_att)
    atts = pydub_gain_multi(ms, attack_ms * sample_rate / 1000.0,
                            release_ms * sample_rate / 1000.0)
    return [_apply_attenuation_int(bands[g], atts[g])
            for g in range(len(bands))]


# ---------------------------------------------------------------------------
# 2. Fast associative path (clamped-accumulator algebra)
# ---------------------------------------------------------------------------

def _clip_combine(e1, e2):
    """Compose f1 then f2 where f(g) = min(hi, max(lo, g + d)), lo <= hi.

    f2(f1(g)) = min(hi', max(lo', g + d1 + d2)) with
      hi' = min(h2, max(l2, h1 + d2))   (= median(l2, h1+d2, h2))
      lo' = max(l2, l1 + d2), re-clamped to hi' so a degenerate
            composition (lo > hi == constant function) stays canonical.
    Exact function composition -> associative."""
    d1, lo1, hi1 = e1
    d2, lo2, hi2 = e2
    d = d1 + d2
    hi = jnp.minimum(hi2, jnp.maximum(lo2, hi1 + d2))
    lo = jnp.minimum(jnp.maximum(lo2, lo1 + d2), hi)
    return d, lo, hi


@jax.jit
def _pydub_gain_fast(above, max_att, attack_frames, release_frames):
    inc = max_att / attack_frames
    dec = max_att / release_frames
    # attacking step: clip(g + inc, 0, m); releasing step: clip(g - dec, 0, inf)
    d = jnp.where(above, inc, -dec)
    lo = jnp.zeros_like(max_att)
    hi = jnp.where(above, max_att, jnp.inf)

    # blocked Kogge-Stone over the clip-map semigroup (identity = (0,-inf,inf))
    n = d.shape[0]
    L = 1 << min(16, max(n - 1, 1).bit_length())
    nb = -(-n // L)

    def blk(x, fill):
        xp = jnp.pad(x, (0, nb * L - n), constant_values=fill)
        return xp.reshape(nb, L)

    D, Lo, Hi = blk(d, 0.0), blk(lo, -jnp.inf), blk(hi, jnp.inf)

    def shift(x, k, fill):
        return jnp.pad(x[:, :L - k], ((0, 0), (k, 0)), constant_values=fill)

    s = 1
    while s < L:
        e1 = (shift(D, s, 0.0), shift(Lo, s, -jnp.inf), shift(Hi, s, jnp.inf))
        D, Lo, Hi = _clip_combine(e1, (D, Lo, Hi))
        s *= 2

    # carry: attenuation value at each block start (g_{-1} = 0)
    def step(g, efs):
        db, lob, hib = efs
        return jnp.clip(g + db, lob, hib), g

    _, Gpre = jax.lax.scan(step, jnp.float32(0.0),
                           (D[:, -1], Lo[:, -1], Hi[:, -1]))
    att = jnp.clip(Gpre[:, None] + D, Lo, Hi)
    return att.reshape(nb * L)[:n]


def pydub_compress_fast(x_int: jax.Array, sample_rate: float, threshold_db,
                        ratio, attack_ms: float = 5.0,
                        release_ms: float = 50.0) -> jax.Array:
    rms, max_att, thresh_rms = pydub_detector(
        x_int, sample_rate, threshold_db, ratio, attack_ms)
    attack_frames = attack_ms * sample_rate / 1000.0
    release_frames = release_ms * sample_rate / 1000.0
    att = _pydub_gain_fast(rms > thresh_rms, max_att,
                           jnp.float32(attack_frames),
                           jnp.float32(release_frames))
    return _apply_attenuation_int(x_int, att)


# ---------------------------------------------------------------------------
# 3. Quality path — smooth decoupled detector, all-associative
# ---------------------------------------------------------------------------

def compress_quality_multi(bands, sample_rate, thresholds_db, ratios,
                           attack_ms=5.0, release_ms=50.0, rms_ms=5.0):
    """Compress G bands at once: the detector, release scan, and attack
    smoother each run ONCE on [N, G]-stacked signals instead of per band
    (same attack/release for all bands; thresholds/ratios per band).

    bands: list of G arrays [N, C]. Returns list of compressed bands.
    """
    G = len(bands)
    n = bands[0].shape[0]
    dt = bands[0].dtype
    rms_w = max(int(rms_ms * sample_rate / 1000.0), 1)

    sq = jnp.stack([jnp.mean(b * b, axis=1) for b in bands], axis=1)  # [N,G]
    mean_sq = W.moving_mean_past(sq, rms_w)
    level_db = 10.0 * jnp.log10(jnp.maximum(mean_sq, 1e-12))

    th = jnp.asarray(thresholds_db, dt).reshape(1, G)
    ra = jnp.asarray(ratios, dt).reshape(1, G)
    over = jnp.maximum(level_db - th, 0.0)
    gr_db = over * (1.0 - 1.0 / ra)

    rel_decay = math.exp(-1.0 / (release_ms * sample_rate / 1000.0))
    gr_rel = W.release_scan(gr_db, rel_decay)
    a = math.exp(-1.0 / (attack_ms * sample_rate / 1000.0))
    coeffs = jnp.array([1.0 - a, 0.0, 0.0, 1.0, -a, 0.0], dt)
    gr_smooth, _ = biquad_scan(gr_rel, coeffs)  # [N, G]

    gains = 10.0 ** (-gr_smooth / 20.0)
    return [bands[g] * gains[:, g][:, None] for g in range(G)]


@partial(jax.jit, static_argnums=(1,))
def _compress_quality_jit(args, static):
    x, threshold_db, ratio, makeup_db = args
    sample_rate, attack_ms, release_ms, rms_ms = static
    (y,) = compress_quality_multi([x], sample_rate, [threshold_db],
                                  [ratio], attack_ms, release_ms, rms_ms)
    return y * 10.0 ** (makeup_db / 20.0)


def compress_quality(x: jax.Array, sample_rate: float, threshold_db, ratio,
                     attack_ms: float = 5.0, release_ms: float = 50.0,
                     rms_ms: float = 5.0, makeup_db=0.0) -> jax.Array:
    """Feed-forward RMS compressor with smooth decoupled attack/release.
    x: [N, C] float in [-1, 1]; gain shared across channels."""
    return _compress_quality_jit(
        (x, jnp.asarray(threshold_db, x.dtype), jnp.asarray(ratio, x.dtype),
         jnp.asarray(makeup_db, x.dtype)),
        (float(sample_rate), float(attack_ms), float(release_ms),
         float(rms_ms)))
