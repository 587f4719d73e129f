"""ffmpeg ``loudnorm`` two-pass semantics on device — including DYNAMIC mode.

The reference normalizes by shelling out to ffmpeg twice
(audio_mastering_engine.py:229-241): pass 1 measures and prints the JSON
stats block (``input_i .. target_offset``), pass 2 re-runs loudnorm with the
``measured_*`` values and ``offset=target_offset``. ffmpeg then applies ONE
linear gain when the measured values pass the linear-mode eligibility gates,
and otherwise falls back to its frame-adaptive DYNAMIC mode.

This module implements the af_loudnorm dynamic controller as pinned by
BLACK-BOX PROBING of the real filter (driven in-process via io/avfilter.py;
every rule was isolated with a targeted experiment and the result holds the
PER-FRAME gain trajectory within 0.1 dB of ffmpeg on every probe signal,
incl. music-like program material — tests/test_golden_ffmpeg.py
test_dynamic_exact_gain_parity records the evidence), built TPU-first: all
measurement is parallel framed matmul/reduction work and the controller
itself is parallel (see ``_dynamic_jit``):

* 100 ms frames; a ring of 30 per-frame gain deltas (3 s of lookahead).
* FIRST_FRAME: if the 3 s priming short-term is below ``measured_thresh``
  the run starts UNLATCHED with delta = offset + target_I − measured_I;
  otherwise latched with delta = offset + target_I − st0.
* while UNLATCHED: the pending gain creeps ×1.0058 (+0.05 dB) on each
  frame whose input short-term exceeds measured_thresh, and latches the
  first time the OUTPUT short-term reaches the absolute target_I (with a
  negative enough ``offset`` it never latches and the whole run stays
  creep-shaped — real-filter behavior).
* once latched, a frame whose input short-term is at or above the
  input's RUNNING relative threshold (ungated block mean − 10 LU) takes
  the env formula delta = 10^((offset + env_global + target_I − st)/20)
  with env_global = clip(st − running gated integrated, ±target_LRA/2);
  a frame below the running relative threshold HOLDS the last written
  delta (round 4: pinned per-frame against the real filter via exact
  gain extraction — the round-3 "floor at the relative threshold"
  reading was close but wrong in transitions); st ≤ −70 writes the
  bare-offset delta. The running stats visible to frame k include the
  gating block ending at k itself.
* the applied gain is the 21-tap σ=3.5 gaussian over deltas[f−2..f+18],
  linearly interpolated across each frame's samples; the EOF flush
  freezes the gain from frame F−29 on at the window value of frame
  F−28.
* the running integrated loudness + relative threshold are tracked
  ebur128-style with a 0.1 LU histogram of gated 400 ms blocks.
* a per-frame true-peak ceiling holds the output at ``target_tp``.
* the printed output-side stats (output_i/output_tp/output_lra/
  output_thresh — ffmpeg's r128_out) are measured on the actual output.

Documented deviations from ffmpeg (each bounded, none affecting the
two-pass contract the reference exercises):
  * ffmpeg upsamples to 192 kHz in dynamic mode (its output sample rate
    changes!); this engine stays at the native rate and caps per-frame
    peaks instead of running the 192 kHz sample-domain limiter.

Behaviors pinned by driving the REAL filter (tests/test_golden_ffmpeg.py),
overriding ffmpeg's documentation: linear-mode gain is ``target_I −
measured_I`` with the ``offset`` option ignored (in dynamic mode it shifts
the whole trajectory 1:1 instead); pass-1 input stats double-count the
final ~2.9 s (the flush re-measures the lookahead ring tail); and the
dynamic-controller rules above (creep/latch, below-relative-threshold
hold, trailing window, EOF freeze one frame ahead).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ame_tpu.dsp import design
from ame_tpu.ops.scan_iir import sosfilt_scan
from ame_tpu.ops.loudness import (_power_to_lufs, gated_stats_from_hops,
                                  measure, true_peak_db)

# ---------------------------------------------------------------------------
# Controller constants (the published loudnorm design)
# ---------------------------------------------------------------------------

FRAME_S = 0.100          # 100 ms frames
RING = 30                # 3 s delta ring
GAUSS_TAPS = 21          # gaussian smoothing window
GAUSS_SIGMA = 3.5
GAIN_LOOKAHEAD = 10      # window center: 1 s ahead of the output frame

# ebur128-style histogram of output gating blocks: 0.1 LU bins, [-70, +5)
_HIST_LO = -70.0
_HIST_HI = 5.0
_HIST_STEP = 0.1
_NBINS = int(round((_HIST_HI - _HIST_LO) / _HIST_STEP))  # 750


def _gauss_weights() -> np.ndarray:
    x = np.arange(GAUSS_TAPS) - GAUSS_TAPS // 2
    w = np.exp(-(x ** 2) / (2.0 * GAUSS_SIGMA ** 2))
    return (w / w.sum()).astype(np.float32)


def _hist_centers() -> np.ndarray:
    return (_HIST_LO + (np.arange(_NBINS) + 0.5) * _HIST_STEP).astype(
        np.float32)


# ---------------------------------------------------------------------------
# Dynamic-mode engine
# ---------------------------------------------------------------------------

def _frame_moments(xp, xk, L: int):
    """Per-frame measurement of [F·L, C] audio given its K-weighted form:
    interpolation moments (output frame power under a linear gain ramp
    g(t) = g0 + (g1-g0)·t/L is g0²·M0 + 2·g0·(g1-g0)·M1 + (g1-g0)²·M2)
    plus the per-frame sample peak. Shard-local math — the
    sequence-parallel path (parallel/sp_compat.py) computes these on each
    shard and all-gathers the tiny [F] vectors."""
    FL, c = xp.shape
    F = FL // L
    xk2 = (xk * xk).reshape(F, L, c)
    t_rel = jnp.arange(L, dtype=xp.dtype) / L
    M0 = jnp.sum(xk2, axis=(1, 2))                         # Σ xk²
    M1 = jnp.einsum("flc,l->f", xk2, t_rel)                # Σ xk²·(t/L)
    M2 = jnp.einsum("flc,l->f", xk2, t_rel * t_rel)        # Σ xk²·(t/L)²
    peak = jnp.max(jnp.abs(xp).reshape(F, L * c), axis=1)
    return M0, M1, M2, peak


def _controller_gains(M0, M1, M2, peak, L: int, F_eff, blk_valid,
                      target_i, target_tp, target_lra,
                      measured_i, measured_thresh, offset):
    """The dynamic controller on the [F] frame axis: per-frame applied
    gains (g0 at each frame's head, g1 at its tail, linearly interpolated
    across the frame's samples by the caller).

    Implements the black-box-pinned af_loudnorm dynamic spec (see
    tests/oracles.py:loudnorm_dynamic_gains for the sequential float64
    form and the list of probed behaviors, tests/test_golden_ffmpeg.py
    for the experiments) FULLY IN PARALLEL — no scan:

      * the quiet-start creep (prev_delta × 1.0058 per above-thresh frame)
        is delta0 · 1.0058^cumsum(creep_mask) — a cumsum;
      * the above_threshold latch is the FIRST CROSSING of the output
        short-term loudness over target_i, computed from the pre-latch
        trajectory (which is exact up to the latch: the smoothing window
        at frame f only reads deltas written before frame f+28 < f+30);
      * post-latch deltas take the env formula on frames whose input
        short-term is at or above the RUNNING relative threshold (and on
        st ≤ −70 frames, which write the bare-offset delta); frames
        BELOW the running relative threshold HOLD the last written delta
        (round 4: pinned per-frame-exactly against the real filter via
        least-squares gain extraction on its 192 kHz output; the
        round-3 "floor at the relative threshold" emulation was close
        but measurably wrong in transitions). The hold is a running-max
        gather over the last fresh frame index — still no scan;
      * the histogram visible to delta k includes the gating block
        ending at frame k itself (round 4: was k−1);
      * the EOF flush freezes the gain from frame F−29 on at the
        window value of frame F−28 (the real filter computes its flush
        gain one slot ahead of the frozen frame) — an index select.

    Pure [F]-domain math, shared verbatim by the single-chip engine
    (``_dynamic_jit``) and the sequence-parallel compat path, which runs
    it replicated on all-gathered frame moments.
    """
    dt = M0.dtype
    F = M0.shape[0]
    cs = jnp.concatenate([jnp.zeros((1,), dt), jnp.cumsum(M0)])
    # short-term input loudness: trailing 3 s (30 hops) per frame
    st_sum = cs[RING:] - cs[:-RING]
    st_in = jnp.concatenate([
        jnp.full((RING - 1,), -1e9, dt),
        _power_to_lufs(st_sum / (RING * L))])             # [F]

    # input-side gating blocks (400 ms, one per hop): block ending at f
    blk_sum = cs[4:] - cs[:-4]
    blk_lufs = jnp.concatenate([
        jnp.full((3,), -1e9, dt),
        _power_to_lufs(blk_sum / (4 * L))])               # [F]

    bin_lufs = jnp.asarray(_hist_centers(), dt)
    bin_power = 10.0 ** ((bin_lufs + 0.691) / 10.0)
    blk_idx = jnp.clip(((blk_lufs - _HIST_LO) / _HIST_STEP).astype(
        jnp.int32), 0, _NBINS - 1)
    blk_add = jnp.where((blk_lufs > -70.0) & blk_valid, 1.0, 0.0)

    # cumulative histogram: H[k] = counts of blocks ending at frames <= k,
    # then the running gated integrated loudness + running RELATIVE
    # threshold (ungated mean - 10) for EVERY prefix at once
    onehot = blk_add[:, None] * (blk_idx[:, None]
                                 == jnp.arange(_NBINS)[None, :])  # [F, NB]
    H = jnp.cumsum(onehot, axis=0)                                # [F, NB]
    cnt = jnp.sum(H, axis=1)
    mean_p = jnp.sum(H * bin_power[None], axis=1) / jnp.maximum(cnt, 1.0)
    rel = jnp.where(cnt > 0, _power_to_lufs(mean_p) - 10.0,
                    jnp.float32(-70.0))                           # [F]
    gmask = jnp.where(bin_lufs[None] > rel[:, None], H, 0.0)
    gcnt = jnp.sum(gmask, axis=1)
    gp = jnp.sum(gmask * bin_power[None], axis=1) / jnp.maximum(gcnt, 1.0)
    glob_cum = jnp.where((cnt > 0) & (gcnt > 0), _power_to_lufs(gp),
                         jnp.float32(-1e9))                       # [F]

    # ---- FIRST_FRAME: priming decides the start state --------------------
    st0 = st_in[RING - 1]
    above0 = st0 >= measured_thresh
    env0 = jnp.where(st0 <= -70.0, 0.0,
                     jnp.where(above0, target_i - st0,
                               target_i - measured_i))
    delta0 = 10.0 ** ((offset + env0) / 20.0)

    # ---- pre-latch creep trajectory (closed form) ------------------------
    # delta index axis k in [0, FE); deltas k<RING are the priming fill,
    # delta k = RING+f is written while processing output frame f
    FE = F + RING
    karr = jnp.arange(FE)
    k_src = jnp.minimum(karr, F - 1)
    st_k = st_in[k_src]
    inner = karr < F_eff                     # real INNER-frame writes only
    creep = jnp.where((st_k > measured_thresh) & inner & (karr >= RING),
                      1.0, 0.0)
    ccount = jnp.cumsum(creep)
    d_pre = delta0 * 1.0058 ** ccount                              # [FE]

    w = jnp.asarray(_gauss_weights(), dt)
    ceil_lin = 10.0 ** (target_tp / 20.0)

    def smooth_gains(delta):
        # gain[f] reads deltas[f-2 .. f+18] (the window TRAILS by 2 — fit
        # on the real filter's transition timing). EOF flush: frozen from
        # frame F_eff-29 on at the WINDOW VALUE OF FRAME F_eff-28 (the
        # real filter computes its flush gain one slot ahead of where it
        # freezes — pinned by exact gain extraction, round 4); the frame
        # before the freeze already takes the frozen value as its g1.
        dpad = jnp.concatenate([jnp.full((2,), delta0, dt), delta])
        gext = sum(w[j] * lax.dynamic_slice_in_dim(dpad, j, F + 1)
                   for j in range(GAUSS_TAPS))                     # [F+1]
        farr_ = jnp.arange(F)
        fz = jnp.maximum(F_eff - 29, 0)
        fro = jnp.clip(F_eff - 28, 0, F)
        gain = gext[jnp.where(farr_ < fz, farr_, fro)]
        gain_next = gext[jnp.where(farr_ + 1 < fz, farr_ + 1, fro)]
        cap = jnp.minimum(1.0, ceil_lin / jnp.maximum(
            peak * jnp.maximum(gain, gain_next), 1e-9))
        return gain * cap, gain_next * cap

    g0_pre, g1_pre = smooth_gains(d_pre)
    dg = g1_pre - g0_pre
    out_pow_pre = g0_pre * g0_pre * M0 + 2 * g0_pre * dg * M1 + dg * dg * M2
    cso = jnp.concatenate([jnp.zeros((1,), dt),
                           jnp.cumsum(out_pow_pre)])
    farr = jnp.arange(F)
    lo = jnp.maximum(farr - (RING - 1), 0)
    st_out = _power_to_lufs((cso[farr + 1] - cso[lo])
                            / ((farr + 1 - lo) * L))               # [F]

    # latch: first INNER frame whose output short-term reaches target_i
    can_latch = (st_out >= target_i) & (farr + RING < F_eff)
    any_latch = jnp.any(can_latch) | above0
    latch_f = jnp.where(above0, -RING,
                        jnp.argmax(can_latch).astype(jnp.int32))
    latch_k = jnp.where(any_latch, latch_f + RING, FE)   # delta-axis index

    # ---- post-latch env deltas ------------------------------------------
    # The hist/glob/rel visible when writing delta k include the gating
    # block ending at frame k itself (round-4 exact-gain pinning).
    glob_k = glob_cum[k_src]
    rel_k = rel[k_src]
    env_g = jnp.clip(st_k - glob_k, -target_lra / 2.0, target_lra / 2.0)
    cand = 10.0 ** ((offset + env_g + target_i - st_k) / 20.0)
    cand = jnp.where(st_k <= -70.0, 10.0 ** (offset / 20.0), cand)

    # below-relative-threshold HOLD: a frame with -70 < st < rel repeats
    # the last written delta. Parallel form: gather the candidate of the
    # most recent FRESH frame (st >= rel, or the st <= -70 bare-offset
    # write) via a running max of fresh indices; before any fresh frame
    # the held value is the final pre-latch delta.
    latch_eff = jnp.maximum(latch_k, RING)
    fresh = ((karr >= latch_eff) & inner
             & ((st_k <= -70.0) | (st_k >= rel_k)))
    last_fresh = lax.cummax(jnp.where(fresh, karr, -1))
    fallback = d_pre[jnp.maximum(latch_eff - 1, 0)]
    post = jnp.where(last_fresh >= 0,
                     cand[jnp.maximum(last_fresh, 0)], fallback)

    delta = jnp.where(karr < latch_eff, d_pre, post)

    return smooth_gains(delta)


def _valid_frames(F: int, L: int, n_valid):
    """(F_eff, blk_valid) — the number of REAL frames (track end = EOF for
    the controller) and the per-frame histogram mask. Blocks past the true
    track end never enter the histogram (the padding is zeros anyway; the
    mask also drops the boundary block)."""
    if n_valid is None:
        return jnp.asarray(F, jnp.int32), jnp.ones((F,), bool)
    F_eff = -((-jnp.asarray(n_valid, jnp.int32)) // L)
    return F_eff, (jnp.arange(F) + 1) * L <= n_valid


def apply_frame_gains(xp, g0, g1, L: int):
    """Apply per-frame linearly interpolated gains to [F·L, C] audio."""
    FL, c = xp.shape
    F = FL // L
    t_rel = jnp.arange(L, dtype=xp.dtype) / L
    gain_samples = (g0[:, None] + (g1 - g0)[:, None] * t_rel[None, :])
    return (xp.reshape(F, L, c) * gain_samples[:, :, None]).reshape(FL, c)


@partial(jax.jit, static_argnums=(1, 8))
def _dynamic_jit(x, sample_rate, target_i, target_tp, target_lra,
                 measured_i, measured_thresh, offset, materialize=True,
                 n_valid=None):
    """Frame-adaptive normalization of [N, C] audio. Returns
    (y, output_i, output_thresh); y is None when ``materialize`` is False
    (the pass-1 target_offset path needs only the output stats).
    Measurement (``_frame_moments``) + controller (``_controller_gains``)
    + interpolated gain application + output-side stats."""
    n, c = x.shape
    L = int(round(FRAME_S * sample_rate))
    F = -(-n // L)
    xp = jnp.pad(x, ((0, F * L - n), (0, 0)))

    # ffmpeg's dynamic meter runs at 192 kHz (the filter upsamples);
    # the corrected cascade reproduces that design's in-band magnitude
    # at the native rate (design.k_weighting_dynamic_sos)
    sos = design.k_weighting_dynamic_sos(sample_rate)
    xk, _ = sosfilt_scan(sos, xp)
    M0, M1, M2, peak = _frame_moments(xp, xk, L)
    F_eff, blk_valid = _valid_frames(F, L, n_valid)
    g0, g1 = _controller_gains(M0, M1, M2, peak, L, F_eff, blk_valid,
                               target_i, target_tp, target_lra,
                               measured_i, measured_thresh, offset)
    y = apply_frame_gains(xp, g0, g1, L)[:n] if materialize else None

    # output-side stats (ffmpeg's r128_out, metering the 192 kHz stream)
    # from the SAME interpolation moments the controller uses: the output
    # frame energy under the linear gain ramp is g0²M0 + 2g0(g1−g0)M1 +
    # (g1−g0)²M2, fed through the exact hop-domain gate — no second
    # K-filter pass and no output-waveform materialization (round 4:
    # re-measuring y cost a full sosfilt_scan + gating per dynamic run,
    # ~3 ms of the 2^23-sample chain; the moments model applies the gain
    # post-K, a quasi-static approximation the golden pass-1 bounds
    # cover — tests/test_golden_ffmpeg.py).
    dg = g1 - g0
    out_pow = g0 * g0 * M0 + 2.0 * g0 * dg * M1 + dg * dg * M2
    output_i, _, output_thresh = gated_stats_from_hops(
        out_pow, L, n_valid, dtype=x.dtype)
    return y, output_i, output_thresh


def dynamic_loudnorm(x: jax.Array, sample_rate: float,
                     target_i: float = -24.0, target_tp: float = -2.0,
                     target_lra: float = 7.0,
                     measured_i=0.0, measured_thresh=-70.0, offset=0.0,
                     n_valid=None, materialize: bool = True):
    """Frame-adaptive (dynamic-mode) loudness normalization.

    Returns (y, {"output_i", "output_thresh"}). ``measured_i`` /
    ``measured_thresh`` carry pass-1 values in a two-pass flow; their
    defaults are ffmpeg's unmeasured option defaults. ``offset`` shifts
    the whole gain trajectory (ffmpeg's dynamic-mode ``offset`` semantics
    — proven against the real filter, tests/test_golden_ffmpeg.py; note
    it also moves where the output lands relative to ``target_i``, so a
    never-latching quiet start stays creep-shaped)."""
    if x.ndim == 1:
        x = x[:, None]
    L = int(round(FRAME_S * sample_rate))
    if x.shape[0] < (RING + 1) * L:
        # < 3.1 s cannot fill the controller's integrator: single gain
        # capped to the true-peak ceiling (ffmpeg pads/flushes tiny inputs
        # through the same startup path; behavioral stand-in)
        stats = measure(x, sample_rate, n_valid)
        gain_db = jnp.minimum(jnp.asarray(target_i, x.dtype)
                              - stats["input_i"],
                              jnp.asarray(target_tp, x.dtype)
                              - stats["input_tp"])
        gain_db = jnp.where(jnp.isfinite(stats["input_i"]), gain_db, 0.0)
        y = x * 10.0 ** (gain_db / 20.0)
        return y, {"output_i": stats["input_i"] + gain_db,
                   "output_thresh": stats["input_thresh"] + gain_db}
    y, oi, oth = _dynamic_jit(
        x, float(sample_rate), jnp.asarray(target_i, x.dtype),
        jnp.asarray(target_tp, x.dtype), jnp.asarray(target_lra, x.dtype),
        jnp.asarray(measured_i, x.dtype),
        jnp.asarray(measured_thresh, x.dtype),
        jnp.asarray(offset, x.dtype), bool(materialize), n_valid)
    return y, {"output_i": oi, "output_thresh": oth}


# ---------------------------------------------------------------------------
# Pass 1: the JSON stats block
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1,))
def _pass1_fused_jit(x, sample_rate, target_i, target_tp, target_lra,
                     n_valid=None):
    """Input-side stats + the offset-producing dynamic run off ONE
    K-filter pass (round 4). The separate ``measure(xdup)`` ran a second
    full sosfilt_scan over a concat-duplicated waveform; here the flush
    double-count (the final ~2.9 s re-fed through the measurement state)
    is emulated on the 100 ms hop grid by re-appending the last 29 hop
    energies — exact for hop-aligned lengths, <0.05 LU otherwise, the
    same documented emulation the sequence-parallel path uses
    (parallel/sp_compat.py). Returns (input_i, input_lra, input_thresh,
    output_i, output_thresh)."""
    n, c = x.shape
    L = int(round(FRAME_S * sample_rate))
    F = -(-n // L)
    xp = jnp.pad(x, ((0, F * L - n), (0, 0)))
    sos = design.k_weighting_dynamic_sos(sample_rate)
    xk, _ = sosfilt_scan(sos, xp)
    M0, M1, M2, peak = _frame_moments(xp, xk, L)
    F_eff, blk_valid = _valid_frames(F, L, n_valid)

    # tail-duplicated hop energies for the input-side stats
    ND = 29
    if n_valid is None:
        hops_dup = jnp.concatenate([M0, M0[F - ND:]])
        nv_dup = None
    else:
        start = jnp.maximum(F_eff - ND, 0)
        tail = lax.dynamic_slice_in_dim(
            jnp.concatenate([M0, jnp.zeros((ND,), M0.dtype)]), start, ND)
        buf = jnp.concatenate([M0, jnp.zeros((ND,), M0.dtype)])
        hops_dup = lax.dynamic_update_slice(buf, tail, (F_eff,))
        nv_dup = (F_eff + ND) * L
    input_i, input_lra, input_thresh = gated_stats_from_hops(
        hops_dup, L, nv_dup, dtype=x.dtype)

    g0, g1 = _controller_gains(M0, M1, M2, peak, L, F_eff, blk_valid,
                               target_i, target_tp, target_lra,
                               jnp.asarray(0.0, x.dtype),
                               jnp.asarray(-70.0, x.dtype),
                               jnp.asarray(0.0, x.dtype))
    dg = g1 - g0
    out_pow = g0 * g0 * M0 + 2.0 * g0 * dg * M1 + dg * dg * M2
    output_i, _, output_thresh = gated_stats_from_hops(
        out_pow, L, None if n_valid is None else F_eff * L, dtype=x.dtype)
    return input_i, input_lra, input_thresh, output_i, output_thresh


def loudnorm_pass1(x: jax.Array, sample_rate: float,
                   target_i: float = -14.0, target_tp: float = -1.5,
                   target_lra: float = 11.0, n_valid=None,
                   full: bool = True) -> dict:
    """The on-device analog of loudnorm ``print_format=json``
    (engine:229-237): measures the input AND runs the dynamic normalizer to
    produce the output-side stats, exactly as ffmpeg's pass 1 does.

    Returns input_i/input_tp/input_lra/input_thresh,
    output_i/output_thresh (+ output_tp/output_lra when ``full``),
    target_offset = target_i − output_i, and normalization_type.

    The input-side stats deliberately measure the last ~2.9 s TWICE:
    ffmpeg's dynamic-mode flush re-feeds the tail of its 3 s lookahead
    ring through the measurement state, so the real pass-1 JSON
    double-counts it. Proven against the genuine filter
    (tests/test_golden_ffmpeg.py): a ramp-up reads ~0.8 LU hot, a
    ramp-down ~0.8 LU low, and duplicating the final 2.9 s reproduces
    input_i/input_thresh/input_lra within ~0.05 LU on every probe signal,
    while order-symmetric content is unaffected. Without this, pass-2
    gains diverge from the reference by up to ~1 dB on crescendo tracks.
    """
    if x.ndim == 1:
        x = x[:, None]
    L = int(round(FRAME_S * sample_rate))
    if x.shape[0] >= (RING + 1) * L:
        # fused path: input stats + the offset-producing dynamic run off
        # ONE K-filter pass (_pass1_fused_jit)
        ii, lra, th, oi, oth = _pass1_fused_jit(
            x, float(sample_rate), jnp.asarray(target_i, x.dtype),
            jnp.asarray(target_tp, x.dtype),
            jnp.asarray(target_lra, x.dtype), n_valid)
        stats = {"input_i": ii, "input_lra": lra, "input_thresh": th,
                 "input_tp": true_peak_db(x),
                 "output_i": oi, "output_thresh": oth}
        stats["target_offset"] = jnp.asarray(target_i, x.dtype) - oi
        if full:
            y, _ = dynamic_loudnorm(x, sample_rate, target_i, target_tp,
                                    target_lra, n_valid=n_valid)
            out_stats = measure(y, sample_rate, n_valid)
            stats["output_tp"] = out_stats["input_tp"]
            stats["output_lra"] = out_stats["input_lra"]
        return stats

    # short input: the sample-grid duplication + short-path dynamic run
    nd = min(int(round(2.9 * sample_rate)), x.shape[0])
    if n_valid is None:
        xdup = jnp.concatenate([x, x[x.shape[0] - nd:]])
        stats = measure(xdup, sample_rate, dynamic_domain=True)
    else:
        nv = jnp.asarray(n_valid, jnp.int32)
        start = jnp.maximum(nv - nd, 0)
        tail = lax.dynamic_slice_in_dim(x, start, nd, axis=0)
        buf = jnp.concatenate([x, jnp.zeros((nd, x.shape[1]), x.dtype)])
        xdup = lax.dynamic_update_slice(buf, tail, (nv, 0))
        stats = measure(xdup, sample_rate, nv + nd, dynamic_domain=True)
    # the concat seam is a waveform discontinuity the 4x interpolator
    # rings on; read the true peak off the original, seam-free signal
    stats["input_tp"] = true_peak_db(x)
    y, out = dynamic_loudnorm(x, sample_rate, target_i, target_tp,
                              target_lra, n_valid=n_valid,
                              materialize=bool(full))
    stats["output_i"] = out["output_i"]
    stats["output_thresh"] = out["output_thresh"]
    stats["target_offset"] = jnp.asarray(target_i, x.dtype) - out["output_i"]
    if full:
        out_stats = measure(y, sample_rate, n_valid)
        stats["output_tp"] = out_stats["input_tp"]
        stats["output_lra"] = out_stats["input_lra"]
    # silent input: ffmpeg prints -inf / 0 rows; the reference keys off
    # input_i == -inf (quirk Q9) before ever reaching pass 2
    return stats


# ---------------------------------------------------------------------------
# Pass 2 (one ffmpeg invocation with measured_* values)
# ---------------------------------------------------------------------------

def loudnorm(x: jax.Array, sample_rate: float,
             target_i: float = -24.0, target_tp: float = -2.0,
             target_lra: float = 7.0, measured: dict | None = None,
             offset=0.0, linear: bool = True, n_valid=None):
    """One loudnorm invocation. With ``measured`` pass-1 stats and
    ``linear=True``, applies the single linear gain
    ``target_i − measured_i`` when ALL eligibility gates hold:

      measured_tp != 99, measured_thresh != -70, measured_lra != 0,
      measured_i != 0 (values were actually supplied), AND
      measured_tp + gain <= target_tp (the gain keeps the true peak
      legal), AND measured_lra <= target_lra.

    Otherwise (or with no measured values) runs the dynamic engine.
    Returns (y, info) with ``linear_mode`` 1.0/0.0 and ``gain_db`` (the
    linear gain; NaN-free 0.0 when dynamic ran).
    """
    if x.ndim == 1:
        x = x[:, None]
    ti = jnp.asarray(target_i, x.dtype)
    if measured is None:
        y, out = dynamic_loudnorm(x, sample_rate, target_i, target_tp,
                                  target_lra)
        return y, {"linear_mode": jnp.zeros((), x.dtype),
                   "gain_db": jnp.zeros((), x.dtype), **out}

    m_i = jnp.asarray(measured["input_i"], x.dtype)
    m_tp = jnp.asarray(measured["input_tp"], x.dtype)
    m_lra = jnp.asarray(measured["input_lra"], x.dtype)
    m_th = jnp.asarray(measured["input_thresh"], x.dtype)
    # ffmpeg IGNORES the offset option in linear mode: feeding the real
    # filter offset=-2.77 and offset=6.0 yields byte-identical output with
    # gain = target_i - measured_i exactly (tests/test_golden_ffmpeg.py).
    # In DYNAMIC mode it shifts the whole gain trajectory 1:1 — threaded
    # through to the dynamic branch below.
    gain_db = ti - m_i
    offset_tp = m_tp + gain_db
    supplied = ((m_tp != 99.0) & (m_th != -70.0) & (m_lra != 0.0)
                & (m_i != 0.0))
    lin_ok = (supplied & (offset_tp <= target_tp)
              & (m_lra <= target_lra)) if linear else jnp.zeros((), bool)

    def _linear(x):
        y = x * 10.0 ** (gain_db / 20.0)
        return y, m_i + gain_db, m_th + gain_db

    def _dyn_branch(x):
        y, out = dynamic_loudnorm(x, sample_rate, target_i, target_tp,
                                  target_lra, m_i, m_th, offset=offset,
                                  n_valid=n_valid)
        return y, out["output_i"], out["output_thresh"]

    y, out_i, out_th = lax.cond(lin_ok, _linear, _dyn_branch, x)
    return y, {"linear_mode": lin_ok.astype(x.dtype),
               "gain_db": jnp.where(lin_ok, gain_db, 0.0),
               "output_i": out_i, "output_thresh": out_th}


# ---------------------------------------------------------------------------
# The reference's full two-pass flow
# ---------------------------------------------------------------------------

def loudnorm_two_pass(x: jax.Array, sample_rate: float,
                      target_i: float = -14.0, target_tp: float = -1.5,
                      target_lra: float = 11.0, n_valid=None):
    """normalize_loudness_on_disk_with_ffmpeg, on device
    (engine:227-246): pass 1 measures + derives ``target_offset`` from the
    dynamic run; silent input (input_i = −inf) passes through unchanged
    (quirk Q9); pass 2 runs with the measured values and the offset.
    """
    if x.ndim == 1:
        x = x[:, None]
    stats = loudnorm_pass1(x, sample_rate, target_i, target_tp, target_lra,
                           n_valid=n_valid, full=False)
    silent = ~jnp.isfinite(stats["input_i"])

    # silent input passes through untouched (quirk Q9). lax.cond, not a
    # whole-waveform select: jnp.where(silent, x, y) materialized an extra
    # [N, 2] pass (~2 ms at 2^23) on EVERY run just in case of silence.
    def _normalize(x):
        y, info = loudnorm(x, sample_rate, target_i, target_tp, target_lra,
                           measured=stats, offset=stats["target_offset"],
                           n_valid=n_valid)
        return y, dict(info)

    def _passthrough(x):
        zero = jnp.zeros((), x.dtype)
        return x, {"linear_mode": zero, "gain_db": zero,
                   "output_i": stats["input_i"],
                   "output_thresh": stats["input_thresh"]}

    y, info = lax.cond(silent, _passthrough, _normalize, x)
    return y, {**stats, **info}
