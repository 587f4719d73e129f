"""Sequence-parallel COMPAT mastering: the reference-semantics chain
(audio_mastering_engine.py:185-223 — analog character -> EQ -> width ->
multiband -> loudnorm -> alimiter, with the Appendix-A quirks) on one long
track sharded over the mesh time axis.

Reference sites carried through (via the single-chip ops this module
re-routes): chunk resets audio_mastering_engine.py:178/185-204 (Q6), the
blend EQ :283-298 (Q1-Q3/Q14), subtractive crossover + saturating adds
:299-309 (Q4/Q7), pydub dynamics :306-308, loudnorm two-pass :229-241,
alimiter :223 (Q8).

The compat chain turns out to parallelize *better* than the quality chain,
because the reference's own 30 s chunk resets (quirk Q6) cut every DSP
recurrence at chunk boundaries:

  * analog / EQ / width / multiband (``compat_chunked=True``) — when each
    shard owns whole 30 s chunks, the per-chunk state resets make these
    stages EXACTLY shard-local: zero communication, the unmodified
    single-chip stage ops run on each shard (ops/saturate.py, ops/eq.py,
    graph/multiband.py — including the exact pydub gain engine);
  * unchunked compat EQ — each quirk filter's SOS core runs through the
    exact sequence-parallel IIR (parallel/sequence.py) and the Q1-Q3
    blend math is memoryless, shard-local;
  * loudnorm two-pass (ops/loudnorm.py semantics) — per-frame K-weighted
    moments reduce shard-locally; the tiny [F] frame vectors are
    all-gathered (GSPMD inserts the collective) and the dynamic
    controller (``ops.loudnorm._controller_gains`` — the same code the
    single-chip path and the ffmpeg golden tests run) is replicated;
    per-frame gains then apply shard-locally. Pass-1's tail double-count
    (the flush re-measure, see loudnorm_pass1) is emulated on the hop
    grid: exact for hop-aligned track lengths, <0.05 LU otherwise;
    the duplicated tail reuses the already-K-filtered hop energies, so
    the concat-seam filter transient of the single-chip form (one 400 ms
    block, ~0.01 LU) is absent here.
  * alimiter — ffmpeg's attack/release ramps are tangent-piece (max, x)
    scans (ops/limiter.py); each piece gets an EXACT cross-shard carry:
    per-shard zero-state scan ends are all-gathered and every shard takes
    max_j rho^((s-1-j)*Ln) e_j (release, left-to-right) or the mirrored
    form (attack, right-to-left) — the unrolled boundary recurrence, the
    same construction as the sp multiband release carry.

Communication volume is independent of track length: one [ndev, k, C, 2]
carry gather per unchunked IIR cascade, ~4 gathers of [F] frame vectors
for loudnorm, and 12 scalar gathers for the alimiter pieces.

Use via ``parallel.sp_master.master_sequence_parallel`` with
``settings.mode == "compat"``.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # jax < 0.6
    from jax.experimental.shard_map import shard_map

from ame_tpu import config as C
from ame_tpu.dsp import design
from ame_tpu.ops import eq, quantize, saturate, stereo
from ame_tpu.ops import loudness as L
from ame_tpu.ops import loudnorm as LN
from ame_tpu.ops.window import release_scan
from ame_tpu.ops.limiter import _wedge_pieces
from ame_tpu.parallel.sequence import sosfilt_sequence_parallel
from ame_tpu.parallel.sp_master import (_cache_put, _left_halo,
                                        _true_peak_sharded)


def _shard_map_local(fn, mesh: Mesh, axis: str, n_in: int = 1):
    """shard_map an ``n_in``-argument time-sharded body with the
    varying-manual-axes check off: the single-chip stage ops scanned
    inside (lax.scan with constant init carries) were not written with
    vma annotations; bodies are shard-local or use explicitly exact
    collectives (halos / carry gathers) the check cannot reason about."""
    specs = dict(mesh=mesh,
                 in_specs=tuple(P(axis, None) for _ in range(n_in)),
                 out_specs=P(axis, None))
    try:
        return shard_map(fn, check_vma=False, **specs)
    except TypeError:  # older jax spells it check_rep
        return shard_map(fn, check_rep=False, **specs)


# ---------------------------------------------------------------------------
# Chunk-local pre stages (analog -> EQ -> width -> multiband)
# ---------------------------------------------------------------------------

def _pre_stages_chunked(x, settings, sample_rate: float, chunk_len: int,
                        mesh: Mesh, axis: str, *, analog_on, width_on,
                        multiband_on, comp_exact=True):
    """Quirk-faithful pre stages on whole chunks per shard — EXACT: the
    Q6 chunk resets mean no state crosses a chunk boundary, so when
    ``local_n % chunk_len == 0`` each shard runs the unmodified
    single-chip stage ops (graph/chain.py:_stage_*_compat) on its own
    chunks with zero communication."""
    sr = float(sample_rate)
    threshs = np.asarray([settings.low_thresh, settings.mid_thresh,
                          settings.high_thresh], np.float32)
    ratios = np.asarray([settings.low_ratio, settings.mid_ratio,
                         settings.high_ratio], np.float32)

    def local(xl):
        y = xl
        if analog_on:
            y = saturate.analog_character_compat(
                y, sr, jnp.float32(settings.analog_character), chunk_len)
            y = quantize.int16_roundtrip(y)
        y = eq.apply_eq_compat(
            y, sr, jnp.float32(settings.bass_boost),
            jnp.float32(settings.mid_cut),
            jnp.float32(settings.presence_boost),
            jnp.float32(settings.treble_boost), chunk_len)
        if width_on:
            y = stereo.stereo_width(y, jnp.float32(settings.width))
        y = quantize.int16_roundtrip(y)
        if multiband_on:
            from ame_tpu.graph import multiband as mb
            y = mb.multiband_compat(y, sr, jnp.asarray(threshs),
                                    jnp.asarray(ratios), exact=comp_exact,
                                    chunk_len=chunk_len)
        return y

    return _shard_map_local(local, mesh, axis)(x)


def _pre_stages_unchunked(x, settings, sample_rate: float, mesh: Mesh,
                          axis: str, shd, *, analog_on, width_on):
    """Unchunked compat pre stages: each quirk filter's SOS core through
    the exact sequence-parallel IIR, blends and int16 requantization
    shard-local. The caller runs ``_multiband_compat_sp`` after this
    when the multiband stage is on."""
    sr = float(sample_rate)

    def cs(a):
        return jax.lax.with_sharding_constraint(a, shd)

    def _shelf(x, cutoff_hz, gain_db, kind):
        cutoff_norm = min(cutoff_hz / (0.5 * sr), 0.999999)
        b, a = design.butter_ba(2, cutoff_norm, kind)
        sos = design.ba_to_sos_biquad(b, a)
        f = sosfilt_sequence_parallel(sos, x, mesh, axis)
        return cs(eq.shelf_blend_compat(x, f, jnp.float32(gain_db)))

    def _peak(x, center_hz, gain_db, q):
        sos = design.reference_peak_band_sos(sr, center_hz, q)
        f = sosfilt_sequence_parallel(sos, x, mesh, axis)
        return cs(eq.peak_blend_compat(x, f, jnp.float32(gain_db)))

    def rt(x):
        return cs(quantize.int16_roundtrip(x))

    if analog_on:
        factor = float(settings.analog_character) / 100.0
        drive = 1.0 + factor * 0.5
        x = cs(jnp.tanh(x * drive))
        x = _shelf(x, C.ANALOG_LOW_SHELF_HZ, factor * 1.0, "lowpass")
        x = _shelf(x, C.ANALOG_HIGH_SHELF_HZ, factor * 1.5, "highpass")
        x = rt(x)
    # the reference 4-band chain (engine:277-281; mid_cut negated, Q3)
    x = _shelf(x, C.BASS_SHELF_HZ, float(settings.bass_boost), "lowpass")
    x = _peak(x, C.MID_PEAK_HZ, -float(settings.mid_cut), C.PEAK_Q)
    x = _peak(x, C.PRESENCE_PEAK_HZ, float(settings.presence_boost),
              C.PEAK_Q)
    x = _shelf(x, C.TREBLE_SHELF_HZ, float(settings.treble_boost),
               "highpass")
    if width_on:
        x = cs(stereo.stereo_width(x, jnp.float32(settings.width)))
    return rt(x)


# ---------------------------------------------------------------------------
# Cross-shard exact pydub gain + unchunked compat multiband
# ---------------------------------------------------------------------------

def _pydub_gain_sp(m_loc, attack_frames: float, release_frames: float,
                   axis: str):
    """Exact pydub attenuation across shards (called inside shard_map).

    The gain recurrence is non-associative (ops/pydub_gain.py), so there
    is no closed-form boundary carry. Instead: SHARD-LEVEL Jacobi carry
    relaxation, the cross-chip analog of the engine's own segment
    relaxation. Each sweep runs every shard's local engine from its
    current inbound-carry guess (all engines accept an ``init`` state)
    and all-gathers the outbound states; shard s's next guess is shard
    s-1's outbound. Acceptance: when every shard's guess reproduces its
    left neighbor's outbound, c_s == f_{s-1}(c_{s-1}) for all s with
    c_0 = 0, so the carries equal the sequential chain by induction.
    And ndev-1 sweeps ALWAYS suffice (after sweep r, shards 0..r are
    exact by propagation), so the loop is exact even without early
    convergence — real audio converges in 2-3 sweeps because the state
    forgets at every full-attack clamp or full release.

    m_loc: [Ln, G] local max-attenuation. Returns [Ln, G] attenuations.
    """
    import os

    from ame_tpu.ops.pydub_gain import pydub_gain_ends, pydub_gain_multi

    # AME_TPU_SP_GAIN_INTERPRET=1 forces the Pallas engines through the
    # interpreter — lets the CPU test suite exercise the same
    # pallas-inside-shard_map-inside-while_loop composition the real TPU
    # path uses (None = normal backend routing)
    interp = (True if os.environ.get("AME_TPU_SP_GAIN_INTERPRET") == "1"
              else None)
    G = m_loc.shape[1]
    ndev = lax.axis_size(axis)
    sidx = lax.axis_index(axis)
    ms = [m_loc[:, g] for g in range(G)]

    def run_from(c):
        atts = pydub_gain_multi(ms, attack_frames, release_frames,
                                interpret=interp, init=c)
        return jnp.stack(atts, axis=1)                     # [Ln, G]

    if ndev == 1:
        return run_from(jnp.zeros((G,), m_loc.dtype))

    def cond(st):
        c, done, j = st
        return (j < ndev - 1) & ~done

    def body(st):
        c, _, j = st
        # carry-only sweep: end state without the full [Ln, G] output
        e = pydub_gain_ends(ms, attack_frames, release_frames,
                            interpret=interp, init=c)
        es = lax.all_gather(e, axis)                       # [ndev, G]
        nxt = jnp.where(sidx == 0, jnp.zeros((G,), e.dtype),
                        es[sidx - 1])
        same = jnp.all(nxt == c)
        done = jnp.all(lax.all_gather(same, axis))
        return (nxt, done, j + 1)

    c0 = jnp.zeros((G,), m_loc.dtype)
    c_fin, _, _ = lax.while_loop(
        cond, body, (c0, jnp.zeros((), bool), jnp.zeros((), jnp.int32)))
    return run_from(c_fin)


# pydub defaults (the reference call, audio_mastering_engine.py:306-308);
# the eligibility guard in master_compat_sequence_parallel derives its
# detector-window minimum from the SAME constant
_PYDUB_ATTACK_MS = 5.0
_PYDUB_RELEASE_MS = 50.0


def _multiband_compat_sp(x, settings, sample_rate: float, mesh: Mesh,
                         axis: str):
    """Unchunked compat multiband on a time-sharded track — exact pydub
    semantics (quirks Q4/Q5/Q7 verbatim):

      * subtractive crossover: butter LP/HP through the exact sp IIR,
        mid = full - low - high (Q4), per-band int16 quantization (Q5);
      * detector: shard-local windowed integer RMS with a ``look``-sample
        left halo and GLOBAL index gating (the first ``look`` frames of
        the TRACK read rms 0, not of each shard);
      * gain: shard-level Jacobi carry relaxation (``_pydub_gain_sp``);
      * apply + saturating band adds (Q7): memoryless, shard-local.
    """
    from ame_tpu.ops import compressor as comp
    from ame_tpu.ops import window as W

    sr = float(sample_rate)
    attack_ms, release_ms = _PYDUB_ATTACK_MS, _PYDUB_RELEASE_MS
    look = int(int(attack_ms * sr / 1000.0))
    a_f = attack_ms * sr / 1000.0
    r_f = release_ms * sr / 1000.0
    threshs = (float(settings.low_thresh), float(settings.mid_thresh),
               float(settings.high_thresh))
    ratios = (float(settings.low_ratio), float(settings.mid_ratio),
              float(settings.high_ratio))

    low_sos = design.butter_sos(4, C.MB_LOW_CROSSOVER_HZ, "lowpass", fs=sr)
    high_sos = design.butter_sos(4, C.MB_HIGH_CROSSOVER_HZ, "highpass",
                                 fs=sr)
    if mesh.shape[axis] == 1:
        # one shard: no carry — both crossovers in ONE MXU bank pass
        from ame_tpu.ops.tile_conv import sosfilt_tileconv_bank
        low, high = sosfilt_tileconv_bank([low_sos, high_sos], x)
    else:
        low = sosfilt_sequence_parallel(low_sos, x, mesh, axis)
        high = sosfilt_sequence_parallel(high_sos, x, mesh, axis)

    def local(xl, lowl, highl):
        ln, c = xl.shape
        midl = xl - lowl - highl             # quirk Q4
        bands = [quantize.float_to_int16(b)  # quirk Q5
                 for b in (lowl, midl, highl)]
        gidx = lax.axis_index(axis) * ln + jnp.arange(ln)
        count = float(max(look, 1) * c)
        ms = []
        for i, b in enumerate(bands):
            sq = jnp.sum(b * b, axis=1)
            if look > 0:
                halo = _left_halo(sq[:, None], look, axis)[:, 0]
                seq = jnp.concatenate([halo, sq])
                wsum = W.moving_sum_past(seq, look)[look - 1:look - 1 + ln]
            else:
                wsum = jnp.zeros_like(sq)
            _, max_att, _ = comp._detector_from_wsum(
                wsum, count, gidx >= look, threshs[i], ratios[i])
            ms.append(max_att)
        att = _pydub_gain_sp(jnp.stack(ms, axis=1), a_f, r_f, axis)
        outs = [comp._apply_attenuation_int(bands[g], att[:, g])
                for g in range(3)]
        acc = quantize.saturating_add_int16(outs[0], outs[1])
        acc = quantize.saturating_add_int16(acc, outs[2])  # quirk Q7
        return acc * (1.0 / 32768.0)

    fn = _shard_map_local(local, mesh, axis, n_in=3)
    return fn(x, low, high)


# ---------------------------------------------------------------------------
# Sequence-parallel loudnorm two-pass
# ---------------------------------------------------------------------------

def _loudnorm_measure(x, nv, *, sr, target_i, target_tp, target_lra,
                      mesh, axis, shd):
    """Pre-branch half of the sp loudnorm two-pass (traced): frame
    moments, pass-1 stats + true peak, the pass-1 dynamic run for
    target_offset, and the linear/silent gate flags. The frame controller
    (``_controller_gains``) runs replicated on all-gathered frame
    moments — the SAME code as the single-chip / golden-ffmpeg path;
    only the measurement reductions and gain application are sharded.
    Requires n % hop == 0 (the sp caller's granule)."""
    hop = int(round(LN.FRAME_S * sr))
    n = x.shape[0]
    F = n // hop
    ndh = int(round(2.9 * sr)) // hop        # 29 hops: the flush re-measure

    ksos = design.k_weighting_dynamic_sos(sr)   # ffmpeg dynamic meter domain
    xk = sosfilt_sequence_parallel(ksos, x, mesh, axis)
    M0, M1, M2, peak = LN._frame_moments(x, xk, hop)   # replicated [F]

    def _hop_stats(yk, nv):
        sq = jnp.sum(yk * yk, axis=1)
        hs = jnp.sum(sq.reshape(F, hop), axis=1)
        return L.gated_stats_from_hops(hs, hop, nv, yk.dtype)

    # hop-grid emulation of loudnorm_pass1's tail double-count: the
    # last ~2.9 s of hop energies are appended at the track end
    nvh = nv // hop
    buf = jnp.concatenate([M0, jnp.zeros((ndh,), M0.dtype)])
    tail = lax.dynamic_slice_in_dim(buf, jnp.maximum(nvh - ndh, 0), ndh)
    hed = lax.dynamic_update_slice(buf, tail, (nvh,))
    input_i, input_lra, input_thresh = L.gated_stats_from_hops(
        hed, hop, (nvh + ndh) * hop, M0.dtype)
    input_tp = 20.0 * jnp.log10(jnp.maximum(
        _true_peak_sharded(x, mesh, axis, nv), 1e-12))

    ti = jnp.asarray(target_i, x.dtype)
    tp = jnp.asarray(target_tp, x.dtype)
    lra = jnp.asarray(target_lra, x.dtype)

    # pass-1 dynamic run: ffmpeg's unmeasured option defaults
    F_eff, blk_valid = LN._valid_frames(F, hop, nv)
    g0a, g1a = LN._controller_gains(
        M0, M1, M2, peak, hop, F_eff, blk_valid, ti, tp, lra,
        jnp.asarray(0.0, x.dtype), jnp.asarray(-70.0, x.dtype),
        jnp.asarray(0.0, x.dtype))
    y1 = jax.lax.with_sharding_constraint(
        LN.apply_frame_gains(x, g0a, g1a, hop), shd)
    yk1 = sosfilt_sequence_parallel(ksos, y1, mesh, axis)
    out1_i, _, _ = _hop_stats(yk1, nv)
    target_offset = ti - out1_i

    gain_db = ti - input_i
    supplied = ((input_tp != 99.0) & (input_thresh != -70.0)
                & (input_lra != 0.0) & (input_i != 0.0))
    lin_ok = supplied & (input_tp + gain_db <= tp) & (input_lra <= lra)
    silent = ~jnp.isfinite(input_i)

    return {"M0": M0, "M1": M1, "M2": M2, "peak": peak,
            "input_i": input_i, "input_lra": input_lra,
            "input_tp": input_tp, "input_thresh": input_thresh,
            "target_offset": target_offset, "gain_db": gain_db,
            "lin_ok": lin_ok,
            "flags": jnp.stack([silent, lin_ok])}


def _loudnorm_dynamic_apply(x, nv, meas, *, sr, target_i, target_tp,
                            target_lra, mesh, axis, shd):
    """Dynamic-branch half (traced): the pass-2 controller run seeded
    with the measured stats, gain application, and the output-side
    stats of the actual output (ffmpeg's r128_out)."""
    hop = int(round(LN.FRAME_S * sr))
    F = x.shape[0] // hop
    ti = jnp.asarray(target_i, x.dtype)
    tp = jnp.asarray(target_tp, x.dtype)
    lra = jnp.asarray(target_lra, x.dtype)
    F_eff, blk_valid = LN._valid_frames(F, hop, nv)
    g0d, g1d = LN._controller_gains(
        meas["M0"], meas["M1"], meas["M2"], meas["peak"], hop, F_eff,
        blk_valid, ti, tp, lra, meas["input_i"], meas["input_thresh"],
        meas["target_offset"])
    y = jax.lax.with_sharding_constraint(
        LN.apply_frame_gains(x, g0d, g1d, hop), shd)
    ksos = design.k_weighting_dynamic_sos(sr)   # ffmpeg dynamic meter domain
    yko = sosfilt_sequence_parallel(ksos, y, mesh, axis)
    sq = jnp.sum(yko * yko, axis=1)
    hs = jnp.sum(sq.reshape(F, hop), axis=1)
    output_i, _, output_th = L.gated_stats_from_hops(hs, hop, nv, y.dtype)
    return y, output_i, output_th


# ---------------------------------------------------------------------------
# Sequence-parallel alimiter (exact cross-shard piece carries)
# ---------------------------------------------------------------------------

def _alimiter_sp(x, sample_rate: float, mesh: Mesh, axis: str,
                 limit: float = None, attack_ms: float = None,
                 release_ms: float = None):
    """ops.limiter.alimiter_compat on a time-sharded track — EXACT.

    Each tangent piece's (max, x) scan gets the unrolled cross-shard
    boundary carry: release pieces carry left-to-right
    (c_s = max_{j<s} rho^((s-1-j)·Ln) e_j over all-gathered zero-state
    shard ends e_j), attack pieces the mirrored right-to-left form. The
    depth combine, gain, and auto-level scale are memoryless."""
    sr = float(sample_rate)
    limit = C.LIMITER_CEILING if limit is None else limit
    attack_ms = C.LIMITER_ATTACK_MS if attack_ms is None else attack_ms
    release_ms = C.LIMITER_RELEASE_MS if release_ms is None else release_ms
    A = max(int(round(attack_ms * sr / 1000.0)), 1)
    R = max(release_ms * sr / 1000.0, 1.0)
    pieces_r = _wedge_pieces(R)
    pieces_a = _wedge_pieces(float(A))
    scale = 1.0 / limit                      # auto-level, level_in/out = 1
    ndev = mesh.shape[axis]
    if ndev == 1:
        # one shard: no cross-shard piece carries — run the fused
        # single-chip stage (one Pallas pass per direction instead of
        # 12 separate scans + carry machinery). Outside shard_map: a
        # pallas_call's ShapeDtypeStruct outputs trip check_vma inside
        # one, and at a single device GSPMD needs no manual sharding.
        from ame_tpu.ops.limiter import alimiter_compat
        return alimiter_compat(x, sr, limit=limit, attack_ms=attack_ms,
                               release_ms=release_ms)

    def local(xl):
        dt = xl.dtype
        Ln = xl.shape[0]
        sidx = lax.axis_index(axis)
        j = jnp.arange(ndev)
        karr = jnp.arange(1, Ln + 1, dtype=dt)
        peak = jnp.max(jnp.abs(xl), axis=1)
        dep = jnp.maximum(0.0, 1.0 - limit / jnp.maximum(peak, 1e-9))

        def scan_dir(u, rho, forward):
            uu = u if forward else jnp.flip(u)
            s = release_scan(uu, jnp.asarray(rho, dt))
            es = lax.all_gather(s[-1], axis)             # [ndev]
            lr = math.log(max(rho, 1e-300))
            dist = (sidx - 1 - j) if forward else (j - 1 - sidx)
            mask = (j < sidx) if forward else (j > sidx)
            wgt = jnp.where(mask, jnp.exp(
                jnp.maximum(dist, 0).astype(dt) * (Ln * lr)), 0.0)
            carry = jnp.max(wgt * es)
            s = jnp.maximum(s, carry * jnp.exp(karr * lr))
            return s if forward else jnp.flip(s)

        d_rel = None
        for a, rho in pieces_r:
            s = scan_dir(dep * a, rho, True)
            d_rel = s if d_rel is None else jnp.minimum(d_rel, s)
        d_att = None
        for a, rho in pieces_a:
            s = scan_dir(dep * a, rho, False)
            d_att = s if d_att is None else jnp.minimum(d_att, s)
        gain = 1.0 - jnp.maximum(d_rel, d_att)
        return xl * (gain * scale)[:, None]

    fn = shard_map(local, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None))
    return fn(x)


# ---------------------------------------------------------------------------
# The full compat chain
# ---------------------------------------------------------------------------

def master_compat_sequence_parallel(x: jax.Array, sample_rate: float,
                                    settings, mesh: Mesh, axis: str = "sp",
                                    n_valid=None):
    """Master ONE [N, 2] track with reference-compat semantics, the time
    axis sharded over ``mesh``. Called by
    ``sp_master.master_sequence_parallel`` when ``mode == "compat"``.

    Requirements beyond the quality path: with ``compat_chunked`` each
    shard must own whole 30 s chunks (``local_n % chunk_len == 0`` — the
    Q6 resets are what make the DSP stages shard-local); unchunked compat
    runs the quirk EQ through the exact sp IIR and the whole-track exact
    pydub multiband through shard-level Jacobi carry relaxation
    (``_pydub_gain_sp``). With loudnorm on, the track must be >= 3.1 s
    (the controller's priming window)."""
    from ame_tpu.config import MasterSettings
    if isinstance(settings, dict):
        settings = MasterSettings.from_dict(settings)
    (mode, chunked, multiband_on, analog_on, width_on, lufs_on,
     mb_edges) = settings.structure_key()
    assert mode == "compat"
    if mb_edges is not None:
        raise ValueError("mb_edges (G-band multiband) is quality-mode "
                         "only; compat mode is pinned to the reference's "
                         "3-band stage")
    sr = float(sample_rate)
    ndev = mesh.shape[axis]
    n = x.shape[0]
    if n % ndev:
        raise ValueError(f"N={n} not divisible by {ndev} shards")
    local_n = n // ndev
    hop = int(round(0.100 * sr))
    if lufs_on:
        if local_n % hop:
            raise ValueError(
                f"shard length {local_n} must be a multiple of the 100 ms "
                f"hop ({hop} samples) when lufs is set")
        # the check must see the TRUE track length, not the padded buffer:
        # padding a 2 s track to the chunk granule would otherwise run the
        # full frame controller over zeros instead of matching the
        # single-chip short-track gain branch. Compat sp therefore takes
        # a CONCRETE n_valid (the quality path keeps traced lengths) —
        # the padded wrapper always passes a host int.
        if n_valid is not None and not isinstance(n_valid,
                                                  (int, np.integer)):
            raise ValueError("compat sequence-parallel mastering needs a "
                             "concrete (host int) n_valid; got a traced "
                             "value")
        nv_host = n if n_valid is None else int(n_valid)
        if nv_host < (LN.RING + 1) * hop:
            raise ValueError("compat loudnorm needs >= 3.1 s of audio "
                             "(the controller's priming window); use the "
                             "single-chip graph for short tracks")
    if (multiband_on and not chunked
            and local_n < int(_PYDUB_ATTACK_MS * sr / 1000.0)):
        raise ValueError(
            f"shards of {local_n} samples are shorter than the pydub "
            f"detector window; use the single-chip graph for tiny tracks")
    chunk_len = int(C.COMPAT_CHUNK_SECONDS * sr)
    if chunked and local_n % chunk_len:
        raise ValueError(
            f"shard length {local_n} must own whole "
            f"{C.COMPAT_CHUNK_SECONDS:g} s chunks ({chunk_len} samples) "
            f"in chunked compat mode (the Q6 resets make the stages "
            f"shard-local); pad to ndev*chunk_len or use "
            f"master_sequence_parallel_padded")
    shd = NamedSharding(mesh, P(axis, None))
    x = jax.device_put(jnp.asarray(x), shd)

    # Whole-chain cached programs (round 4): the chain used to run as
    # dozens of eager dispatches with fresh jit wrappers per call — a full
    # retrace + one accelerator round-trip per stage (~30 s/call over the
    # tunneled TPU). Now: ONE measure program + ONE finish program per
    # call, cached per (settings, shape, mesh). The single host scalar
    # sync between them is deliberate (the staged-graph pattern,
    # graph/chain.py): on linear-mode tracks (the common case) it skips
    # the dynamic controller AND a full-track K-weighting pass whose
    # results a traced jnp.where would compute and discard.
    key = (settings, sr, x.shape, str(x.dtype), mesh, axis)
    progs = _COMPAT_PROGRAMS.get(key)
    if progs is None:
        progs = _build_compat_programs(settings, sr, mesh, axis)
        _cache_put(_COMPAT_PROGRAMS, key, progs)

    if not lufs_on:
        return progs["pre_limit"](x), {}

    nv = jnp.asarray(nv_host, jnp.int32)
    xp, meas = progs["measure"](x, nv)
    flags = np.asarray(meas["flags"])        # ONE host sync: [silent, lin]
    silent_h = bool(flags[0])
    lin_h = bool(flags[1]) and not silent_h

    if silent_h:
        y = progs["finish_silent"](xp)       # quirk Q9 passthrough
        output_i, output_th = meas["input_i"], meas["input_thresh"]
    elif lin_h:
        y = progs["finish_linear"](xp, meas["gain_db"])
        output_i = meas["input_i"] + meas["gain_db"]
        output_th = meas["input_thresh"] + meas["gain_db"]
    else:
        y, output_i, output_th = progs["finish_dynamic"](
            xp, nv, {k: meas[k] for k in ("M0", "M1", "M2", "peak",
                                          "input_i", "input_thresh",
                                          "target_offset")})

    info = {"input_i": meas["input_i"], "input_lra": meas["input_lra"],
            "input_tp": meas["input_tp"],
            "input_thresh": meas["input_thresh"],
            "target_offset": meas["target_offset"],
            "linear_mode": meas["lin_ok"].astype(x.dtype),
            "gain_db": (meas["gain_db"] if lin_h
                        else jnp.zeros((), x.dtype)),
            "output_i": output_i, "output_thresh": output_th}
    return y, info


_COMPAT_PROGRAMS: dict = {}


def _build_compat_programs(settings, sr: float, mesh: Mesh, axis: str):
    """The compat sp chain as cached jitted programs: ``pre_limit`` (no
    loudnorm), or ``measure`` + one of three ``finish_*`` branch programs.
    Each is traced once per (settings, shape, mesh) and reused."""
    (_, chunked, multiband_on, analog_on, width_on, lufs_on,
     _) = settings.structure_key()
    chunk_len = int(C.COMPAT_CHUNK_SECONDS * sr)
    shd = NamedSharding(mesh, P(axis, None))

    def cs(a):
        return jax.lax.with_sharding_constraint(a, shd)

    def _pre(x):
        if chunked:
            return _pre_stages_chunked(
                x, settings, sr, chunk_len, mesh, axis,
                analog_on=analog_on, width_on=width_on,
                multiband_on=multiband_on)
        x = _pre_stages_unchunked(
            x, settings, sr, mesh, axis, shd, analog_on=analog_on,
            width_on=width_on)
        if multiband_on:
            x = _multiband_compat_sp(x, settings, sr, mesh, axis)
        return x

    progs = {}
    if not lufs_on:
        progs["pre_limit"] = jax.jit(
            lambda x: _alimiter_sp(_pre(x), sr, mesh, axis))
        return progs

    ln_kw = dict(sr=sr, target_i=float(settings.lufs),
                 target_tp=float(settings.target_tp),
                 target_lra=float(settings.target_lra),
                 mesh=mesh, axis=axis, shd=shd)

    def measure(x, nv):
        xp = _pre(x)
        return cs(xp), _loudnorm_measure(xp, nv, **ln_kw)

    # ffmpeg pass-2 writes pcm_s16le (graph/chain._stage_normalize), so
    # every finish branch requantizes before the alimiter
    def finish_silent(x):
        return _alimiter_sp(cs(quantize.int16_roundtrip(x)), sr, mesh,
                            axis)

    def finish_linear(x, gain_db):
        y = quantize.int16_roundtrip(x * 10.0 ** (gain_db / 20.0))
        return _alimiter_sp(cs(y), sr, mesh, axis)

    def finish_dynamic(x, nv, meas):
        y, oi, oth = _loudnorm_dynamic_apply(x, nv, meas, **ln_kw)
        y = _alimiter_sp(cs(quantize.int16_roundtrip(y)), sr, mesh, axis)
        return y, oi, oth

    progs["measure"] = jax.jit(measure)
    progs["finish_silent"] = jax.jit(finish_silent)
    progs["finish_linear"] = jax.jit(finish_linear)
    progs["finish_dynamic"] = jax.jit(finish_dynamic)
    return progs
