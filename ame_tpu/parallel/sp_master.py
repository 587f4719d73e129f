"""Sequence-parallel FULL mastering chain: one long track sharded over the
mesh time axis (SURVEY.md §5.7 taken to its conclusion — the reference
chunks 30 s segments through one CPU pipeline; here the WHOLE quality chain
runs on every chip simultaneously, each owning a contiguous slice of the
track, with the cross-shard couplings carried over ICI).

Per-stage parallelization (quality mode):

  * analog drive (tanh) / stereo width — memoryless, shard-local;
  * analog shelves + 4-band RBJ EQ — one host-designed SOS cascade through
    the EXACT sequence-parallel IIR (parallel/sequence.py: local zero-state
    scans + an all-gathered boundary-state carry + superposition
    correction, ~1.15x one chip's work);
  * loudness normalization — K-weighting via the same exact sp IIR; 100 ms
    hop energies reduce shard-locally and the tiny [n_hops] vector is
    all-gathered (GSPMD inserts the collective), after which the BS.1770
    gate math (ops.loudness._integrated_gate/_lra_gate — the same code the
    single-chip path and the ffmpeg golden tests run) is replicated;
  * multiband compression — per-band cascades through the exact sp IIR,
    shard-local RMS detector with a left halo, release scan with an EXACT
    all-gathered (max, x) boundary carry, attack one-pole through the sp
    IIR again (_multiband_sp; 3-band or mb_edges G-band);
  * true peak — per-shard 4x tile-matmul oversampling (ops.loudness tile
    matrix) with a 128-sample left halo ppermuted from the neighbor, then
    a pmax. Exact: the interpolation FIR is causal with 128 taps.
  * lookahead limiter — per-shard with ppermuted halos: a left warm-up
    halo (release-scan state converges as rho^h: 1 s at the 50 ms release
    is ~e^-20) and a right lookahead halo (2x the 5 ms attack window).
    Everything else in the chain is exact; the limiter is exact up to that
    e^-20-class warm-up term.

Communication volume is independent of track length: one [ndev, k, C, 2]
carry gather per IIR cascade, one [n_hops] gather, two edge-halo
ppermutes. Use for tracks too long (or too latency-critical) for one chip;
for many normal tracks use parallel/batch.py (data parallel — zero
communication).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # jax < 0.6
    from jax.experimental.shard_map import shard_map

from ame_tpu import config as C
from ame_tpu.dsp import design
from ame_tpu.ops import loudness as L
from ame_tpu.parallel.sequence import sosfilt_sequence_parallel


def _pre_cascade_sos(s, sample_rate: float) -> np.ndarray:
    """Host-designed SOS for the LTI part of the pre stage: analog shelves
    (when analog_character > 0) followed by the 4-band quality EQ. Same RBJ
    designs as the in-graph traced coefficients (ops/eq.py), evaluated in
    float64 on the host — legal here because sp mastering takes CONCRETE
    settings (a recompile per settings change is acceptable for the
    long-track use case; the single-chip graph keeps traced coefficients
    precisely to avoid that)."""
    fs = float(sample_rate)
    sections = []
    if s.analog_character:
        factor = float(s.analog_character) / 100.0
        sections.append(design.rbj_low_shelf(
            C.ANALOG_LOW_SHELF_HZ, fs, factor * 1.0, 0.7071))
        sections.append(design.rbj_high_shelf(
            C.ANALOG_HIGH_SHELF_HZ, fs, factor * 1.5, 0.7071))
    sections.append(design.rbj_low_shelf(
        C.BASS_SHELF_HZ, fs, float(s.bass_boost), 0.7071))
    sections.append(design.rbj_peaking(
        C.MID_PEAK_HZ, fs, -float(s.mid_cut), 1.41))
    sections.append(design.rbj_peaking(
        C.PRESENCE_PEAK_HZ, fs, float(s.presence_boost), 1.41))
    sections.append(design.rbj_high_shelf(
        C.TREBLE_SHELF_HZ, fs, float(s.treble_boost), 0.7071))
    return np.concatenate(sections)  # each designer returns a [1, 6] row


def _left_halo(xl, h: int, axis: str):
    """[h, C] tail of the LEFT neighbor's shard (zeros for shard 0)."""
    ndev = jax.lax.axis_size(axis)
    tail = xl[-h:]
    if ndev == 1:
        return jnp.zeros_like(tail)
    recv = jax.lax.ppermute(tail, axis,
                            [(i, (i + 1) % ndev) for i in range(ndev)])
    idx = jax.lax.axis_index(axis)
    return jnp.where(idx == 0, jnp.zeros_like(recv), recv)


def _right_halo(xl, h: int, axis: str):
    """[h, C] head of the RIGHT neighbor's shard (zeros for the last)."""
    ndev = jax.lax.axis_size(axis)
    head = xl[:h]
    if ndev == 1:
        return jnp.zeros_like(head)
    recv = jax.lax.ppermute(head, axis,
                            [(i, (i - 1) % ndev) for i in range(ndev)])
    idx = jax.lax.axis_index(axis)
    return jnp.where(idx == ndev - 1, jnp.zeros_like(recv), recv)


def _true_peak_sharded(x, mesh: Mesh, axis: str, n_valid=None):
    """Exact global 4x-oversampled true peak of time-sharded [N, C].
    ``n_valid`` (traced scalar) masks interpolants and samples of trailing
    zero padding, matching the single-chip measurement of the unpadded
    track."""
    Lb = L._TP_LB
    M = jnp.asarray(L._tp_tile_matrix(), jnp.bfloat16)
    if n_valid is None:
        n_valid = x.shape[0]
    n_valid = jnp.asarray(n_valid, jnp.int32)

    def local_fn(xl, nv):
        n, c = xl.shape
        base = jax.lax.axis_index(axis).astype(jnp.int32) * n
        halo = _left_halo(xl, Lb, axis)
        nb = -(-n // Lb)
        ext = jnp.concatenate([halo, jnp.pad(xl, ((0, nb * Lb - n),
                                                  (0, 0)))])
        xt = ext.reshape(nb + 1, Lb, c)
        xcat = jnp.concatenate([xt[:-1], xt[1:]], axis=1)  # [nb, 2Lb, C]
        out = jnp.einsum("vu,buc->bvc", M, xcat.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        t_in_tile = jnp.arange(M.shape[0]) % Lb
        pos = jnp.arange(nb)[:, None] * Lb + t_in_tile[None, :]
        local_end = jnp.minimum(nv[0] - base, n)
        valid = (pos < local_end)[:, :, None]
        samp_ok = (jnp.arange(n) < local_end)[:, None]
        peak = jnp.maximum(
            jnp.max(jnp.where(valid, jnp.abs(out), 0.0)),
            jnp.max(jnp.where(samp_ok, jnp.abs(xl), 0.0)))
        return jax.lax.pmax(peak, axis)[None]

    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(P(axis, None), P()),
                   out_specs=P(axis))
    return fn(x, n_valid[None])[0]


def _limiter_sharded(x, sample_rate: float, mesh: Mesh, axis: str,
                     halo_s: float):
    """Lookahead limiter on time-sharded [N, C]: each shard limits
    (left warm-up halo | local | right lookahead halo) and keeps the local
    span. Left halo warm-up bounds the release-state mismatch by
    rho^(halo - attack) ~ e^-20 at the defaults."""
    from ame_tpu.ops.limiter import _limiter_jit
    import math

    attack = max(int(C.LIMITER_ATTACK_MS * sample_rate / 1000.0), 1)
    local_n = x.shape[0] // mesh.shape[axis]
    halo_l = min(max(int(halo_s * sample_rate), 4 * attack), local_n)
    halo_r = min(2 * attack, local_n)
    decay = math.exp(-1.0 / (C.LIMITER_RELEASE_MS * sample_rate / 1000.0))

    ndev = mesh.shape[axis]

    def local_fn(xl):
        if ndev == 1:
            # halos would be zeros: a zero left warm-up is exactly the
            # fresh limiter state, and zero right lookahead matches the
            # single-chip end-of-track behavior — run the track directly
            y, _ = _limiter_jit(xl, attack, xl.shape[0],
                                jnp.asarray(C.LIMITER_CEILING, xl.dtype),
                                jnp.asarray(decay, xl.dtype))
            return y
        ext = jnp.concatenate([_left_halo(xl, halo_l, axis), xl,
                               _right_halo(xl, halo_r, axis)])
        y_ext, _ = _limiter_jit(ext, attack, ext.shape[0],
                                jnp.asarray(C.LIMITER_CEILING, xl.dtype),
                                jnp.asarray(decay, xl.dtype))
        return y_ext[halo_l:halo_l + xl.shape[0]]

    fn = shard_map(local_fn, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None))
    return fn(x)


def _multiband_params(settings, sample_rate: float):
    """Band cascades + per-band (threshold, ratio) tuples for the sp
    multiband stage. 3-band default uses the SAME uncompensated cascades
    as graph/multiband.quality_band_split (exact single-chip parity);
    mb_edges routes to the allpass-compensated G-band tree."""
    fs = float(sample_rate)
    if settings.mb_edges is not None:
        from ame_tpu.graph.multiband import _band_cascades_n
        cascades = _band_cascades_n(fs, settings.mb_edges)
        G = len(cascades)
        th = settings.mb_thresholds or (-20.0,) * G
        ra = settings.mb_ratios or (3.0,) * G
        return cascades, tuple(th), tuple(ra)
    lo = design.linkwitz_riley_sos(4, C.MB_LOW_CROSSOVER_HZ, "lowpass", fs)
    lo_hp = design.linkwitz_riley_sos(4, C.MB_LOW_CROSSOVER_HZ, "highpass",
                                      fs)
    hi_lp = design.linkwitz_riley_sos(4, C.MB_HIGH_CROSSOVER_HZ, "lowpass",
                                      fs)
    hi_hp = design.linkwitz_riley_sos(4, C.MB_HIGH_CROSSOVER_HZ, "highpass",
                                      fs)
    cascades = [lo, np.concatenate([lo_hp, hi_lp]),
                np.concatenate([lo_hp, hi_hp])]
    th = (settings.low_thresh, settings.mid_thresh, settings.high_thresh)
    ra = (settings.low_ratio, settings.mid_ratio, settings.high_ratio)
    return cascades, th, ra


def _multiband_sp(x, sample_rate: float, settings, mesh: Mesh, axis: str,
                  shd):
    """Quality multiband compression on a time-sharded track — exact:

      * band split: per-band SOS cascades through the exact sp IIR;
      * RMS detector: shard-local moving mean with a (rms_w - 1)-sample
        left halo and the global start-clipped divisor;
      * release scan: shard-local (max, x) Kogge-Stone + an EXACT
        cross-shard carry — per-shard zero-state end values are
        all-gathered and every shard takes max_j decay^((s-1-j)*Ln) e_j,
        the unrolled boundary recurrence;
      * attack one-pole: the exact sp IIR again (superposition carry);
      * gain apply + band recombination: memoryless, shard-local.

    Matches ops.compressor.compress_quality_multi to f32 reduction order.
    """
    import math
    from ame_tpu.ops import window as W

    cascades, th, ra = _multiband_params(settings, sample_rate)
    G = len(cascades)
    ndev = mesh.shape[axis]
    local_n = x.shape[0] // ndev
    rms_w = max(int(C.MB_RMS_MS * sample_rate / 1000.0), 1)
    rel_decay = math.exp(-1.0 / (C.MB_RELEASE_MS * sample_rate / 1000.0))
    a_att = math.exp(-1.0 / (C.MB_ATTACK_MS * sample_rate / 1000.0))

    if ndev == 1:
        # one shard: no cross-shard carry exists, so the band split runs
        # as ONE fused MXU bank contraction (the same engine the
        # single-chip graph uses) instead of G separate sp IIR passes
        from ame_tpu.ops.tile_conv import sosfilt_tileconv_bank
        bands = list(sosfilt_tileconv_bank(cascades, x))
    else:
        bands = [sosfilt_sequence_parallel(sos_g, x, mesh, axis)
                 for sos_g in cascades]

    th_a = np.asarray(th, np.float32).reshape(1, G)
    ra_a = np.asarray(ra, np.float32).reshape(1, G)

    def _detect_release(*bl):
        dt = bl[0].dtype
        sq = jnp.stack([jnp.mean(b * b, axis=1) for b in bl], axis=1)
        # windowed mean with left halo; shard 0's zero halo IS the global
        # start clip, and the divisor uses the global sample index
        halo = _left_halo(sq, rms_w - 1, axis) if rms_w > 1 else sq[:0]
        ssum = W.moving_sum_past(jnp.concatenate([halo, sq]), rms_w)
        ssum = ssum[rms_w - 1:] if rms_w > 1 else ssum
        gidx = (jax.lax.axis_index(axis) * local_n
                + jnp.arange(local_n, dtype=jnp.int32))
        count = jnp.minimum(gidx + 1, rms_w).astype(dt)
        level_db = 10.0 * jnp.log10(
            jnp.maximum(ssum / count[:, None], 1e-12))
        over = jnp.maximum(level_db - jnp.asarray(th_a, dt), 0.0)
        gr = over * (1.0 - 1.0 / jnp.asarray(ra_a, dt))
        # shard-local release scan + exact cross-shard (max, x) carry
        y_loc = W.release_scan(gr, rel_decay)
        if ndev == 1:
            return y_loc  # the inbound carry is identically zero
        es = jax.lax.all_gather(y_loc[-1], axis)            # [S, G]
        s_idx = jax.lax.axis_index(axis)
        j = jnp.arange(ndev)
        expo = jnp.maximum((s_idx - 1 - j).astype(dt), 0.0) * local_n
        wgt = jnp.where(j < s_idx,
                        jnp.exp(expo * math.log(rel_decay)), 0.0)
        carry = jnp.max(wgt[:, None] * es, axis=0)          # [G]
        kpow = jnp.exp((jnp.arange(local_n, dtype=dt) + 1.0)
                       * math.log(rel_decay))
        return jnp.maximum(y_loc, carry[None, :] * kpow[:, None])

    fn = shard_map(_detect_release, mesh=mesh,
                   in_specs=tuple(P(axis, None) for _ in bands),
                   out_specs=P(axis, None))
    gr_rel = fn(*bands)

    # attack smoother: one-pole y = (1-a) u + a y_{-1} over the exact sp IIR
    att_sos = np.array([[1.0 - a_att, 0.0, 0.0, 1.0, -a_att, 0.0]])
    gr_smooth = sosfilt_sequence_parallel(att_sos, gr_rel, mesh, axis)

    gains = 10.0 ** (-gr_smooth / 20.0)
    out = bands[0] * gains[:, 0][:, None]
    for g in range(1, G):
        out = out + bands[g] * gains[:, g][:, None]
    return jax.lax.with_sharding_constraint(out, shd)


def _quality_body(x, n_valid, *, settings, sample_rate, mesh, axis,
                  limiter_halo_s):
    """The whole quality sp chain as ONE traced body (jitted + cached by
    ``master_sequence_parallel``). Round-4 fix: the chain used to run as
    ~a dozen eager dispatches with fresh ``jax.jit(lambda ...)`` wrappers
    built per call — a full retrace per call plus one accelerator
    round-trip per stage, which measured ~30 s/call over the tunneled
    TPU (6x realtime, vs 29k x for the fused single-chip graph). Traced
    once and cached, the same math is one dispatch."""
    shd = NamedSharding(mesh, P(axis, None))

    def cs(a):
        return jax.lax.with_sharding_constraint(a, shd)

    hop = int(round(0.100 * sample_rate))
    lufs_on = settings.lufs is not None
    x = cs(x)

    sos_pre = _pre_cascade_sos(settings, sample_rate)
    info = {}

    # pre stage: drive (local) -> shelves+EQ (exact sp IIR) -> width (local)
    if settings.analog_character:
        drive = 1.0 + (float(settings.analog_character) / 100.0) * 0.5
        x = cs(jnp.tanh(x * drive))
    x = sosfilt_sequence_parallel(sos_pre, x, mesh, axis)
    if settings.width != 1.0:
        w = float(settings.width)
        mid = (x[:, 0] + x[:, 1]) * 0.5
        side = (x[:, 0] - x[:, 1]) * 0.5 * w
        x = cs(jnp.stack([mid + side, mid - side], axis=1))

    if settings.multiband or settings.mb_edges is not None:
        x = _multiband_sp(x, sample_rate, settings, mesh, axis, shd)

    if lufs_on:
        yk = sosfilt_sequence_parallel(
            design.k_weighting_sos(sample_rate), x, mesh, axis)
        # shard-local hop energies; the [n_hops] vector is tiny and
        # GSPMD all-gathers it for the replicated gate math
        sq = jnp.sum(yk * yk, axis=1)
        n_hops = sq.shape[0] // hop
        hs = jnp.sum(sq[: n_hops * hop].reshape(n_hops, hop), axis=1)
        nv = jnp.asarray(n_valid, jnp.int32)
        integrated, lra, rel_thresh = L.gated_stats_from_hops(
            hs, hop, nv, x.dtype)
        tp = 20.0 * jnp.log10(jnp.maximum(
            _true_peak_sharded(x, mesh, axis, n_valid), 1e-12))
        gain_db = jnp.asarray(float(settings.lufs), x.dtype) - integrated
        gain_db = jnp.where(jnp.isfinite(integrated), gain_db, 0.0)
        x = cs(x * 10.0 ** (gain_db / 20.0))
        info = {"input_i": integrated, "input_lra": lra, "input_tp": tp,
                "input_thresh": rel_thresh, "gain_db": gain_db,
                "output_i": integrated + gain_db,
                "linear_mode": jnp.ones((), x.dtype)}

    y = _limiter_sharded(x, sample_rate, mesh, axis, limiter_halo_s)
    return y, info


# Whole-chain program cache: (settings, sr, shape, dtype, mesh, axis, halo)
# -> jitted fn(x, n_valid). Bounded: a long-lived server sweeping settings
# must not hold unbounded compiled executables.
_QUALITY_PROGRAMS: dict = {}
_PROGRAM_CACHE_MAX = 64


def _cache_put(cache: dict, key, fn):
    if len(cache) >= _PROGRAM_CACHE_MAX:
        cache.pop(next(iter(cache)))
    cache[key] = fn


def master_sequence_parallel(x: jax.Array, sample_rate: float, settings,
                             mesh: Mesh, axis: str = "sp",
                             limiter_halo_s: float = 1.0, n_valid=None):
    """Master ONE [N, 2] track with the time axis sharded over ``mesh``.

    Quality mode only (compat's int16 requantization and pydub carries are
    single-chip constructs). Requirements: N divisible by the axis size,
    and — when loudness normalization is on — each shard divisible by the
    100 ms gating hop. Arbitrary lengths: zero-pad to those granules and
    pass the true length as ``n_valid`` (traced — no recompile per length;
    ``master_sequence_parallel_padded`` wraps this), which masks the
    loudness gate and true peak exactly like the single-chip path's
    bucket padding. Returns (y, info) with ``y`` sharded P(axis, None)
    and ``info`` matching ``ops.loudness.normalize_two_pass``.

    The whole chain is ONE cached jitted program per (settings, shape,
    mesh): repeated calls — the serving / bench / long-track common case —
    pay a single dispatch, no retracing.
    """
    from ame_tpu.config import MasterSettings
    if isinstance(settings, dict):
        settings = MasterSettings.from_dict(settings)
    if settings.mode == "compat":
        from ame_tpu.parallel.sp_compat import (
            master_compat_sequence_parallel)
        return master_compat_sequence_parallel(x, sample_rate, settings,
                                               mesh, axis=axis,
                                               n_valid=n_valid)
    if settings.mode != "quality":
        raise ValueError(f"unknown mode {settings.mode!r}")
    ndev = mesh.shape[axis]
    n = x.shape[0]
    if n % ndev:
        raise ValueError(f"N={n} not divisible by {ndev} shards")
    local_n = n // ndev
    hop = int(round(0.100 * sample_rate))
    lufs_on = settings.lufs is not None
    if lufs_on and local_n % hop:
        raise ValueError(
            f"shard length {local_n} must be a multiple of the 100 ms "
            f"gating hop ({hop} samples) when lufs is set")

    shd = NamedSharding(mesh, P(axis, None))
    x = jax.device_put(jnp.asarray(x), shd)

    key = (settings, float(sample_rate), x.shape, str(x.dtype), mesh, axis,
           float(limiter_halo_s))
    fn = _QUALITY_PROGRAMS.get(key)
    if fn is None:
        fn = jax.jit(partial(
            _quality_body, settings=settings,
            sample_rate=float(sample_rate), mesh=mesh, axis=axis,
            limiter_halo_s=float(limiter_halo_s)))
        _cache_put(_QUALITY_PROGRAMS, key, fn)
    # n_valid == n masks nothing — same math as the unmasked form, so one
    # program serves both; passing it traced keeps padded lengths
    # recompile-free.
    nv = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)
    return fn(x, nv)


def master_sequence_parallel_padded(x: jax.Array, sample_rate: float,
                                    settings, mesh: Mesh, axis: str = "sp",
                                    limiter_halo_s: float = 1.0):
    """Arbitrary-length front end for ``master_sequence_parallel``:
    zero-pads to the shard/hop granule, masks the measurement with
    ``n_valid``, and trims the output back to the input length (fetches
    implied — the result is a fully-replicated trim; for the sharded
    result use the core function directly)."""
    from ame_tpu.config import MasterSettings
    if isinstance(settings, dict):
        settings = MasterSettings.from_dict(settings)
    ndev = mesh.shape[axis]
    hop = int(round(0.100 * sample_rate))
    unit = hop if settings.lufs is not None else 1
    if settings.mode == "compat" and settings.compat_chunked:
        # chunked compat shards own whole 30 s chunks (Q6 resets make the
        # DSP stages shard-local); the chunk is a hop multiple
        unit = int(C.COMPAT_CHUNK_SECONDS * sample_rate)
    granule = ndev * unit
    n = x.shape[0]
    n_pad = -(-n // granule) * granule
    xp = jnp.pad(jnp.asarray(x), ((0, n_pad - n), (0, 0)))
    y, info = master_sequence_parallel(
        xp, sample_rate, settings, mesh, axis=axis,
        limiter_halo_s=limiter_halo_s, n_valid=n)
    return y[:n], info
