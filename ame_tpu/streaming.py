"""Streaming / low-latency mastering — a capability the reference lacks.

The scan engine's exact state handoff (``sosfilt_scan``'s scipy-layout
``zi``/``zf``, proven in tests/test_scan_iir.py) makes chunked processing
bit-consistent with the whole-track graph: a live input can be mastered in
small chunks with NO chunk-boundary artifacts — unlike the reference's 30 s
pipeline, which resets all filter state at every boundary (quirk Q6).

``StreamingMaster`` runs the QUALITY chain (analog character -> RBJ EQ ->
stereo width -> optional multiband compression -> static gain ->
lookahead limiter) incrementally:

  * every IIR stage carries its exact ``zi`` between chunks;
  * tanh/width/gain are stateless;
  * the multiband compressor (settings.multiband) carries crossover zi,
    the RMS detector's window history, the release envelope seed, and the
    attack smoother's zi — chunked output equals the offline
    ``multiband_quality`` stage with no added latency;
  * the lookahead limiter is re-derived in streaming form: the output lags
    the input by ``attack-1`` samples (the lookahead window), with the
    sliding-min/mean windows recomputed over a carried context so emitted
    gains match the offline ``lookahead_limiter`` exactly, and the release
    recursion seeded from the previous chunk's final state.

Two-pass loudness normalization is inherently offline; streaming accepts a
static ``gain_db`` instead (measure once, stream with the measured gain).

Typical use::

    sm = StreamingMaster(48000, {"bass_boost": 2.0, "width": 1.2})
    for chunk in capture():          # [n, 2] float32, n >= 2*attack
        play(sm.process(chunk))
    play(sm.flush())
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ame_tpu import config as C
from ame_tpu.config import MasterSettings
from ame_tpu.dsp import design
from ame_tpu.ops import window as W
from ame_tpu.ops.eq import _rbj_peaking_coeffs_jnp, _rbj_shelf_coeffs_jnp
from ame_tpu.ops.scan_iir import biquad_scan, sosfilt_scan
from ame_tpu.ops.stereo import stereo_width_quality


def _coerce_settings(settings):
    if settings is None:
        return MasterSettings()
    if not isinstance(settings, MasterSettings):
        settings = MasterSettings.from_dict(dict(settings))
    return settings


def _analog_sos(factor, sample_rate, dt):
    return jnp.stack([
        _rbj_shelf_coeffs_jnp(C.ANALOG_LOW_SHELF_HZ, sample_rate,
                              factor * 1.0, 0.7071, "low"),
        _rbj_shelf_coeffs_jnp(C.ANALOG_HIGH_SHELF_HZ, sample_rate,
                              factor * 1.5, 0.7071, "high"),
    ]).astype(dt)


def _eq_sos(p, sample_rate, dt, peak_q=1.41):
    return jnp.stack([
        _rbj_shelf_coeffs_jnp(C.BASS_SHELF_HZ, sample_rate,
                              p["bass"], 0.7071, "low"),
        _rbj_peaking_coeffs_jnp(C.MID_PEAK_HZ, sample_rate,
                                -p["mid_cut"], peak_q),
        _rbj_peaking_coeffs_jnp(C.PRESENCE_PEAK_HZ, sample_rate,
                                p["presence"], peak_q),
        _rbj_shelf_coeffs_jnp(C.TREBLE_SHELF_HZ, sample_rate,
                              p["treble"], 0.7071, "high"),
    ]).astype(dt)


def _mb_sos_np(sample_rate, mb_edges=None):
    """The crossover cascades as host numpy. Default: the 3-band split
    (identical composition to the offline tile-conv bank in
    graph/multiband.py: mid = LP4k∘HP250, high = HP4k∘HP250).
    ``mb_edges``: the G-band allpass-compensated LR4 tree (same cascades
    as the offline ``multiband_quality_n``)."""
    if mb_edges is not None:
        from ame_tpu.graph.multiband import _band_cascades_n
        return tuple(_band_cascades_n(sample_rate, tuple(mb_edges)))
    lo = design.linkwitz_riley_sos(4, C.MB_LOW_CROSSOVER_HZ, "lowpass",
                                   sample_rate)
    hp = design.linkwitz_riley_sos(4, C.MB_LOW_CROSSOVER_HZ, "highpass",
                                   sample_rate)
    lp4k = design.linkwitz_riley_sos(4, C.MB_HIGH_CROSSOVER_HZ, "lowpass",
                                     sample_rate)
    hp4k = design.linkwitz_riley_sos(4, C.MB_HIGH_CROSSOVER_HZ, "highpass",
                                     sample_rate)
    return (lo, np.concatenate([hp, lp4k]), np.concatenate([hp, hp4k]))


def _mb_stream(y, state, new_state, p, sr, mb_edges=None):
    """Streaming multiband compression (exact ops/compressor
    ``compress_quality_multi`` semantics, 3-band or G-band): crossover zi,
    detector-window history, release seed, and attack-smoother zi all
    carry across chunks, so the chunked result equals the offline stage
    bit-for-bit up to f32 scan rounding. Adds no latency (the quality
    compressor has no lookahead)."""
    n = y.shape[0]
    rms_w = max(int(C.MB_RMS_MS * sr / 1000.0), 1)
    bands = []
    for i, sos in enumerate(_mb_sos_np(sr, mb_edges)):
        b, new_state[f"zi_mb{i}"] = sosfilt_scan(sos, y,
                                                 zi=state[f"zi_mb{i}"])
        bands.append(b)
    sq = jnp.stack([jnp.mean(b * b, axis=1) for b in bands], axis=1)
    seq = jnp.concatenate([state["mb_sq_hist"], sq], axis=0)
    s = W.moving_sum_past(seq, rms_w)[rms_w - 1:]
    count = jnp.minimum(state["mb_n_seen"] + jnp.arange(n) + 1.0,
                        float(rms_w))
    level_db = 10.0 * jnp.log10(jnp.maximum(s / count[:, None], 1e-12))
    over = jnp.maximum(level_db - p["threshs"][None, :], 0.0)
    gr_db = over * (1.0 - 1.0 / p["ratios"][None, :])
    rel = jnp.asarray(math.exp(-1.0 / (C.MB_RELEASE_MS * sr / 1000.0)),
                      y.dtype)
    gr_rel = W.release_scan(
        jnp.concatenate([state["mb_u_prev"][None], gr_db], axis=0), rel)[1:]
    a = math.exp(-1.0 / (C.MB_ATTACK_MS * sr / 1000.0))
    coeffs = jnp.array([1.0 - a, 0.0, 0.0, 1.0, -a, 0.0], y.dtype)
    gr_smooth, new_state["mb_zi_att"] = biquad_scan(gr_rel, coeffs,
                                                    zi=state["mb_zi_att"])
    gains = 10.0 ** (-gr_smooth / 20.0)
    new_state["mb_sq_hist"] = seq[seq.shape[0] - (rms_w - 1):]
    new_state["mb_n_seen"] = state["mb_n_seen"] + n
    new_state["mb_u_prev"] = gr_rel[-1]
    return sum(bands[g] * gains[:, g][:, None] for g in range(len(bands)))


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _stream_step(x, state, p, sr, A, phase, structure):
    """One streaming step. phase: 'first' | 'steady' | 'flush'.

    Filters advance their zi exactly; the limiter recomputes its windows
    over [past(A-1) | pend(A-1) | new] context and emits every sample whose
    lookahead window is complete.
    """
    analog_on, width_on, multiband_on, mb_edges = structure

    new_state = dict(state)
    if phase != "flush":
        y = x
        if analog_on:
            factor = p["analog"] / 100.0
            y = jnp.tanh(y * (1.0 + factor * 0.5))
            y, new_state["zi_a"] = sosfilt_scan(
                _analog_sos(factor, sr, y.dtype), y, zi=state["zi_a"])
        y, new_state["zi_e"] = sosfilt_scan(
            _eq_sos(p, sr, y.dtype), y, zi=state["zi_e"])
        if width_on:
            y = stereo_width_quality(y, p["width"])
        if multiband_on:
            y = _mb_stream(y, state, new_state, p, sr, mb_edges)
        y = y * 10.0 ** (p["gain_db"] / 20.0)
    else:
        y = x
    return _limiter_tail(y, state, new_state, sr, A, phase)


def _limiter_tail(y, state, new_state, sr, A, phase):
    """Streaming lookahead-limiter block shared by the quality and compat
    streamers: carries past/pend context + release state so emitted gains
    match the offline ``lookahead_limiter`` exactly."""
    rho = jnp.asarray(math.exp(-1.0 / (0.05 * sr)), jnp.float32)
    ceiling = jnp.asarray(C.LIMITER_CEILING, jnp.float32)
    if phase == "first":
        z = y
    elif phase == "flush":
        z = jnp.concatenate([state["past"], state["pend"]], axis=0)
    else:
        z = jnp.concatenate([state["past"], state["pend"], y], axis=0)

    L = z.shape[0]
    P = 0 if phase == "first" else A - 1

    peak = jnp.max(jnp.abs(z), axis=1)
    g_t = jnp.minimum(1.0, ceiling / jnp.maximum(peak, 1e-9))
    g_a = W.sliding_min_ahead(g_t, A)
    g_r = W.moving_mean_past(g_a, A)

    e1 = L if phase == "flush" else L - A + 1  # emit z[P : e1]
    # release recursion seeded from the previous emitted sample's state by
    # prepending it as a virtual element (y[-1] = u_prev exactly)
    seg = jnp.concatenate([state["u_prev"][None], 1.0 - g_r[P:e1]])
    u = W.release_scan(seg, rho)[1:]
    y_out = z[P:e1] * (1.0 - u)[:, None]

    new_state["u_prev"] = u[-1] if u.shape[0] else state["u_prev"]
    if phase != "flush":
        new_state["pend"] = z[L - A + 1:]
        new_state["past"] = z[L - 2 * A + 2:L - A + 1]
    return y_out, new_state


class StreamingMaster:
    """Incremental quality-chain mastering with exact chunk handoff.

    settings: MasterSettings or reference settings dict (quality fields:
    analog_character, bass/mid/presence/treble, width). ``lufs`` is ignored
    (two-pass normalization is offline); pass ``gain_db`` instead.

    ``process(chunk)`` takes [n, 2] float32 with n >= 2*attack_samples and
    returns the samples whose lookahead completed (n per call in steady
    state; the stream lags by ``latency_samples``). ``flush()`` drains the
    tail. Chunk sizes may vary; each distinct size compiles once.
    """

    def __init__(self, sample_rate: float, settings=None,
                 gain_db: float = 0.0):
        settings = _coerce_settings(settings)
        self.sample_rate = float(sample_rate)
        self.attack = max(int(C.LIMITER_ATTACK_MS * sample_rate / 1000.0), 1)
        mb_edges = (tuple(float(e) for e in settings.mb_edges)
                    if settings.mb_edges is not None else None)
        multiband_on = bool(settings.multiband) or mb_edges is not None
        self._structure = (settings.analog_character != 0,
                           settings.width != 1.0, multiband_on, mb_edges)
        if mb_edges is not None:
            G = len(mb_edges) + 1
            threshs = settings.mb_thresholds or (-20.0,) * G
            ratios = settings.mb_ratios or (3.0,) * G
        else:
            threshs = (settings.low_thresh, settings.mid_thresh,
                       settings.high_thresh)
            ratios = (settings.low_ratio, settings.mid_ratio,
                      settings.high_ratio)
        self._p = {
            "analog": jnp.float32(settings.analog_character),
            "bass": jnp.float32(settings.bass_boost),
            "mid_cut": jnp.float32(settings.mid_cut),
            "presence": jnp.float32(settings.presence_boost),
            "treble": jnp.float32(settings.treble_boost),
            "width": jnp.float32(settings.width),
            "gain_db": jnp.float32(gain_db),
            "threshs": jnp.asarray(threshs, jnp.float32),
            "ratios": jnp.asarray(ratios, jnp.float32),
        }
        A = self.attack
        self._state = {
            "zi_a": jnp.zeros((2, 2, 2), jnp.float32),
            "zi_e": jnp.zeros((4, 2, 2), jnp.float32),
            "past": jnp.zeros((A - 1, 2), jnp.float32),
            "pend": jnp.zeros((A - 1, 2), jnp.float32),
            "u_prev": jnp.zeros((), jnp.float32),
        }
        if multiband_on:
            rms_w = max(int(C.MB_RMS_MS * sample_rate / 1000.0), 1)
            cascades = _mb_sos_np(self.sample_rate, mb_edges)
            G = len(cascades)
            for i, sos in enumerate(cascades):
                self._state[f"zi_mb{i}"] = jnp.zeros(
                    (np.asarray(sos).shape[0], 2, 2), jnp.float32)
            self._state.update({
                "mb_sq_hist": jnp.zeros((rms_w - 1, G), jnp.float32),
                "mb_n_seen": jnp.zeros((), jnp.float32),
                "mb_u_prev": jnp.zeros((G,), jnp.float32),
                "mb_zi_att": jnp.zeros((G, 2), jnp.float32),
            })
        self._first = True
        self._done = False

    @property
    def latency_samples(self) -> int:
        return self.attack - 1

    def process(self, chunk) -> np.ndarray:
        if self._done:
            raise RuntimeError("stream already flushed")
        x = jnp.asarray(chunk, jnp.float32)
        if x.ndim != 2 or x.shape[1] != 2:
            raise ValueError("chunk must be [n, 2]")
        if x.shape[0] < 2 * self.attack:
            raise ValueError(
                f"chunk must be >= {2 * self.attack} samples "
                f"(2x the limiter lookahead)")
        phase = "first" if self._first else "steady"
        self._first = False
        y, self._state = _stream_step(x, self._state, self._p,
                                      self.sample_rate, self.attack, phase,
                                      self._structure)
        return np.asarray(y)

    def flush(self) -> np.ndarray:
        """Emit the final ``latency_samples`` samples (end-clipped lookahead,
        matching the offline limiter's track-end behavior)."""
        if self._done or self._first:
            self._done = True
            return np.zeros((0, 2), np.float32)
        self._done = True
        y, self._state = _stream_step(
            jnp.zeros((0, 2), jnp.float32), self._state, self._p,
            self.sample_rate, self.attack, "flush", self._structure)
        return np.asarray(y)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _limiter_step(y, state, sr, A, phase):
    """Limiter-only streaming step (compat streamer: the block DSP runs in
    the stage jits; only the limiter carries cross-block state)."""
    return _limiter_tail(y, state, dict(state), sr, A, phase)


class StreamingCompatMaster:
    """Streaming mastering with the REFERENCE's semantics: input is cut
    into 30 s blocks and each block runs the compat chain with fresh
    filter/compressor state (quirk Q6, audio_mastering_engine.py:178,
    185-204) and per-stage int16 requantization (Q5), while the final
    lookahead limiter runs CONTINUOUSLY across blocks exactly like the
    reference's whole-track alimiter pass (engine:223).

    Two-pass loudnorm is inherently offline; pass ``gain_db`` instead
    (applied before the limiter, then requantized like loudnorm pass-2's
    pcm_s16le output when nonzero). Latency is one 30 s block plus the
    limiter lookahead — this mode exists for parity/regression use, not
    low latency; ``StreamingMaster`` is the low-latency product path.

    ``process(chunk)`` accepts [n, 2] float32 of ANY size (internally
    buffered to blocks) and returns whatever samples completed; ``flush``
    processes the final partial block and drains the limiter."""

    def __init__(self, sample_rate: float, settings=None,
                 gain_db: float = 0.0):
        settings = _coerce_settings(settings)
        if settings.mb_edges is not None:
            raise ValueError("mb_edges (G-band multiband) is quality-mode "
                             "only; compat streaming is pinned to the "
                             "reference's 3-band stage")
        self.sample_rate = float(sample_rate)
        self.block_len = int(C.COMPAT_CHUNK_SECONDS * sample_rate)
        self.attack = max(int(C.LIMITER_ATTACK_MS * sample_rate / 1000.0), 1)
        self._s = settings
        self._gain = float(gain_db)
        from ame_tpu.graph.chain import params_from_settings
        self._p = params_from_settings(settings)
        from ame_tpu.ops.limiter import alimiter_stream_init
        self._state = alimiter_stream_init(
            sample_rate, C.LIMITER_CEILING, C.LIMITER_ATTACK_MS,
            C.LIMITER_RELEASE_MS)
        self._chunks: list[np.ndarray] = []   # pending input, in order
        self._buffered = 0
        self._done = False

    @property
    def latency_samples(self) -> int:
        return self.block_len + self._state["hold"]

    def _run_block(self, block: jax.Array) -> jax.Array:
        """One 30 s (or final partial) block through the compat DSP with
        fresh state — graph/chain.py's stage jits with chunk_len=None."""
        from ame_tpu.graph import chain as G
        from ame_tpu.ops import quantize
        s, p = self._s, self._p
        y = block
        if s.analog_character > 0:
            y = G._stage_analog_compat(y, p["analog"], self.sample_rate,
                                       None)
        y = G._stage_eq_width_compat(y, p["bass"], p["mid_cut"],
                                     p["presence"], p["treble"],
                                     self.sample_rate, None,
                                     s.width != 1.0, p["width"])
        if s.multiband:
            y = G._stage_multiband_compat(y, p["threshs"], p["ratios"],
                                          self.sample_rate, True, None)
        if self._gain != 0.0:
            y = quantize.int16_roundtrip(y * 10.0 ** (self._gain / 20.0))
        return y

    def _emit(self, y: jax.Array, flush: bool = False) -> np.ndarray:
        from ame_tpu.ops.limiter import alimiter_stream_step
        out, self._state = alimiter_stream_step(y, self._state, flush=flush)
        return np.asarray(out)

    def _take(self, n: int) -> np.ndarray:
        """Pop exactly n buffered samples (one concatenate per block
        instead of one per pushed chunk)."""
        parts, got = [], 0
        while got < n:
            c = self._chunks.pop(0)
            take = min(n - got, c.shape[0])
            parts.append(c[:take])
            if take < c.shape[0]:
                self._chunks.insert(0, c[take:])
            got += take
        self._buffered -= n
        return np.concatenate(parts, axis=0)

    def process(self, chunk) -> np.ndarray:
        if self._done:
            raise RuntimeError("stream already flushed")
        x = np.asarray(chunk, np.float32)
        if x.ndim != 2 or x.shape[1] != 2:
            raise ValueError("chunk must be [n, 2]")
        if x.shape[0]:
            self._chunks.append(x)
            self._buffered += x.shape[0]
        outs = []
        while self._buffered >= self.block_len:
            block = self._take(self.block_len)
            outs.append(self._emit(self._run_block(jnp.asarray(block))))
        if not outs:
            return np.zeros((0, 2), np.float32)
        return np.concatenate(outs, axis=0)

    def flush(self) -> np.ndarray:
        if self._done:
            return np.zeros((0, 2), np.float32)
        self._done = True
        if self._buffered:
            tail = self._run_block(jnp.asarray(self._take(self._buffered)))
        else:
            tail = jnp.zeros((0, 2), jnp.float32)
        return self._emit(tail, flush=True)
