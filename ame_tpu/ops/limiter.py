"""Lookahead peak limiter — replaces ffmpeg ``alimiter`` (SURVEY.md N4).

The reference always runs ``alimiter=level_in=1:level_out=1:limit=0.98:
attack=5:release=50`` as the final stage (audio_mastering_engine.py:223,
quirk Q8). This kernel provides the same contract — true hard ceiling at
``limit`` with a 5 ms anticipatory ramp and 50 ms smooth release — built
entirely from associative primitives:

  1. instantaneous target  g_t[n] = min(1, ceiling / peak[n])
  2. lookahead             g_a[n] = min over the NEXT ``attack`` window
                           (sliding-min-ahead, van Herk block scans)
  3. attack ramp           g_r[n] = mean over the PAST ``attack`` window
                           — every term of the mean is <= g_t[n] by (2),
                           so the ceiling guarantee survives smoothing
  4. release               1 - g[n] = max(1 - g_r[n], rho * (1 - g[n-1]))
                           — (×, max)-semiring scan, exponential recovery

Offline whole-track formulation: the gain is *anticipatory* rather than
delayed, so (unlike ffmpeg's streaming alimiter) the output is sample-
aligned with the input — no attack-length latency to trim. The spectral
behavior (no overshoot, ~5 ms ramp, 50 ms release) matches the alimiter
parameter contract; exact sample parity with ffmpeg's internal ramp logic
is not claimed (SURVEY.md §7.4 item 5: derive from behavior).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ame_tpu.ops import window as W


@partial(jax.jit, static_argnums=(1, 2))
def _limiter_jit(x, attack_samples, _n, ceiling, release_decay):
    peak = jnp.max(jnp.abs(x), axis=1)  # linked channels
    g_t = jnp.minimum(1.0, ceiling / jnp.maximum(peak, 1e-9))
    g_a = W.sliding_min_ahead(g_t, attack_samples)
    g_r = W.moving_mean_past(g_a, attack_samples)
    u = W.release_scan(1.0 - g_r, release_decay)
    gain = 1.0 - u
    return x * gain[:, None], gain


def lookahead_limiter(x: jax.Array, sample_rate: float,
                      ceiling: float = 0.98, attack_ms: float = 5.0,
                      release_ms: float = 50.0,
                      return_gain: bool = False):
    """Limit ``x`` [N, C] to +-ceiling. Gain is linked across channels."""
    attack_samples = max(int(attack_ms * sample_rate / 1000.0), 1)
    release_decay = math.exp(-1.0 / (release_ms * sample_rate / 1000.0))
    y, gain = _limiter_jit(x, attack_samples, x.shape[0],
                           jnp.asarray(ceiling, x.dtype),
                           jnp.asarray(release_decay, x.dtype))
    return (y, gain) if return_gain else y


# ---------------------------------------------------------------------------
# ffmpeg-contract alimiter (compat engine)
# ---------------------------------------------------------------------------
#
# ffmpeg's alimiter plans LINEAR gain ramps: descent reaching limit/peak
# exactly when each peak exits the `attack` lookahead buffer, ascent
# recovering fully in `release` seconds regardless of depth (slope
# (1-limit/peak)/(release*rate) of the governing peak), and by default
# (`level` option, on) scales the limited output by 1/limit back to full
# scale. The gain-depth envelope is therefore
#
#     d[n] = max_k  dep[k] * tent(n - k),     dep[k] = max(0, 1-limit/pk[k])
#
# with tent(m) = 1-|m|/A on the attack side (m<0) and 1-m/R on the release
# side — a (max, *) convolution with a fixed concave kernel. On TPU this is
# computed EXACTLY as ffmpeg does not: each wedge's log is concave, so it is
# the lower envelope of tangent lines, and each tangent line is a constant-
# decay (max, *) scan — the associative `release_scan` kernel. A handful of
# tangent pieces per side turns the O(N*W) planning loop into ~10 blocked
# Kogge-Stone scans. Every tangent lies ABOVE the wedge, so each piece scan
# upper-bounds the true depth envelope and their pointwise MIN does too:
# the ceiling guarantee survives the approximation (never less attenuation
# than the planner), with the gap bounded by the tangent spacing
# (tests/test_limiter.py pins the measured bound against the float64
# planner oracle in tests/oracles.py).

_WEDGE_FRACTIONS = (0.0, 0.3, 0.55, 0.75, 0.88, 0.95)


def _wedge_pieces(W: float):
    """(gain a_j, decay rho_j) tangent pieces of the linear wedge 1 - m/W
    in log space; min over the piece scans approximates the wedge max-conv."""
    out = []
    for fr in _WEDGE_FRACTIONS:
        mj = fr * W
        rho = math.exp(-1.0 / (W - mj))
        a = (1.0 - fr) * math.exp(mj / (W - mj))
        out.append((a, rho))
    return tuple(out)


# ---------------------------------------------------------------------------
# Fused wedge-envelope kernel: all P (max,×) piece scans of one direction in
# a single pass over the data (offline TPU path of _alimiter_depth)
# ---------------------------------------------------------------------------

_WEDGE_ROWS = 128          # tile rows (time-major: row = _WEDGE_LANES samples)
_WEDGE_LANES = 512
_WEDGE_MIN_N = 1 << 17     # below this the XLA scans win (no Mosaic compile)


def _wedge_env_kernel(u_ref, o_ref, c_ref, *, pieces, reverse):
    """One [R, L] tile: env = min_p a_p · scan_p(dep) for all P pieces,
    with per-piece cross-tile carries in SMEM. Row-major time: sample
    n = r·L + l; ``reverse`` runs the anticipatory (attack) direction —
    the caller feeds tiles in reversed grid order.

    All decay powers are STATIC (the wedge pieces are compile-time
    constants), precomputed in float64 — tighter than the run-time
    repeated squaring the blocked XLA scan uses."""
    import numpy as np
    R, L = _WEDGE_ROWS, _WEDGE_LANES

    @pl.when(pl.program_id(0) == 0)
    def _():
        for p in range(len(pieces)):
            c_ref[0, p] = 0.0

    u = u_ref[:]
    rid = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    eye = (rid == cid).astype(jnp.float32)
    # anti-diagonal: v @ J reverses a [1, R] lane vector
    rev = (rid + cid == R - 1).astype(jnp.float32)

    env = None
    for p, (a, rho) in enumerate(pieces):
        rho512 = float(np.float64(rho) ** L)
        Y = u
        # in-row zero-state Kogge-Stone (lanes)
        k = 1
        while k < L:
            c_k = jnp.float32(np.float64(rho) ** k)
            if reverse:
                sh = jnp.concatenate(
                    [Y[:, k:], jnp.zeros((R, k), jnp.float32)], axis=1)
            else:
                sh = jnp.concatenate(
                    [jnp.zeros((R, k), jnp.float32), Y[:, :L - k]], axis=1)
            Y = jnp.maximum(Y, c_k * sh)
            k *= 2
        # row-edge values -> [1, R] lane vector (MXU identity transpose)
        col = Y[:, 0:1] if reverse else Y[:, L - 1:L]
        e = jax.lax.dot_general(col, eye, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        if reverse:
            e = jax.lax.dot_general(e, rev, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
        # zero-state row prefix with decay rho^L (7 lane levels on [1, R])
        F = e
        k = 1
        while k < R:
            ck = jnp.float32(np.float64(rho512) ** k)
            F = jnp.maximum(F, ck * jnp.concatenate(
                [jnp.zeros((1, k), jnp.float32), F[:, :R - k]], axis=1))
            k *= 2
        # carry-in states per row: S[r] = max(F[r-1], c_in · rho512^r)
        # (powers from iota · static log — Pallas kernels cannot capture
        # array constants; exp rounding is ~1e-7 relative, far inside the
        # limiter's 1-LSB stream-parity budget)
        c_in = c_ref[0, p]
        lr512 = float(np.log(np.maximum(np.float64(rho512), 1e-300)))
        ridx = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1) \
            .astype(jnp.float32)
        rpow0 = jnp.exp(jnp.float32(lr512) * ridx)      # rho512^r, r=0..R-1
        S = jnp.maximum(
            jnp.concatenate([jnp.zeros((1, 1), jnp.float32), F[:, :R - 1]],
                            axis=1),
            c_in * rpow0)
        c_ref[0, p] = jnp.maximum(F[0, R - 1],
                                  c_in * jnp.float32(np.float64(rho512)
                                                     ** R))
        if reverse:
            S = jax.lax.dot_general(S, rev, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
        # back to [R, 1] and broadcast with the in-row decay powers
        Scol = jax.lax.dot_general(eye, S, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        lidx = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) \
            .astype(jnp.float32)
        lexp = (jnp.float32(L) - lidx) if reverse else (lidx + 1.0)
        lpow = jnp.exp(jnp.float32(math.log(rho)) * lexp)
        Yf = a * jnp.maximum(Y, Scol * lpow)
        env = Yf if env is None else jnp.minimum(env, Yf)
    o_ref[:] = env


def _wedge_env(dep, pieces, reverse, interpret=False):
    """min_p a_p · (max,×)-scan_p over [N] depths, one fused pass.
    ``reverse`` = anticipatory (attack) direction."""
    n = dep.shape[0]
    R, L = _WEDGE_ROWS, _WEDGE_LANES
    tile = R * L
    n_tiles = -(-n // tile)
    up = jnp.pad(dep, (0, n_tiles * tile - n)).reshape(n_tiles * R, L)
    kern = partial(_wedge_env_kernel, pieces=tuple(pieces),
                   reverse=bool(reverse))
    if reverse:
        imap = lambda i, nt=n_tiles: (nt - 1 - i, 0)
    else:
        imap = lambda i: (i, 0)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((R, L), imap, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, L), imap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * R, L), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, len(pieces)), jnp.float32)],
        interpret=bool(interpret),
    )(up)
    return out.reshape(-1)[:n]


@partial(jax.jit, static_argnums=(1, 2, 3))
def _alimiter_jit(x, pieces_r, pieces_a, autolevel, limit, level_in,
                  level_out):
    xin = x * level_in
    peak = jnp.max(jnp.abs(xin), axis=1)
    dep = jnp.maximum(0.0, 1.0 - limit / jnp.maximum(peak, 1e-9))
    d, _ = _alimiter_depth(dep, pieces_r, pieces_a)
    gain = 1.0 - d
    scale = level_out / limit if autolevel else level_out
    return xin * (gain * scale)[:, None], gain


def _alimiter_depth(dep, pieces_r, pieces_a, rel_carry=None):
    """Depth envelope shared by the offline and streaming forms.

    dep: [N] required depths. ``rel_carry``: per-piece [P] release-scan
    states carried from a previous stream block (None = zero history).
    Returns (d [N], s_fwd [P, N]) — s_fwd are the per-piece forward scans
    (the streaming caller reads its next carry at the emit boundary).

    Offline on TPU (no stream carries, nobody reads s_fwd) the two
    min-over-pieces envelopes come from ONE fused Pallas pass each way
    (``_wedge_env``) instead of 12 separate blocked XLA scans — the XLA
    form paid log2(128) full-array level passes per piece (~7.3 ms of
    the 2^23-sample chain was this stage; the fused kernel reads dep
    once per direction).
    """
    from ame_tpu.ops.window import release_scan
    if (rel_carry is None and jax.default_backend() == "tpu"
            and dep.shape[0] > _WEDGE_MIN_N):
        d_rel = _wedge_env(dep, pieces_r, False)
        d_att = _wedge_env(dep, pieces_a, True)
        return jnp.maximum(d_rel, d_att), None
    d_rel = None
    fwd = []
    for i, (a, rho) in enumerate(pieces_r):
        u = dep * a
        if rel_carry is not None:
            # one synthetic leading sample re-seeds the scan exactly:
            # s[0] = max(dep[0]*a, rho*carry)
            u = jnp.concatenate([rel_carry[i][None], u])
        s = release_scan(u, jnp.asarray(rho, dep.dtype))
        if rel_carry is not None:
            s = s[1:]
        fwd.append(s)
        d_rel = s if d_rel is None else jnp.minimum(d_rel, s)
    d_att = None
    for a, rho in pieces_a:
        s = jnp.flip(release_scan(jnp.flip(dep) * a,
                                  jnp.asarray(rho, dep.dtype)))
        d_att = s if d_att is None else jnp.minimum(d_att, s)
    return jnp.maximum(d_rel, d_att), jnp.stack(fwd)


def alimiter_compat(x: jax.Array, sample_rate: float, limit: float = 0.98,
                    attack_ms: float = 5.0, release_ms: float = 50.0,
                    level_in: float = 1.0, level_out: float = 1.0,
                    auto_level: bool = True, return_gain: bool = False):
    """The reference's final stage with ffmpeg-contract ramps
    (``alimiter=level_in=1:level_out=1:limit=0.98:attack=5:release=50``,
    engine:223): linear attack/release gain envelope and the default
    auto-level 1/limit output normalization (so reference masters peak at
    ~1.0, NOT at 0.98). Zero-latency alignment: ffmpeg's extra
    attack-length output delay is compensated (offline whole-track form).
    """
    A = max(int(round(attack_ms * sample_rate / 1000.0)), 1)
    R = max(release_ms * sample_rate / 1000.0, 1.0)
    y, gain = _alimiter_jit(x, _wedge_pieces(R), _wedge_pieces(float(A)),
                            bool(auto_level), jnp.asarray(limit, x.dtype),
                            jnp.asarray(level_in, x.dtype),
                            jnp.asarray(level_out, x.dtype))
    return (y, gain) if return_gain else y


# ---------------------------------------------------------------------------
# Streaming form (exact continuation across blocks)
# ---------------------------------------------------------------------------
#
# The release side carries forward exactly through the per-piece scan
# states. The attack side needs lookahead: the slowest attack piece decays
# as e^(-m/A), so holding back H = 16*A samples puts any unseen-future
# contribution below f32 resolution (e^-16 ~ 1e-7) — streamed output is
# 1-LSB-identical to the offline form.

_STREAM_HOLD_FACTOR = 16


def alimiter_stream_init(sample_rate: float, limit: float = 0.98,
                         attack_ms: float = 5.0, release_ms: float = 50.0,
                         level_in: float = 1.0, level_out: float = 1.0,
                         auto_level: bool = True) -> dict:
    A = max(int(round(attack_ms * sample_rate / 1000.0)), 1)
    R = max(release_ms * sample_rate / 1000.0, 1.0)
    pieces_r = _wedge_pieces(R)
    return {
        "pieces_r": pieces_r, "pieces_a": _wedge_pieces(float(A)),
        "hold": _STREAM_HOLD_FACTOR * A,
        "limit": float(limit), "level_in": float(level_in),
        "scale": (float(level_out) / float(limit) if auto_level
                  else float(level_out)),
        "pend": jnp.zeros((0, 2), jnp.float32),
        "carry": jnp.zeros((len(pieces_r),), jnp.float32),
    }


def alimiter_stream_step(x_block: jax.Array, state: dict,
                         flush: bool = False):
    """Process one block; returns (emitted samples, new state). Emission
    lags by up to ``hold`` samples until ``flush``."""
    xin = jnp.concatenate([state["pend"],
                           jnp.asarray(x_block, jnp.float32)
                           * state["level_in"]], axis=0)
    n = xin.shape[0]
    emit = n if flush else max(n - state["hold"], 0)
    if n == 0 or emit == 0:
        return (jnp.zeros((0, xin.shape[1] if n else 2), jnp.float32),
                {**state, "pend": xin})
    peak = jnp.max(jnp.abs(xin), axis=1)
    dep = jnp.maximum(0.0, 1.0 - state["limit"] / jnp.maximum(peak, 1e-9))
    d, s_fwd = _alimiter_depth(dep, state["pieces_r"], state["pieces_a"],
                               rel_carry=state["carry"])
    gain = 1.0 - d
    y = xin[:emit] * (gain[:emit] * state["scale"])[:, None]
    new_state = {**state, "pend": xin[emit:],
                 "carry": s_fwd[:, emit - 1]}
    return y, new_state
