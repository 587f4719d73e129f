"""Exact pydub attenuation recurrence at any track length (TPU kernels).

The pydub ``compress_dynamic_range`` gain state (reference call site
audio_mastering_engine.py:306-308; semantics in ops/compressor.py) is a
per-sample recurrence with a state-dependent branch:

    att' = min(att + m/attack, m)   if att <= m      (attack toward max-att)
           max(att - m/release, 0)  otherwise        (release / freeze)

where m is the per-sample max-attenuation from the detector (m == 0 below
threshold, so the release step is 0 there — pydub's freeze quirk — and the
``rms > thresh`` branch condition folds away entirely).

The branch makes the map non-associative (piecewise slope-{0,1} with a jump
at att == m), so no associative scan is exact, and a single ``lax.scan``
over 8.4M steps crashed this TPU runtime in round 1 (ROADMAP item 3),
forcing a documented approximation above 2^21 samples. This module removes
that cap with two exact engines:

  * the DEFAULT Jacobi carry-relaxation engine (see the "Jacobi carry
    relaxation" section below): segments walked in parallel across vector
    lanes, carries iterated to a fixed point that provably equals the
    sequential recurrence — ~3x the two-pass throughput at 2^23 samples
    (device time ~12 ms vs 113 ms for the 3-band case), falling back to
    the two-pass path on (rare) non-convergence;

  * the sequential TWO-PASS scheme below, shaped by measured costs on
    this hardware/runtime:

  * sequential SMEM scalar loops run at ~12-25 ns/sample (loads + the whole
    update chain) — but per-sample stores to an OUTPUT window cost ~130 ns;
  * XLA relayouts (transposes, minor-dim reshapes) of ~100 MB run at
    seconds here, so data must stay in its natural layout end-to-end;
  * dynamic-index VMEM accesses inside an in-kernel ``fori_loop`` cost
    ~40 us each — only static slices of loaded tiles are fast.

So:

  pass 1 (Pallas, sequential): walk the track in TB-sample blocks carrying
      the scalar state in SMEM; emit the state only every K-th sample
      (N/K output stores). G independent chains (the 3 multiband bands)
      interleave in the scalar pipeline, so 3 bands cost ~1 band's time.

  pass 2 (Pallas, parallel): every K-group re-runs independently from its
      pass-1 start state. Blocks of BR groups arrive as natural-layout
      [BR, K] tiles, are transposed to [K, BR] on the MXU (an identity
      matmul — exact in f32 HIGHEST, and ~1000x faster than an XLA
      transpose here), stepped K times with a STATIC unrolled loop of
      [1, BR] vector ops (groups ride the lanes), transposed back, and
      stored in natural layout. No dynamic VMEM indexing anywhere.

Both passes evaluate the identical update expression, so the result equals
the sequential chain up to compiler rounding of the same f32 ops.

Routing: the Pallas engines cost a Mosaic compile per shape bucket, so
short inputs (< 2^15 samples) and CPU use a plain scan. ``interpret=True``
forces the Pallas engines (Jacobi first, two-pass fallback) through the
Pallas interpreter for cross-checking on CPU. The Jacobi convergence
verdict and the per-band fallback selection are ON DEVICE (lax.cond), so
the whole engine is traceable and runs inside one jitted program with
zero host round-trips (round 3; the round-2 design paid a ~30-40 ms
tunnel sync for the verdict and forced the compat stage eager).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = int(os.environ.get("AME_TPU_GAIN_TB", 4096))   # pass-1 walk block
_K = int(os.environ.get("AME_TPU_GAIN_K", 32))       # start-state stride
_BR = int(os.environ.get("AME_TPU_GAIN_BR", 512))    # pass-2 groups/block

# Jacobi carry-relaxation engine (the fast default; see _jacobi_try)
_TT = int(os.environ.get("AME_TPU_GAIN_TT", 256))    # time tile per grid step
_RMAX = int(os.environ.get("AME_TPU_GAIN_RMAX", 16))  # max Jacobi sweeps
_SMAX_LOG = int(os.environ.get("AME_TPU_GAIN_SMAX_LOG", 11))  # S cap = 2^11
_JACOBI = os.environ.get("AME_TPU_GAIN_JACOBI", "1") != "0"

# TPU lax.scan costs ~2.5 us/step (measured) and crashed the worker
# outright at 8.4M steps in round 1, so the scan path is only used for
# short inputs where a per-shape Mosaic compile isn't worth it (and always
# on CPU, where scan is a C loop). ~2^15 steps ~= 80 ms device time.
_SCAN_MAX = int(os.environ.get("AME_TPU_GAIN_SCAN_MAX", 1 << 15))


def _update(att, m, inv_a, inv_r):
    """One pydub gain step. m == 0 (below threshold) freezes att exactly:
    the release decrement is m * inv_r == 0."""
    return jnp.where(att <= m,
                     jnp.minimum(att + m * inv_a, m),
                     jnp.maximum(att - m * inv_r, 0.0))


# ---------------------------------------------------------------------------
# Fallback / short-input path: one vectorized scan
# ---------------------------------------------------------------------------

@jax.jit
def _gain_scan(m, scal, init):
    """m: [N, G]; scal: [1, 2] = (1/attack_frames, 1/release_frames);
    init: [G] starting attenuation state (zeros = the pydub track start;
    the sequence-parallel engine seeds shard carries through it)."""
    inv_a, inv_r = scal[0, 0], scal[0, 1]

    def step(att, mt):
        att = _update(att, mt, inv_a, inv_r)
        return att, att

    _, ys = jax.lax.scan(step, init.astype(m.dtype), m)
    return ys


@jax.jit
def _gain_scan_reset(m, resets, scal):
    """Like _gain_scan but the state zeroes wherever resets[n] == 1 (the
    30 s chunk-boundary emulation, quirk Q6)."""
    inv_a, inv_r = scal[0, 0], scal[0, 1]

    def step(att, inp):
        mt, rt = inp
        att = _update(att * (1.0 - rt), mt, inv_a, inv_r)
        return att, att

    _, ys = jax.lax.scan(step, jnp.zeros((m.shape[1],), m.dtype),
                         (m, resets))
    return ys


# ---------------------------------------------------------------------------
# Pass 1: sequential SMEM walk emitting every K-th state
# ---------------------------------------------------------------------------

def _p1_kernel(*refs, G, TB, K):
    m_refs = refs[:G]
    r_ref = refs[G]      # [1, TB//K] per-group reset flags (chunk starts)
    s_ref = refs[G + 1]
    c_ref = refs[G + 2]  # [1, G] initial attenuation state
    o_ref = refs[G + 3]
    att_ref = refs[G + 4]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for g in range(G):
            att_ref[0, g] = c_ref[0, g]

    inv_a = s_ref[0, 0]
    inv_r = s_ref[0, 1]

    def body(s, atts):
        atts = list(atts)
        keep = 1.0 - r_ref[0, s]  # reset BEFORE the group start is recorded
        for g in range(G):
            atts[g] = atts[g] * keep
            o_ref[g, s] = atts[g]  # state BEFORE this K-group's first sample
        for j in range(K):  # static unroll; G chains interleave per step
            for g in range(G):
                atts[g] = _update(atts[g], m_refs[g][0, s * K + j],
                                  inv_a, inv_r)
        return tuple(atts)

    atts = jax.lax.fori_loop(0, TB // K, body,
                             tuple(att_ref[0, g] for g in range(G)))
    for g in range(G):
        att_ref[0, g] = atts[g]


@functools.partial(jax.jit, static_argnums=(0, 5))
def _p1(G, ms, resets, scal, c_in, interpret):
    """ms: tuple of G arrays [1, NP] (NP a multiple of _TB); resets:
    [1, NP // _K] 0/1 flags (state zeroed at flagged group starts);
    c_in: [1, G] initial attenuation state.
    Returns [G, NP // _K] states at every K-th sample."""
    np_ = ms[0].shape[1]
    nb = np_ // _TB
    sk = _TB // _K
    kern = functools.partial(_p1_kernel, G=G, TB=_TB, K=_K)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, _TB), lambda i: (0, i),
                               memory_space=pltpu.SMEM)] * G +
                 [pl.BlockSpec((1, sk), lambda i: (0, i),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, G), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((G, sk), lambda i: (0, i),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((G, np_ // _K), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, G), jnp.float32)],
        interpret=bool(interpret),
    )(*ms, resets, scal, c_in)


# ---------------------------------------------------------------------------
# Pass 2: K-groups re-run in parallel from their start states
# ---------------------------------------------------------------------------

def _eye(n):
    rid = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (rid == cid).astype(jnp.float32)


# Exact f32 transposes on the MXU (identity matmuls: each output element is
# a single x*1.0 product, so no rounding) — ~1000x faster than an XLA
# transpose on this runtime.

def _t_in(x, eye):
    """[BR, K] -> [K, BR]: contract x's BR with eye."""
    return jax.lax.dot_general(x, eye, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _t_out(y, eye):
    """[K, BR] -> [BR, K]: contract y's BR with eye."""
    return jax.lax.dot_general(eye, y, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _p2_kernel(m_ref, st_ref, s_ref, o_ref, *, K, BR):
    eye = _eye(BR)
    mT = _t_in(m_ref[:], eye)  # [K, BR]: K-group samples down, groups across
    inv_a = s_ref[0, 0]
    inv_r = s_ref[0, 1]
    att = st_ref[0:1, :]  # [1, BR]
    rows = []
    for j in range(K):  # static unroll — no dynamic VMEM indexing
        att = _update(att, mT[j:j + 1, :], inv_a, inv_r)
        rows.append(att)
    yT = jnp.concatenate(rows, axis=0)  # [K, BR]
    o_ref[:] = _t_out(yT, eye)          # back to natural [BR, K]


@functools.partial(jax.jit, static_argnums=(3,))
def _p2(m_groups, starts, scal, interpret):
    """m_groups: [NG, K] natural layout (NG = NP // _K, a multiple of _BR);
    starts: [1, NG]. Returns att [NG, K]."""
    ng = m_groups.shape[0]
    kern = functools.partial(_p2_kernel, K=_K, BR=_BR)
    return pl.pallas_call(
        kern,
        grid=(ng // _BR,),
        in_specs=[
            pl.BlockSpec((_BR, _K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BR), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_BR, _K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, _K), jnp.float32),
        interpret=bool(interpret),
    )(m_groups, starts, scal)


# ---------------------------------------------------------------------------
# Jacobi carry relaxation: parallel-in-time EXACT gain, iterated to a
# fixed point
# ---------------------------------------------------------------------------
#
# The track is cut into S equal segments walked IN PARALLEL across vector
# lanes (one lane per segment), each from an estimated carry-in state.
# After each sweep the carry estimates are refreshed from the carry-outs
# (c[s+1] <- out[s]) and the sweep repeats until the carry vector stops
# changing.
#
# Why the fixed point is EXACT (not approximate): c[0] = 0 is the true
# initial state by construction. At a fixed point c[s+1] == f_s(c[s]) for
# every s (f_s = the segment's true state map, evaluated by the same
# deterministic f32 kernel each sweep) — which is precisely the defining
# recurrence of the sequential walk, so by induction every carry equals
# the sequential chain's state and the final full-output sweep reproduces
# the sequential result bit-for-bit.
#
# Why it converges fast: the clamp structure of the pydub update makes a
# segment's map COLLAPSE to a constant the moment its trajectory hits the
# attack cap (att == m) or the release floor (att == 0) — one saturated
# attack anywhere in a ~0.4 s segment suffices, so for real program
# material nearly every segment's carry-out is carry-in-independent after
# the very first sweep and 2-3 sweeps reach the fixed point. Silent
# (m == 0, reset-free) segments are identity maps and are bridged in one
# step by a last-active-segment scan instead of one sweep per segment.
# Content that never saturates (translation-only maps) advances the
# exactness front only one segment per sweep; if the carry vector hasn't
# stabilized after _RMAX sweeps the caller falls back to the sequential
# two-pass path, so the result is exact either way.
#
# Cost model (v5e, measured): each sweep is n_tiles grid steps of one
# [S, _TT] MXU transpose + _TT unrolled [1, S] VPU updates — all lanes
# advance together, so a sweep costs ~N/S sequential steps instead of N.
# The final sweep transposes its states back and writes the full [S,
# seg_len] attenuation in natural layout, replacing pass 2 as well.


def _jac_kernel(*refs, G, TT, K, S8, P, full, has_resets):
    m_refs = refs[:G]
    nr = 1 if has_resets else 0
    r_ref = refs[G] if has_resets else None
    c_ref, s_ref = refs[G + nr], refs[G + nr + 1]
    co_ref = refs[G + nr + 2]
    if full:
        o_refs = refs[G + nr + 3:G + nr + 3 + G]
    att_ref = refs[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        att_ref[:] = c_ref[:]

    # LANE-PACK the G chains (round 4) and SUBLANE-PACK the segments
    # (round 5): the state is one [P, G·S8] vector (segment s of chain g
    # lives at sublane s // S8, lane g·S8 + s % S8) stepped by ONE update
    # chain per sample. The round-4 [1, G·S] layout left 7/8 sublanes
    # empty, so every vector op burned ceil(G·S/128) vregs at 1/8
    # utilization — at G=3, S=512 the sweep paid 12 vreg-ops per update
    # op for 1536 values that fit in 2 packed vregs. m/r tiles arrive
    # TIME-MAJOR and pre-packed ([TT, P, S8]): XLA lays them out ONCE
    # (same transpose it already paid for the round-4 layout) and every
    # sweep reuses them; the static j index below is a free tile-row
    # select, never a relayout.
    mcat = jnp.concatenate([m_refs[g][:] for g in range(G)],
                           axis=2)                       # [TT, P, G·S8]
    if has_resets:
        rT = r_ref[:]          # [TT, P, S8]; nonzero only at chunk starts
        rcat = jnp.concatenate([rT] * G, axis=2) if G > 1 else rT
    inv_a = s_ref[0, 0]
    inv_r = s_ref[0, 1]
    att = att_ref[:]                                     # [P, G·S8]
    rows = []
    for j in range(TT):              # static unroll — no dynamic indexing
        if has_resets and j % K == 0:   # resets land on K-group starts
            att = att * (1.0 - rcat[j])
        att = _update(att, mcat[j], inv_a, inv_r)
        if full:
            rows.append(att)
    if full:
        # outputs stay TIME-MAJOR ([TT, P, S8] blocks of a
        # [seg_len, P, S8] array) — no in-kernel MXU transpose; the
        # caller's reshape to flat order goes through one XLA transpose,
        # cheaper than G identity matmuls per tile per sweep
        ycat = jnp.stack(rows, axis=0)                   # [TT, P, G·S8]
        for g in range(G):
            o_refs[g][:] = ycat[:, :, g * S8:(g + 1) * S8]
    att_ref[:] = att
    co_ref[:] = att


def _jac_call(m3p, r2p, c, scal, full, interpret, S, seg_len, TT, P):
    """m3p: [G, seg_len, P, S//P] TIME-MAJOR sublane-packed
    max-attenuations (see _pack_operands); r2p: [seg_len, P, S//P];
    c: [G, S] carry-ins. Returns [co [G, S]] (+ G full [seg_len, P, S//P]
    outputs). The kernel's state rides a single [P, G·S8] packed vector;
    the [G, S] <-> [P, G·S8] reshapes here are row-major rearrangements
    of a tiny array."""
    G = m3p.shape[0]
    S8 = S // P
    n_tiles = seg_len // TT
    has_resets = r2p is not None
    kern = functools.partial(_jac_kernel, G=G, TT=TT, K=_K, S8=S8, P=P,
                             full=full, has_resets=has_resets)
    tin = lambda: pl.BlockSpec((TT, P, S8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((P, G * S8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((P, G * S8), jnp.float32)]
    out_specs = [cspec]
    if full:
        out_shapes += [jax.ShapeDtypeStruct((seg_len, P, S8),
                                            jnp.float32)] * G
        out_specs += [tin() for _ in range(G)]
    scratch = [pltpu.VMEM((P, G * S8), jnp.float32)]
    cpack = jnp.concatenate([c[g].reshape(P, S8) for g in range(G)],
                            axis=1)
    r_ops = [r2p] if has_resets else []
    res = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[tin() for _ in range(G)]
        + ([tin()] if has_resets else []) + [
            cspec,
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=bool(interpret),
    )(*[m3p[g] for g in range(G)], *r_ops, cpack, scal)
    co = res[0]
    co_s = jnp.stack([co[:, g * S8:(g + 1) * S8].reshape(S)
                      for g in range(G)])
    return (co_s,) + tuple(res[1:])


def _pack_p(S: int) -> int:
    """Sublanes used by the packed state: all 8 once S/8 keeps a full
    128-lane vreg row; smaller S degrades gracefully toward the flat
    layout (tiny inputs — the padding there is noise anyway)."""
    return max(1, min(8, S // 128))


def _pack_operands(m1, resets, S, seg_len, P):
    """Build the kernel operands: per-chain [seg_len, P, S//P] time-major
    sublane-packed max-attenuations + the shared reset plane (None when
    ``resets`` is None — the normal continuous-track path skips the
    whole plane: one fewer 4-byte-per-sample HBM stream per sweep and
    one fewer pack transpose). Segment s occupies
    (sublane s // (S//P), lane s % (S//P)) — the row-major
    [S] -> [P, S//P] split, matching _jac_call's carry packing. One XLA
    transpose per operand, reused by EVERY sweep."""
    G = len(m1)
    npad = m1[0].shape[1]
    npad2 = S * seg_len
    S8 = S // P
    if resets is None:
        r2p = None
    else:
        rg = jnp.pad(resets[0], (0, npad2 // _K - resets.shape[1]))
        r2p = jnp.zeros((npad2 // _K, _K), jnp.float32).at[:, 0].set(rg) \
            .reshape(S, seg_len).T.reshape(seg_len, P, S8)
    m3p = jnp.stack([jnp.pad(m1[g][0], (0, npad2 - npad)).reshape(
        S, seg_len).T.reshape(seg_len, P, S8) for g in range(G)])
    return m3p, r2p


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _jacobi_carries(m3p, r2p, scal, init, S, seg_len, TT, interpret,
                    P=1):
    """m3p: [G, seg_len, P, S//P] time-major sublane-packed
    max-attenuations (_pack_operands); r2p: [seg_len, P, S//P]
    per-sample reset flags (nonzero only on K-group-start samples;
    shared by all G chains); init: [G] attenuation state entering
    segment 0 (zeros = track start). Returns (carries [G, S],
    converged [G]) — the full-output sweep runs separately (and only
    when something converged)."""
    G = m3p.shape[0]
    # Identity segments (all-zero m, reset-free: every step is att -> att
    # EXACTLY, so skipping them reassociates nothing) are bridged by
    # indexing the last non-identity segment at or before each position —
    # freeze/silence runs of any length cost one refresh, not one sweep
    # per segment. Clamped segments need no special handling: their
    # carry-out is carry-in-independent, so plain Jacobi already jumps
    # past them after the first sweep.
    seg_id = jnp.max(m3p, axis=1).reshape(G, S) == 0.0      # [G, S]
    if r2p is not None:
        seg_id &= (jnp.max(r2p, axis=0).reshape(S) == 0.0)[None]
    lasti = jax.lax.associative_scan(
        jnp.maximum, jnp.where(seg_id, -1, jnp.arange(S)[None]), axis=1)

    def refresh(co):                                        # co: [G, S]
        src = jnp.take_along_axis(co, jnp.maximum(lasti, 0), axis=1)
        # identity prefixes freeze the INITIAL state, not zero
        bridged = jnp.where(lasti < 0, init[:, None], src)
        return jnp.concatenate([init[:, None].astype(jnp.float32),
                                bridged[:, :-1]], axis=1)

    c0 = jnp.concatenate([init[:, None].astype(jnp.float32),
                          jnp.zeros((G, S - 1), jnp.float32)], axis=1)

    # Stall detection (round 5): translation-only content (weak episodes
    # that never hit the attack cap or release floor) advances the exact
    # prefix ONE segment per sweep, so with S >> _RMAX it can never
    # converge — yet it used to burn all _RMAX sweeps before falling back
    # to the sequential two-pass (measured ~9 ms of wasted sweeps on
    # noise-like content). Bail rule: from sweep 3 on, project the
    # current per-sweep resolution rate over the remaining sweep budget;
    # if it cannot cover the still-unresolved carries, stop relaxing.
    # (An absolute per-sweep quota was tried first and killed legitimate
    # slow convergence on small-S inputs that resolve ~2 carries/sweep
    # with only a dozen outstanding.) Bailing is a PERFORMANCE decision
    # only — the two-pass fallback is exact either way.
    def cond(st):
        c_cur, done, j, nstab, prev_stab = st
        unresolved = jnp.int32(G * S) - nstab
        rate = jnp.maximum(nstab - prev_stab, 0)
        progressing = (j < 3) | (rate * (_RMAX - j) >= unresolved)
        return (j < _RMAX) & ~jnp.all(done) & progressing

    def body(st):
        c_cur, _, j, nstab, _ = st
        # carry sweeps reuse the full pass's tile size (larger carry
        # tiles measured ~13% slower end to end: the extra DMA per grid
        # step did not pay for the fewer steps)
        (co,) = _jac_call(m3p, r2p, c_cur, scal, False, interpret,
                          S, seg_len, TT, P)
        # ACCEPTANCE (per band): the refreshed carries must reproduce the
        # carries just used, i.e. c[s+1] == f_s(c[s]) bit-for-bit (with
        # identity segments skipped exactly) — exact by induction from
        # c[0] = 0.
        nxt = refresh(co)
        stable = nxt == c_cur                               # [G, S]
        done = jnp.all(stable, axis=1)                      # [G]
        return (nxt, done, j + 1, jnp.sum(stable, dtype=jnp.int32), nstab)

    c_cur, converged, _, _, _ = jax.lax.while_loop(
        cond, body, (c0, jnp.zeros((G,), jnp.bool_),
                     jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                     jnp.zeros((), jnp.int32)))
    return c_cur, converged


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _jacobi_full(m3p, r2p, c, scal, S, seg_len, TT, interpret, P=1):
    res = _jac_call(m3p, r2p, c, scal, True, bool(interpret), S, seg_len,
                    TT, P)
    return jnp.stack(res[1:])


def _select_S(npad: int) -> int:
    """Segments = pow2 in [8, _SMAX], targeting ~4 K-sample (~93 ms)
    segments. Sweep cost is seg_len sequential steps, so more/shorter
    segments are faster — the floor is collapse probability: a segment
    whose gain never caps at max-att nor floors at 0 forwards its carry
    dependence, and runs of such segments longer than the sweep budget
    stall the relaxation (the stall detector then bails to the exact
    two-pass). 93 ms still spans several attack windows (5 ms) and ~2
    release windows (50 ms) of the pydub clock, and program material
    measured >99% collapsed segments at this length."""
    import math as _math
    return 1 << max(3, min(_SMAX_LOG, int(_math.log2(max(npad // 4096,
                                                         8)))))


def _gain_engine(G, m1, resets, scal, interpret, init=None):
    """Run the Jacobi engine with the convergence verdict ON DEVICE,
    falling back PER BAND to the sequential two-pass path for any chain
    whose carries did not reach the exact fixed point. Returns a list of
    G [npad] attenuations. ``init`` ([G], traced) seeds the attenuation
    state entering the first sample (the sequence-parallel engine's
    shard carries); None = zeros (track start).

    Fully traceable (round-3; round 2's verdict needed a host
    synchronization — ~30-40 ms over the tunneled TPU — and therefore
    kept the whole compat multiband stage EAGER, which cost more in
    dispatch round-trips than the kernels themselves): both the full
    Jacobi sweep and the two-pass fallback sit behind ``lax.cond``, so
    only the needed engine executes at runtime and the entire stage can
    live inside one jitted program."""
    if init is None:
        init = jnp.zeros((G,), jnp.float32)
    npad = m1[0].shape[1]
    if not _JACOBI:
        resets_tp = resets if resets is not None else \
            jnp.zeros((1, npad // _K), jnp.float32)
        return [a[:npad] for a in
                _two_pass(G, m1, resets_tp, scal, interpret, init)]

    # All-silent early-out (round 5): when every chain's max-attenuation
    # is identically zero and the initial state is zero, the recurrence is
    # att_t == 0 for all t EXACTLY (the attack increment and release
    # decrement are both m·k == 0, and resets zero an already-zero state),
    # so the whole engine — transposition prep, carry sweeps, full sweep —
    # reduces to a zeros fill. Real mastering content below all band
    # thresholds (quiet stems, conservative thresholds) hits this path;
    # the check costs one reduction over m. The verdict stays ON DEVICE
    # (lax.cond), preserving the zero-host-round-trip property.
    silent = jnp.all(init == 0.0)
    for g in range(G):
        silent &= jnp.all(m1[g] == 0.0)

    def _run_engine():
        return jnp.stack(_gain_engine_hot(G, m1, resets, scal, interpret,
                                          init))

    att = jax.lax.cond(
        silent, lambda: jnp.zeros((G, npad), jnp.float32), _run_engine)
    return [att[g] for g in range(G)]


def _gain_engine_hot(G, m1, resets, scal, interpret, init):
    """The full Jacobi-with-fallback engine (see _gain_engine)."""
    npad = m1[0].shape[1]
    S = _select_S(npad)
    P = _pack_p(S)
    # time tile sized to hold the working set (G m-tiles + reset plane +
    # G out tiles, double-buffered) within VMEM: ~2^17 f32 elements per
    # chain-tile. The carry sweeps carry no output buffers, so they run
    # at double the tile (fewer grid steps — measured faster post
    # lane-packing). Interpret mode has no lane floor and pays compile
    # time per unrolled step, so tile small.
    TT = _K if interpret else max(_K, min((1 << 17) // S, _TT)
                                  // _K * _K)
    TT_C = TT if interpret else 2 * TT
    seg_len = -(-npad // (S * TT_C)) * TT_C
    npad2 = S * seg_len
    m3p, r2p = _pack_operands(m1, resets, S, seg_len, P)
    c_fix, ok = _jacobi_carries(m3p, r2p, scal, init, S, seg_len, TT_C,
                                bool(interpret), P)

    att_jac = jax.lax.cond(
        jnp.any(ok),
        lambda: _jacobi_full(m3p, r2p, c_fix, scal, S, seg_len, TT,
                             bool(interpret), P),
        lambda: jnp.zeros((G, seg_len, P, S // P), jnp.float32))

    resets_tp = resets if resets is not None else \
        jnp.zeros((1, npad // _K), jnp.float32)
    tp = jax.lax.cond(
        jnp.all(ok),
        lambda: jnp.zeros((G, npad), jnp.float32),
        lambda: jnp.stack([a[:npad] for a in
                           _two_pass(G, m1, resets_tp, scal, interpret,
                                     init)]))

    # full-sweep outputs are time-major; one XLA transpose back to the
    # flat segment-major order (see _jac_kernel)
    return [jnp.where(ok[g],
                      att_jac[g].reshape(seg_len, S).T.reshape(npad2)[:npad],
                      tp[g])
            for g in range(G)]


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _route_kernels(n: int, interpret, force_scan: bool = False) -> bool:
    """True -> the Pallas engines; False -> the lax.scan path. ONE
    predicate shared by pydub_gain_multi / pydub_gain_ends /
    pydub_gain_chunked — the sp relaxation's carry sweeps must route
    exactly like its final full run."""
    return not force_scan and (
        interpret is True or
        (jax.default_backend() == "tpu" and n > _SCAN_MAX))


def _pad_block(n: int) -> int:
    """Padded length aligned to both engines' block granules."""
    blk = max(_TB, _BR * _K)
    return -(-n // blk) * blk


def pydub_gain_multi(ms, attack_frames: float, release_frames: float,
                     interpret: bool | None = None,
                     force_scan: bool = False, init=None):
    """Exact pydub attenuation for G independent chains.

    ms: list of G same-length [N] float32 max-attenuation sequences (the
    chains share attack/release, as the reference's three bands do).
    Returns a list of G [N] attenuation-in-dB arrays.

    force_scan pins the lax.scan path — required under vmap (pallas_call
    has no batching rule), used by the 30 s chunked-compat emulation.
    ``init`` ([G] traced, default zeros = the pydub track start) seeds the
    attenuation state entering the first sample — the sequence-parallel
    engine (parallel/sp_compat.py) runs each shard from its relaxed
    inbound carry through this.
    """
    G = len(ms)
    n = ms[0].shape[0]
    scal = jnp.asarray(
        [[1.0 / float(attack_frames), 1.0 / float(release_frames)]],
        jnp.float32)
    if init is None:
        init = jnp.zeros((G,), jnp.float32)
    init = jnp.asarray(init, jnp.float32)

    if not _route_kernels(n, interpret, force_scan):
        att = _gain_scan(jnp.stack(ms, axis=1), scal, init)
        return [att[:, g] for g in range(G)]

    npad = _pad_block(n)
    # zero padding = below-threshold freeze: exact, and trimmed afterwards
    m1 = tuple(jnp.pad(m, (0, npad - n)).reshape(1, npad) for m in ms)
    # resets=None: the continuous-track path — the Jacobi sweeps skip the
    # whole reset plane (operand, DMA stream, and per-sample multiply)
    return [a[:n] for a in _gain_engine(G, m1, None, scal, interpret,
                                        init)]


def pydub_gain_ends(ms, attack_frames: float, release_frames: float,
                    interpret: bool | None = None, init=None):
    """Final attenuation state only ([G]) — what a carry sweep of the
    sequence-parallel relaxation (parallel/sp_compat._pydub_gain_sp)
    needs. Avoids materializing the full [N, G] output: the scan path
    drops per-step outputs; the kernel path runs ONLY the sequential
    pass-1 walk (the cheapest end-state computation) and steps the last
    K-group from its emitted start."""
    G = len(ms)
    n = ms[0].shape[0]
    scal = jnp.asarray(
        [[1.0 / float(attack_frames), 1.0 / float(release_frames)]],
        jnp.float32)
    if init is None:
        init = jnp.zeros((G,), jnp.float32)
    init = jnp.asarray(init, jnp.float32)

    if not _route_kernels(n, interpret):
        inv_a, inv_r = scal[0, 0], scal[0, 1]

        def step(att, mt):
            return _update(att, mt, inv_a, inv_r), None

        att, _ = jax.lax.scan(step, init, jnp.stack(ms, axis=1))
        return att

    npad = _pad_block(n)
    m1 = tuple(jnp.pad(m, (0, npad - n)).reshape(1, npad) for m in ms)
    resets = jnp.zeros((1, npad // _K), jnp.float32)
    starts = _p1(G, m1, resets, scal, init.reshape(1, G),
                 bool(interpret))                       # [G, npad // _K]
    # state after the last K-group = scan its K samples from its start
    # (trailing zero padding freezes the state, so npad ends == n ends)
    tail = jnp.stack([m1[g][0, npad - _K:] for g in range(G)], axis=1)
    return _gain_scan(tail, scal, starts[:, -1])[-1]


def _two_pass(G, m1, resets, scal, interpret, init=None):
    npad = m1[0].shape[1]
    if init is None:
        init = jnp.zeros((G,), jnp.float32)
    starts = _p1(G, m1, resets, scal, init.reshape(1, G),
                 bool(interpret))                       # [G, npad // _K]
    outs = []
    for g in range(G):
        att = _p2(m1[g].reshape(npad // _K, _K), starts[g:g + 1], scal,
                  bool(interpret))
        outs.append(att.reshape(npad))
    return outs


def pydub_gain_chunked(ms, attack_frames: float, release_frames: float,
                       chunk_len: int, interpret: bool | None = None,
                       force_scan: bool = False):
    """Exact pydub attenuation with the state RESET every ``chunk_len``
    samples — the reference's 30 s segment emulation (quirk Q6,
    audio_mastering_engine.py:178, 185-204).

    Two-pass path: each chunk is padded up to a K-group boundary (zero
    padding freezes, and the next chunk's flagged group start zeroes the
    state), so resets land exactly on group starts and pass 2 needs no
    changes. ms: list of G [N] arrays; returns list of G [N] arrays.
    """
    G = len(ms)
    n = ms[0].shape[0]
    scal = jnp.asarray(
        [[1.0 / float(attack_frames), 1.0 / float(release_frames)]],
        jnp.float32)
    nc = -(-n // chunk_len)

    if not _route_kernels(n, interpret, force_scan):
        r = np.zeros(n, np.float32)
        r[::chunk_len] = 1.0
        att = _gain_scan_reset(jnp.stack(ms, axis=1),
                               jnp.asarray(r)[:, None], scal)
        return [att[:, g] for g in range(G)]

    cpad = -(-chunk_len // _K) * _K          # chunk rounded to K groups
    blk = max(_TB, _BR * _K)
    npad = -(-(nc * cpad) // blk) * blk
    gpad = npad // _K

    def relay(m):
        rows = jnp.pad(m, (0, nc * chunk_len - n)).reshape(nc, chunk_len)
        rows = jnp.pad(rows, ((0, 0), (0, cpad - chunk_len)))
        return jnp.pad(rows.reshape(-1), (0, npad - nc * cpad))[None]

    m1 = tuple(relay(m) for m in ms)
    r = np.zeros(gpad, np.float32)
    r[np.arange(nc) * (cpad // _K)] = 1.0
    outs = _gain_engine(G, m1, jnp.asarray(r)[None], scal, interpret)
    res = []
    for att in outs:
        rows = att[:nc * cpad].reshape(nc, cpad)[:, :chunk_len]
        res.append(rows.reshape(-1)[:n])
    return res


def pydub_gain(m, attack_frames: float, release_frames: float,
               interpret: bool | None = None):
    """Single-chain / stacked convenience wrapper. m: [N] or [N, G]."""
    if m.ndim == 1:
        return pydub_gain_multi([m], attack_frames, release_frames,
                                interpret)[0]
    outs = pydub_gain_multi([m[:, g] for g in range(m.shape[1])],
                            attack_frames, release_frames, interpret)
    return jnp.stack(outs, axis=1)
