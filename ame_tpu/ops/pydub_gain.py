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
that cap with an exact TWO-PASS scheme shaped by measured costs on this
hardware/runtime:

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

Routing: the Pallas path costs a Mosaic compile per shape bucket, so short
inputs (< 2^21 samples, proven safe for ``lax.scan`` on this runtime) and
CPU use a plain scan. ``interpret=True`` forces the two-pass path through
the Pallas interpreter for cross-checking on CPU.
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
def _gain_scan(m, scal):
    """m: [N, G]; scal: [1, 2] = (1/attack_frames, 1/release_frames)."""
    inv_a, inv_r = scal[0, 0], scal[0, 1]

    def step(att, mt):
        att = _update(att, mt, inv_a, inv_r)
        return att, att

    _, ys = jax.lax.scan(step, jnp.zeros((m.shape[1],), m.dtype), m)
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
    o_ref = refs[G + 2]
    att_ref = refs[G + 3]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for g in range(G):
            att_ref[0, g] = 0.0

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


@functools.partial(jax.jit, static_argnums=(0, 4))
def _p1(G, ms, resets, scal, interpret):
    """ms: tuple of G arrays [1, NP] (NP a multiple of _TB); resets:
    [1, NP // _K] 0/1 flags (state zeroed at flagged group starts).
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
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((G, sk), lambda i: (0, i),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((G, np_ // _K), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, G), jnp.float32)],
        interpret=bool(interpret),
    )(*ms, resets, scal)


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
# Public API
# ---------------------------------------------------------------------------

def pydub_gain_multi(ms, attack_frames: float, release_frames: float,
                     interpret: bool | None = None,
                     force_scan: bool = False):
    """Exact pydub attenuation for G independent chains.

    ms: list of G same-length [N] float32 max-attenuation sequences (the
    chains share attack/release, as the reference's three bands do).
    Returns a list of G [N] attenuation-in-dB arrays (state starts at 0).

    force_scan pins the lax.scan path — required under vmap (pallas_call
    has no batching rule), used by the 30 s chunked-compat emulation.
    """
    G = len(ms)
    n = ms[0].shape[0]
    scal = jnp.asarray(
        [[1.0 / float(attack_frames), 1.0 / float(release_frames)]],
        jnp.float32)

    use_two_pass = not force_scan and (
        interpret is True or
        (jax.default_backend() == "tpu" and n > _SCAN_MAX))
    if not use_two_pass:
        att = _gain_scan(jnp.stack(ms, axis=1), scal)
        return [att[:, g] for g in range(G)]

    blk = max(_TB, _BR * _K)
    npad = -(-n // blk) * blk
    # zero padding = below-threshold freeze: exact, and trimmed afterwards
    m1 = tuple(jnp.pad(m, (0, npad - n)).reshape(1, npad) for m in ms)
    resets = jnp.zeros((1, npad // _K), jnp.float32)
    return [a[:n] for a in _two_pass(G, m1, resets, scal, interpret)]


def _two_pass(G, m1, resets, scal, interpret):
    npad = m1[0].shape[1]
    starts = _p1(G, m1, resets, scal, bool(interpret))  # [G, npad // _K]
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

    use_two_pass = not force_scan and (
        interpret is True or
        (jax.default_backend() == "tpu" and n > _SCAN_MAX))
    if not use_two_pass:
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
    outs = _two_pass(G, m1, jnp.asarray(r)[None], scal, interpret)
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
