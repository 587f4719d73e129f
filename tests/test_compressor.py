"""Compressor differential tests vs the pydub-semantics oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from ame_tpu.ops import compressor, quantize
from tests import oracles
from tests.conftest import make_test_signal

SR = 44100


def _program(n=SR, seed=0):
    """Noise with a loud middle section — exercises attack, sustain,
    release, and the below-threshold freeze."""
    x = make_test_signal("noise", n, SR, seed=seed) * 0.05
    x[n // 3: 2 * n // 3] *= 12.0
    return np.clip(x, -1, 1)


@pytest.mark.parametrize("thresh,ratio", [(-20.0, 4.0), (-25.0, 6.0)])
def test_exact_matches_oracle(thresh, ratio):
    x = _program()
    x_int = oracles.float_to_int16(x).astype(np.float32)
    want = oracles.pydub_compress(x_int.astype(np.float64), SR, thresh, ratio)
    got = np.asarray(compressor.pydub_compress_exact(
        jnp.asarray(x_int), SR, thresh, ratio))
    # integer-domain outputs; f32 rms rounding can flip a floor by 1 ->
    # allow tiny deviations on a handful of samples
    diff = np.abs(got - want)
    assert np.median(diff) == 0.0
    assert diff.max() <= 64, diff.max()          # < 0.002 full scale
    assert (diff > 2).mean() < 0.02              # overwhelmingly exact


def test_fast_close_to_exact():
    x = _program()
    x_int = quantize.float_to_int16(jnp.asarray(x))
    exact = np.asarray(compressor.pydub_compress_exact(
        x_int, SR, -20.0, 4.0))
    fast = np.asarray(compressor.pydub_compress_fast(
        x_int, SR, -20.0, 4.0))
    # the clamp-snap approximation: bounded by the largest max-att dip; the
    # pydub freeze quirk can pin that offset into the tail (documented in
    # ops/compressor.py — compat mode therefore defaults to exact)
    err_db = 20 * np.log10(
        (np.abs(fast) + 1) / (np.abs(exact) + 1))
    assert np.abs(err_db).max() < 4.5
    assert np.abs(err_db).mean() < 2.0
    # during the attack/sustain (before the freeze), agreement is tight
    pre = slice(0, SR // 2)
    assert np.abs(err_db[pre]).mean() < 0.1


def test_fast_equals_exact_without_dips():
    """With a steady carrier (constant detector rms -> max_att never dips
    below attenuation) the fast path is exact-tight."""
    n = SR // 2
    t = np.arange(n) / SR
    tone = 0.04 * np.sin(2 * np.pi * 300.0 * t)
    x = np.stack([tone, tone], axis=1).astype(np.float32)
    x[n // 2:] *= 12.0
    x = np.clip(x, -1, 1)
    x_int = quantize.float_to_int16(jnp.asarray(x))
    exact = np.asarray(compressor.pydub_compress_exact(x_int, SR, -20.0, 4.0))
    fast = np.asarray(compressor.pydub_compress_fast(x_int, SR, -20.0, 4.0))
    err_db = 20 * np.log10((np.abs(fast) + 1) / (np.abs(exact) + 1))
    assert np.abs(err_db).max() < 0.6, np.abs(err_db).max()


def test_below_threshold_passthrough():
    x = make_test_signal("noise", SR // 2, SR) * 0.01  # ~-40 dBFS
    x_int = quantize.float_to_int16(jnp.asarray(x))
    got = np.asarray(compressor.pydub_compress_exact(
        x_int, SR, -20.0, 4.0))
    np.testing.assert_array_equal(got, np.asarray(x_int))


def test_quality_compressor_reduces_dynamics():
    x = _program()
    y = np.asarray(compressor.compress_quality(
        jnp.asarray(x), SR, threshold_db=-20.0, ratio=4.0))
    loud_in = np.sqrt(np.mean(x[SR // 3: 2 * SR // 3] ** 2))
    loud_out = np.sqrt(np.mean(y[SR // 3: 2 * SR // 3] ** 2))
    quiet_in = np.sqrt(np.mean(x[: SR // 4] ** 2))
    quiet_out = np.sqrt(np.mean(y[: SR // 4] ** 2))
    assert loud_out < loud_in * 0.7          # loud section compressed
    assert quiet_out > quiet_in * 0.95       # quiet section ~untouched
    assert np.isfinite(y).all()


def test_multiband_oracle_vs_device():
    """Full reference multiband path (Q4/Q5/Q7) vs the device composition."""
    from ame_tpu.graph import multiband as mb
    x = _program(SR // 2)
    xq = oracles.int16_roundtrip(x)
    settings = {"low_thresh": -25.0, "low_ratio": 6.0,
                "mid_thresh": -20.0, "mid_ratio": 3.0,
                "high_thresh": -15.0, "high_ratio": 4.0}
    want = oracles.multiband_compress(xq, SR, settings)  # int16-valued
    got = np.asarray(mb.multiband_compat(
        jnp.asarray(xq.astype(np.float32)), SR,
        jnp.asarray([-25.0, -20.0, -15.0]), jnp.asarray([6.0, 3.0, 4.0]),
        exact=True))
    diff = np.abs(got * 32768.0 - want)  # compare in int16 domain
    assert np.median(diff) <= 1.0
    assert diff.max() <= 96, diff.max()
    assert (diff > 4).mean() < 0.05


def test_two_pass_gain_matches_scan():
    """The two-pass (Pallas pass-1 + vectorized pass-2) gain kernel must
    reproduce the sequential scan exactly — including across block
    boundaries and an odd-length tail (checked here via the Pallas
    interpreter; the TPU path runs the same program)."""
    from ame_tpu.ops import pydub_gain as pg
    rng = np.random.default_rng(7)
    n = 3 * pg._TB + 517
    m = np.maximum(rng.normal(1.0, 3.0, (n, 3)), 0.0).astype(np.float32)
    m[rng.random((n, 3)) < 0.6] = 0.0  # below-threshold freeze stretches
    scal = jnp.asarray([[1.0 / 220.5, 1.0 / 2205.0]], jnp.float32)
    want = np.asarray(pg._gain_scan(jnp.asarray(m), scal, jnp.zeros(m.shape[1])))
    got = np.asarray(pg.pydub_gain(jnp.asarray(m), 220.5, 2205.0,
                                   interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)
    assert np.median(np.abs(got - want)) == 0.0

    # 1-D input path
    got1 = np.asarray(pg.pydub_gain(jnp.asarray(m[:, 0]), 220.5, 2205.0,
                                    interpret=True))
    np.testing.assert_allclose(got1, want[:, 0], atol=1e-5, rtol=0)


def test_exact_multi_matches_per_band():
    """The batched 3-band exact compressor equals three independent
    exact calls."""
    x = _program(n=SR // 2)
    x_int = jnp.asarray(oracles.float_to_int16(x).astype(np.float32))
    bands = [x_int, x_int * 0.5, x_int * 0.25]
    threshs = [-20.0, -25.0, -15.0]
    ratios = [4.0, 6.0, 3.0]
    multi = compressor.pydub_compress_exact_multi(
        bands, SR, threshs, ratios)
    for b, t, r, got in zip(bands, threshs, ratios, multi):
        want = compressor.pydub_compress_exact(b, SR, t, r)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_chunked_gain_matches_per_chunk():
    """pydub_gain_chunked == independent per-chunk runs (the reference's
    fresh pydub state per 30 s segment), on both the scan and the
    reset-aware two-pass paths."""
    from ame_tpu.ops import pydub_gain as pg
    rng = np.random.default_rng(11)
    chunk = 1500  # NOT a multiple of the K-group size
    n = 4 * chunk + 321
    m = np.maximum(rng.normal(1.0, 3.0, (n, 2)), 0.0).astype(np.float32)
    m[rng.random((n, 2)) < 0.5] = 0.0
    ms = [jnp.asarray(m[:, g]) for g in range(2)]

    # ground truth: run each chunk independently from zero state
    want = np.empty_like(m)
    for c0 in range(0, n, chunk):
        seg = m[c0:c0 + chunk]
        att = pg._gain_scan(jnp.asarray(seg),
                            jnp.asarray([[1 / 220.5, 1 / 2205.0]],
                                        jnp.float32),
                            jnp.zeros(seg.shape[1]))
        want[c0:c0 + chunk] = np.asarray(att)

    got_scan = pg.pydub_gain_chunked(ms, 220.5, 2205.0, chunk,
                                     force_scan=True)
    got_scan = np.stack([np.asarray(a) for a in got_scan], 1)
    np.testing.assert_allclose(got_scan, want, atol=1e-6, rtol=0)

    got_tp = pg.pydub_gain_chunked(ms, 220.5, 2205.0, chunk,
                                   interpret=True)
    got_tp = np.stack([np.asarray(a) for a in got_tp], 1)
    np.testing.assert_allclose(got_tp, want, atol=1e-5, rtol=0)


def test_chunked_exact_multiband_matches_vmap_reference():
    """The batched chunked-exact compressor equals per-chunk independent
    pydub_compress_exact calls (detector AND gain both reset)."""
    chunk = 2000
    x = _program(n=3 * chunk + 700)
    x_int = jnp.asarray(oracles.float_to_int16(x).astype(np.float32))
    n = x_int.shape[0]
    want = np.empty((n, 2), np.float32)
    for c0 in range(0, n, chunk):
        seg = x_int[c0:c0 + chunk]
        want[c0:c0 + chunk] = np.asarray(
            compressor.pydub_compress_exact(seg, SR, -20.0, 4.0))
    (got,) = compressor.pydub_compress_exact_multi_chunked(
        [x_int], SR, [-20.0], [4.0], chunk)
    np.testing.assert_allclose(np.asarray(got), want, atol=2.0, rtol=0)
    assert np.median(np.abs(np.asarray(got) - want)) == 0.0


def test_jacobi_convergence_flag_and_fallback():
    """The Jacobi carry-relaxation engine must (a) converge and match the
    scan on program-like content, (b) detect non-convergence on
    translation-only maps (huge attack, never saturates) and fall back to
    the exact sequential path."""
    from ame_tpu.ops import pydub_gain as pg

    def carries(m1, resets, scal):
        npad = m1[0].shape[1]
        S = pg._select_S(npad)
        P = pg._pack_p(S)
        TT = pg._K  # interpret mode tiles small
        seg_len = -(-npad // (S * TT)) * TT
        # packed time-major operands (round 5 — see _gain_engine)
        m3p, r2p = pg._pack_operands(m1, resets, S, seg_len, P)
        return pg._jacobi_carries(m3p, r2p, scal,
                                  jnp.zeros((m3p.shape[0],)), S, seg_len,
                                  TT, True, P)

    rng = np.random.default_rng(3)
    n = 9 * 16384
    m = np.zeros(n, np.float32)
    m[5000:60000] = 4 * np.abs(rng.standard_normal(55000)).astype(np.float32)
    m[100000:120000] = 2.0
    scal = jnp.asarray([[1 / 220.5, 1 / 2205.0]], jnp.float32)
    m1 = (jnp.asarray(m)[None],)
    resets = jnp.zeros((1, n // pg._K), jnp.float32)
    _, ok = carries(m1, resets, scal)
    assert np.asarray(ok).all()
    outs = pg._gain_engine(1, m1, resets, scal, True)
    ref = np.asarray(pg._gain_scan(jnp.asarray(m)[:, None], scal, jnp.zeros(1)))[:, 0]
    np.testing.assert_array_equal(np.asarray(outs[0]), ref)

    # translation maps: the exactness front advances one segment/sweep, so
    # with S segments >> _RMAX sweeps the carry vector cannot stabilize
    # (the rate-projection stall detector bails after sweep 3) ->
    # converged False and the engine's on-device lax.cond selects the
    # exact sequential two-pass path
    n2 = 32 * 16384
    resets2 = jnp.zeros((1, n2 // pg._K), jnp.float32)
    m1 = (jnp.full((1, n2), 10.0, jnp.float32),)
    scal2 = jnp.asarray([[1e-9, 1 / 2205.0]], jnp.float32)
    _, ok = carries(m1, resets2, scal2)
    assert not np.asarray(ok).any()
    got = pg.pydub_gain_multi([jnp.full(n2, 10.0, jnp.float32)], 1e9,
                              2205.0, interpret=True)
    ref = np.asarray(pg._gain_scan(jnp.full((n2, 1), 10.0, jnp.float32),
                                   scal2, jnp.zeros(1)))[:, 0]
    np.testing.assert_array_equal(np.asarray(got[0]), ref)


def test_two_pass_path_still_exact(monkeypatch):
    """The sequential two-pass engine stays the Jacobi fallback; keep it
    under direct test with Jacobi disabled."""
    from ame_tpu.ops import pydub_gain as pg

    monkeypatch.setattr(pg, "_JACOBI", False)
    rng = np.random.default_rng(4)
    n = 50000
    m = 3 * np.abs(rng.standard_normal(n)).astype(np.float32)
    m[::5] = 0.0
    got = pg.pydub_gain(jnp.asarray(m), 220.5, 2205.0, interpret=True)
    ref = np.asarray(pg._gain_scan(
        jnp.asarray(m)[:, None],
        jnp.asarray([[1 / 220.5, 1 / 2205.0]], jnp.float32),
        jnp.zeros(1)))[:, 0]
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_jacobi_chunked_resets_exact():
    from ame_tpu.ops import pydub_gain as pg

    rng = np.random.default_rng(5)
    n = 80000
    m = 2.5 * np.abs(rng.standard_normal(n)).astype(np.float32)
    ms = [jnp.asarray(m), jnp.asarray(m * 0.5)]
    chunk = 30000
    got = pg.pydub_gain_chunked(ms, 220.5, 2205.0, chunk, interpret=True)
    r = np.zeros(n, np.float32)
    r[::chunk] = 1.0
    ref = np.asarray(pg._gain_scan_reset(
        jnp.stack(ms, axis=1), jnp.asarray(r)[:, None],
        jnp.asarray([[1 / 220.5, 1 / 2205.0]], jnp.float32)))
    for g in range(2):
        np.testing.assert_array_equal(np.asarray(got[g]), ref[:, g])


def test_gain_engine_traceable_under_jit():
    """A caller may wrap the whole stage in jax.jit (master_graph_fused
    does): the gain engine must detect the trace and take the fully
    traceable two-pass path instead of crashing on its host-side Jacobi
    convergence fetch."""
    import jax
    from ame_tpu.ops import pydub_gain as pg

    rng = np.random.default_rng(6)
    n = 50000
    m = 3 * np.abs(rng.standard_normal(n)).astype(np.float32)
    m[::4] = 0.0
    jf = jax.jit(lambda z: pg.pydub_gain_multi([z], 220.5, 2205.0,
                                               interpret=True)[0])
    got = np.asarray(jf(jnp.asarray(m)))
    ref = np.asarray(pg._gain_scan(
        jnp.asarray(m)[:, None],
        jnp.asarray([[1 / 220.5, 1 / 2205.0]], jnp.float32),
        jnp.zeros(1)))[:, 0]
    np.testing.assert_allclose(got, ref, atol=2e-5)

    # fused compat graph end-to-end (the original crash site)
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph_fused
    x = jnp.asarray(np.round(np.clip(
        0.3 * rng.standard_normal((40000, 2)), -1, 1) * 32767) / 32768,
        jnp.float32)
    s = MasterSettings(multiband=True, lufs=None, mode="compat")
    y, _ = master_graph_fused(x, 44100.0, s)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("n", [32769, 65536, 65537, 131071, 131072 + 13])
def test_jacobi_awkward_lengths(n):
    """Lengths straddling the segment/tile padding boundaries must stay
    exact (zero padding = below-threshold freeze, trimmed after)."""
    from ame_tpu.ops import pydub_gain as pg

    rng = np.random.default_rng(n)
    m = np.zeros(n, np.float32)
    m[100:n // 2] = 3 * np.abs(
        rng.standard_normal(n // 2 - 100)).astype(np.float32)
    got = pg.pydub_gain_multi([jnp.asarray(m)], 220.5, 2205.0,
                              interpret=True)
    ref = np.asarray(pg._gain_scan(
        jnp.asarray(m)[:, None],
        jnp.asarray([[1 / 220.5, 1 / 2205.0]], jnp.float32),
        jnp.zeros(1)))[:, 0]
    np.testing.assert_allclose(np.asarray(got[0]), ref, atol=1e-6)


def test_gain_ends_matches_full_engine():
    """pydub_gain_ends (the sp relaxation's carry-only sweep) must equal
    the full engine's final state bit-for-bit on both the scan and the
    kernel (interpret) paths, with a nonzero initial state."""
    import ame_tpu.ops.pydub_gain as pg

    rng = np.random.default_rng(5)
    n = 1 << 17
    m1 = np.maximum(0.0, rng.standard_normal(n)).astype(np.float32) * 5
    m2 = (3.0 + np.sin(np.arange(n) / 4000)).astype(np.float32)
    init = jnp.asarray([1.5, 0.7])
    for interp in (None, True):
        full = pg.pydub_gain_multi([jnp.asarray(m1), jnp.asarray(m2)],
                                   220.5, 2205.0, interpret=interp,
                                   init=init)
        ends = pg.pydub_gain_ends([jnp.asarray(m1), jnp.asarray(m2)],
                                  220.5, 2205.0, interpret=interp,
                                  init=init)
        np.testing.assert_array_equal(
            np.asarray(ends),
            np.asarray(jnp.stack([full[0][-1], full[1][-1]])))
