"""Full-graph differential tests: compat mode vs the verbatim-formula
oracle chain, plus quality-mode property checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from ame_tpu.config import MasterSettings
from ame_tpu.graph.chain import master_graph
from ame_tpu.ops import quantize
from tests import oracles
from tests.conftest import make_test_signal

SR = 44100


def _oracle_pre_loudnorm(x, settings_dict, chunk_len=None):
    """Reference chunk-stage chain (engine:185-204): analog -> EQ -> width ->
    int16 -> multiband, per chunk when chunk_len is set."""
    def one_chunk(seg):
        seg = oracles.int16_roundtrip(seg)
        if settings_dict.get("analog_character", 0) > 0:
            seg = oracles.apply_analog_character(
                seg, SR, settings_dict["analog_character"])
            seg = oracles.int16_roundtrip(seg)
        seg = oracles.apply_eq(seg, SR, settings_dict).astype(np.float64)
        if settings_dict.get("width", 1.0) != 1.0:
            seg = oracles.apply_stereo_width(seg, settings_dict["width"])
        seg = oracles.int16_roundtrip(seg)
        if settings_dict.get("multiband"):
            seg = oracles.multiband_compress(seg, SR, settings_dict) / 32768.0
        return seg

    if chunk_len is None:
        return one_chunk(x)
    outs = [one_chunk(x[i:i + chunk_len])
            for i in range(0, len(x), chunk_len)]
    return np.concatenate(outs, axis=0)


def rel_err(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    return np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-12)


# alimiter's default auto-level scales the limited output by 1/limit
# (ops/limiter.alimiter_compat — ffmpeg `level` option, on by default, so
# reference masters peak at ~1.0); below-ceiling content is passthrough
# times this constant.
AUTO = 1.0 / 0.98


@pytest.mark.parametrize("preset", [
    dict(bass_boost=2.5, mid_cut=1.0, presence_boost=-1.0, treble_boost=0.5),
    dict(bass_boost=-2.0, mid_cut=3.0, presence_boost=-2.0,
         treble_boost=-4.0, width=1.4, analog_character=35.0),
])
def test_compat_pre_loudnorm_parity(preset):
    x = make_test_signal("noise", SR, SR) * 0.4
    sd = dict(preset)
    sd["lufs"] = None
    want = _oracle_pre_loudnorm(x.astype(np.float64), sd)

    s = MasterSettings.from_dict({**sd, "mode": "compat"})
    xq = quantize.int16_roundtrip(jnp.asarray(x))
    got, _ = master_graph(xq, SR, s)
    # graph includes the final limiter; at these levels it's pass-through
    # times the auto-level constant. Note preset1's negative shelves
    # trigger quirk Q1 (LP∘HP annihilates the signal) — both sides agree
    # to ~1 LSB, so gate on relative error OR absolute int16-LSB error.
    want = want * AUTO
    max_abs = float(np.max(np.abs(np.asarray(got, np.float64) - want)))
    assert rel_err(got, want) < 3e-3 or max_abs <= 2.0 / 32768.0, (
        rel_err(got, want), max_abs)


def test_compat_full_chain_lufs_accuracy():
    """The headline parity metric: LUFS error of the normalized master."""
    from ame_tpu.ops.loudness import integrated_lufs
    x = make_test_signal("noise", SR * 3, SR) * 0.15
    s = MasterSettings.from_dict({
        "bass_boost": 1.5, "treble_boost": -1.0, "lufs": -14.0,
        "mode": "compat"})
    xq = quantize.int16_roundtrip(jnp.asarray(x))
    y, info = master_graph(xq, SR, s)
    out_lufs = float(integrated_lufs(y, SR))
    # the post-loudnorm alimiter auto-level (+20*log10(1/0.98) = +0.175 dB)
    # overshoots the target exactly like the reference's output does
    assert abs(out_lufs - (-14.0 + 20 * np.log10(AUTO))) < 0.1, out_lufs
    assert float(np.max(np.abs(np.asarray(y)))) <= 1.0 + 1e-5  # Q8 limiter


def test_compat_chunked_matches_chunked_oracle(monkeypatch):
    """Quirk Q6 emulation: state resets at chunk boundaries. The chunk
    length is shrunk to 1 s so a 2 s input genuinely CROSSES a boundary
    (the graph reads COMPAT_CHUNK_SECONDS at call time)."""
    sr = 8000
    import ame_tpu.config as C
    import ame_tpu.graph.chain as chain_mod
    monkeypatch.setattr(C, "COMPAT_CHUNK_SECONDS", 1.0)
    monkeypatch.setattr(chain_mod.C, "COMPAT_CHUNK_SECONDS", 1.0)
    x = make_test_signal("noise", sr * 2, sr) * 0.3  # 2 chunks of 1 s
    sd = dict(bass_boost=3.0, mid_cut=2.0)
    want = _oracle_pre_loudnorm_sr(x.astype(np.float64), sd, sr,
                                   chunk_len=sr)
    s = MasterSettings.from_dict({**sd, "lufs": None, "mode": "compat",
                                  "compat_chunked": True})
    xq = quantize.int16_roundtrip(jnp.asarray(x))
    got, _ = master_graph(xq, sr, s)
    want = want * AUTO
    assert rel_err(got, want) < 3e-3
    # the reset is load-bearing: a continuous-state (unchunked) oracle must
    # NOT match as well right after the boundary
    want_cont = _oracle_pre_loudnorm_sr(x.astype(np.float64), sd, sr,
                                        chunk_len=None) * AUTO
    seg = slice(sr, sr + 256)
    err_reset = rel_err(got[seg], want[seg])
    err_cont = rel_err(got[seg], want_cont[seg])
    assert err_reset < err_cont


def _oracle_pre_loudnorm_sr(x, settings_dict, sr, chunk_len=None):
    def one_chunk(seg):
        seg = oracles.int16_roundtrip(seg)
        seg = oracles.apply_eq(seg, sr, settings_dict).astype(np.float64)
        return oracles.int16_roundtrip(seg)

    if chunk_len is None or chunk_len >= len(x):
        return one_chunk(x)
    return np.concatenate([one_chunk(x[i:i + chunk_len])
                           for i in range(0, len(x), chunk_len)], axis=0)


def test_compat_chunked_multiband_boundaries(monkeypatch):
    """Actual chunk boundaries + multiband: filter AND compressor state must
    reset per chunk exactly like the reference's segment loop (Q6)."""
    import ame_tpu.config as C
    monkeypatch.setattr(C, "COMPAT_CHUNK_SECONDS", 0.5)
    sr = 16000  # crossovers must clear Nyquist, like the reference
    chunk = int(0.5 * sr)
    x = make_test_signal("noise", sr, sr, seed=9) * 0.05
    x[sr // 3: 2 * sr // 3] *= 10.0
    x = np.clip(x, -1, 1)
    sd = dict(bass_boost=2.0, multiband=True,
              low_thresh=-25.0, low_ratio=6.0, mid_thresh=-20.0,
              mid_ratio=3.0, high_thresh=-15.0, high_ratio=4.0)

    def oracle_chunk(seg):
        seg = oracles.int16_roundtrip(seg)
        seg = oracles.apply_eq(seg, sr, sd).astype(np.float64)
        seg = oracles.int16_roundtrip(seg)
        return oracles.multiband_compress(seg, sr, sd) / 32768.0

    want = np.concatenate([oracle_chunk(x[i:i + chunk].astype(np.float64))
                           for i in range(0, len(x), chunk)], axis=0) * AUTO

    s = MasterSettings.from_dict({**sd, "lufs": None, "mode": "compat",
                                  "compat_chunked": True})
    xq = quantize.int16_roundtrip(jnp.asarray(x))
    got, _ = master_graph(xq, sr, s)
    diff = np.abs(np.asarray(got, np.float64) * 32768.0 - want * 32768.0)
    assert np.median(diff) <= 1.0
    assert diff.max() <= 96, diff.max()


def test_quality_mode_runs_and_hits_lufs():
    x = make_test_signal("sweep", SR * 2, SR) * 0.3
    s = MasterSettings(bass_boost=2.0, presence_boost=1.0, width=1.2,
                       analog_character=20.0, multiband=True,
                       lufs=-14.0, mode="quality")
    y, info = master_graph(jnp.asarray(x), SR, s)
    from ame_tpu.ops.loudness import integrated_lufs
    out = float(integrated_lufs(y, SR))
    assert np.isfinite(np.asarray(y)).all()
    assert abs(out - (-14.0)) < 1.0, out  # limiter/compressor may trim a bit
    assert float(np.max(np.abs(np.asarray(y)))) <= 0.98 + 1e-5


def test_fused_matches_staged():
    """master_graph_fused (single program) must equal the staged graph."""
    from ame_tpu.graph.chain import master_graph_fused
    x = make_test_signal("noise", SR, SR) * 0.2
    s = MasterSettings(bass_boost=2.0, width=1.2, lufs=-14.0,
                       mode="quality")
    y1, i1 = master_graph(jnp.asarray(x), SR, s)
    y2, i2 = master_graph_fused(jnp.asarray(x), SR, s)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=1e-6, rtol=1e-5)
    assert abs(float(i1["gain_db"]) - float(i2["gain_db"])) < 1e-4


def test_n_valid_masks_padding():
    """Bucket padding must not skew the loudness gate when n_valid is
    passed (the API path): padded result == unpadded result."""
    n = SR  # 1 s
    x = make_test_signal("noise", n, SR, seed=3) * 0.2
    s = MasterSettings(lufs=-14.0, mode="quality")
    y_ref, info_ref = master_graph(jnp.asarray(x), SR, s)
    xp = np.concatenate([x, np.zeros((n // 2, 2), np.float32)])
    y_pad, info_pad = master_graph(jnp.asarray(xp), SR, s,
                                   n_valid=jnp.int32(n))
    assert abs(float(info_pad["gain_db"]) -
               float(info_ref["gain_db"])) < 1e-3
    np.testing.assert_allclose(np.asarray(y_pad[:n]), np.asarray(y_ref),
                               atol=1e-5)


def test_settings_dict_contract():
    """Unknown keys ignored; missing keys defaulted (SURVEY.md §2.2)."""
    x = make_test_signal("tone", SR // 2, SR) * 0.3
    y, _ = master_graph(jnp.asarray(x), SR,
                        {"bogus_key": 123, "bass_boost": 1.0, "lufs": None})
    assert np.isfinite(np.asarray(y)).all()


def test_loudnorm_targets_are_settings():
    """target_tp / target_lra are dynamic settings: a tightened LRA target
    pushes the same program from linear to dynamic mode without
    recompiling the graph structure."""
    x = make_test_signal("noise", SR * 8, SR, seed=6) * 0.05
    x[SR * 2: SR * 4] *= 2.0   # a few LU of range, below the default 11
    xq = quantize.int16_roundtrip(jnp.asarray(np.clip(x, -1, 1)))
    s1 = MasterSettings(lufs=-14.0, mode="compat")
    _, info1 = master_graph(xq, SR, s1)
    assert float(info1["input_lra"]) > 1.0
    assert float(info1["linear_mode"]) == 1.0
    s2 = MasterSettings(lufs=-14.0, mode="compat",
                        target_lra=float(info1["input_lra"]) - 0.5)
    _, info2 = master_graph(xq, SR, s2)
    assert float(info2["linear_mode"]) == 0.0
    assert s1.structure_key() == s2.structure_key()  # no re-specialization


def test_master_graph_gband_multiband():
    """G-band quality multiband (mb_edges) through the full graph: staged
    and fused paths agree; threshold changes re-run without restructuring;
    compat mode rejects it."""
    from ame_tpu.graph.chain import master_graph_fused

    n = SR
    x = jnp.asarray(make_test_signal("noise", n, SR, seed=9) * 0.3)
    s = MasterSettings(multiband=True, mb_edges=(150.0, 1000.0, 6000.0),
                       mb_thresholds=(-30.0, -28.0, -26.0, -24.0),
                       mb_ratios=(4.0, 3.0, 3.0, 5.0),
                       lufs=-14.0, mode="quality")
    y, info = master_graph(x, SR, s)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
    yf, _ = master_graph_fused(x, SR, s)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y), atol=2e-5)
    # same structure, new thresholds: identical structure key
    s2 = MasterSettings(multiband=True, mb_edges=(150.0, 1000.0, 6000.0),
                        mb_thresholds=(-10.0, -10.0, -10.0, -10.0),
                        mb_ratios=(2.0, 2.0, 2.0, 2.0),
                        lufs=-14.0, mode="quality")
    assert s.structure_key() == s2.structure_key()
    with pytest.raises(ValueError):
        master_graph(x, SR, MasterSettings(
            multiband=True, mb_edges=(250.0,), mode="compat"))


def test_gband_settings_validation():
    with pytest.raises(ValueError):
        MasterSettings(mb_edges=(4000.0, 250.0))          # not ascending
    with pytest.raises(ValueError):
        MasterSettings(mb_edges=(250.0,), mb_ratios=(2.0, 2.0, 2.0))
    with pytest.raises(ValueError):
        MasterSettings(mb_thresholds=(-20.0,))            # edges missing
    # lists coerce to tuples (hashability for the params cache)
    s = MasterSettings(mb_edges=[250.0, 4000.0])
    assert isinstance(s.mb_edges, tuple)
    hash(s)


def test_mb_edges_implies_multiband():
    """mb_edges alone must engage the multiband stage on EVERY surface
    (the CLI documents the implication; the frozen settings normalize it
    so graph/batch/sp/streaming all read one flag)."""
    from ame_tpu.config import MasterSettings
    s = MasterSettings(mb_edges=(250.0, 2000.0))
    assert s.multiband is True
    assert s.structure_key()[2] is True


@pytest.mark.parametrize("sr", [96000, 8000])
def test_extreme_sample_rates(sr):
    """The fixed-frequency chain must stay constructible and sane at
    96 kHz (all bands far below Nyquist) and 8 kHz (treble shelf and the
    4 kHz band sit AT/above Nyquist — the clamps keep scipy legal, quirk
    Q14 / the shelf Nyquist clamp)."""
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph

    n = 2 * sr
    x = make_test_signal("noise", n, sr, seed=2) * 0.2
    for mode in ("quality", "compat"):
        s = MasterSettings(bass_boost=2.0, treble_boost=1.0,
                           presence_boost=1.0, width=1.2,
                           lufs=-16.0, mode=mode)
        y, info = master_graph(jnp.asarray(x), sr, s)
        y = np.asarray(y)
        assert y.shape == x.shape and np.isfinite(y).all(), (sr, mode)
        assert np.abs(y).max() <= 1.001
