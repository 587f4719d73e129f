"""Pallas one-pass cascade kernel vs the scipy oracle (interpret mode on
CPU — the same kernel code compiles natively on TPU, validated in the
on-chip probes; see ROADMAP)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.signal import sosfilt

from ame_tpu.dsp import design
from tests.conftest import make_test_signal


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("sos_fn,kind", [
    (lambda: design.butter_sos(2, 250.0, "lowpass", fs=44100), "noise"),
    (lambda: design.reference_peak_band_sos(44100, 1000.0), "sweep"),
])
def test_pallas_matches_scipy(sos_fn, kind, monkeypatch):
    import ame_tpu.ops.pallas_scan as PS
    monkeypatch.setattr(PS, "_TB", 1024)  # small blocks: fast interpret
    from ame_tpu.ops.pallas_scan import sosfilt_pallas
    sos = sos_fn()
    x = make_test_signal(kind, 3000, 44100) * 0.3  # non-multiple of TB
    y, zf = sosfilt_pallas(sos, jnp.asarray(x))
    want = sosfilt(sos, x.astype(np.float64), axis=0)
    rel = np.linalg.norm(np.asarray(y, np.float64) - want) \
        / np.linalg.norm(want)
    assert rel < 1e-5, rel
    # final state matches scipy's zi convention
    want_zf = None
    from scipy.signal import sosfilt_zi
    y2, want_zf = sosfilt(sos, x.astype(np.float64), axis=0,
                          zi=np.zeros((sos.shape[0], 2, x.shape[1])))
    got_zf = np.asarray(zf)  # [k, C, 2]
    np.testing.assert_allclose(got_zf, np.moveaxis(want_zf, 1, 2),
                               atol=1e-4, rtol=1e-3)


def test_pallas_zf_exact_for_partial_tail(monkeypatch):
    """When N is not a multiple of the kernel block, the final state must
    equal scipy's — the old trailing-pad + A^pad inverse amplified f32
    rounding into garbage for stable (ill-conditioned-inverse) filters.
    Front padding makes it exact by construction."""
    import jax.numpy as jnp
    from scipy.signal import butter, sosfilt
    from ame_tpu.ops import pallas_scan

    monkeypatch.setattr(pallas_scan, "_TB", 1 << 10)
    monkeypatch.setattr(pallas_scan.pl, "pallas_call",
                        _interpret_pallas_call())
    sos = butter(6, 800.0, btype="lowpass", fs=44100, output="sos")
    rng = np.random.default_rng(1)
    n = 3 * (1 << 10) + 345
    x = rng.normal(size=(n, 2)).astype(np.float32) * 0.3
    y, zf = pallas_scan.sosfilt_pallas(sos, jnp.asarray(x))
    want, zf_want = sosfilt(sos, x.astype(np.float64), axis=0,
                            zi=np.zeros((sos.shape[0], 2, 2)))
    assert np.abs(np.asarray(y) - want).max() < 1e-4
    zf_want_t = np.moveaxis(zf_want, 1, -1)
    assert np.abs(np.asarray(zf) - zf_want_t).max() < 1e-4


def _interpret_pallas_call():
    import functools
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    @functools.wraps(orig)
    def wrapper(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    return wrapper


def test_pallas_traced_coefficients(monkeypatch):
    """Quality-mode (gain-dependent) cascades route through the kernel with
    in-graph matrices: a traced 4-section RBJ EQ must match the XLA traced
    scan bit-closely."""
    import ame_tpu.ops.pallas_scan as PS
    import ame_tpu.ops.scan_iir as SI
    monkeypatch.setattr(PS, "_TB", 1024)
    from ame_tpu.ops.eq import (_rbj_peaking_coeffs_jnp,
                                _rbj_shelf_coeffs_jnp)
    sr = 44100.0
    sos = jnp.stack([
        _rbj_shelf_coeffs_jnp(250.0, sr, jnp.float32(3.0), 0.7071, "low"),
        _rbj_peaking_coeffs_jnp(1000.0, sr, jnp.float32(-2.0), 1.41),
        _rbj_peaking_coeffs_jnp(4000.0, sr, jnp.float32(1.5), 1.41),
        _rbj_shelf_coeffs_jnp(8000.0, sr, jnp.float32(2.0), 0.7071, "high"),
    ])
    x = jnp.asarray(make_test_signal("noise", 3000, 44100) * 0.3)
    y_pal, zf_pal = PS.sosfilt_pallas(sos, x)
    y_xla, zf_xla = SI._cascade_ks_traced(x, sos, None, 128, 4)
    assert np.abs(np.asarray(y_pal) - np.asarray(y_xla)).max() < 1e-4
    assert np.abs(np.asarray(zf_pal) - np.asarray(zf_xla)).max() < 1e-4


def test_pallas_zi_handoff(monkeypatch):
    """Splitting a stream at an arbitrary point with zi/zf handoff through
    the kernel must equal the continuous run."""
    import ame_tpu.ops.pallas_scan as PS
    monkeypatch.setattr(PS, "_TB", 1024)
    from scipy.signal import butter
    sos = butter(6, 2000.0, btype="lowpass", fs=44100, output="sos")
    x = (make_test_signal("noise", 4000, 44100) * 0.3).astype(np.float32)
    y_full, zf_full = PS.sosfilt_pallas(sos, jnp.asarray(x))
    cut = 2600  # not a TB multiple on either side
    y1, zf1 = PS.sosfilt_pallas(sos, jnp.asarray(x[:cut]))
    y2, zf2 = PS.sosfilt_pallas(sos, jnp.asarray(x[cut:]), zi=zf1)
    glued = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=0)
    assert np.abs(glued - np.asarray(y_full)).max() < 1e-5
    assert np.abs(np.asarray(zf2) - np.asarray(zf_full)).max() < 1e-5
