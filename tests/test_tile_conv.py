"""Differential tests for the MXU tile-convolution IIR engine
(ops/tile_conv.py) against the float64 scipy oracle — host-designed and
traced coefficients, zi/zf handoff, awkward lengths, and the filter bank.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import signal

from ame_tpu.dsp import design
from ame_tpu.ops.tile_conv import sosfilt_tileconv, sosfilt_tileconv_bank

SR = 44100.0


def _noise(n, c=2, seed=0):
    rng = np.random.default_rng(seed)
    return (0.3 * rng.standard_normal((n, c))).astype(np.float32)


def _scipy_ref(sos, x, zi=None):
    """scipy sosfilt in f64, converted to this codebase's trailing-2 zi
    layout ([k, C, 2]; scipy uses [k, 2, C] for axis=0 2-D input)."""
    sos64 = np.asarray(sos, np.float64)
    zi_s = (np.zeros((sos64.shape[0], 2, x.shape[1]))
            if zi is None else np.moveaxis(np.asarray(zi, np.float64), -1, 1))
    y, zf = signal.sosfilt(sos64, x.astype(np.float64), axis=0, zi=zi_s)
    return y, np.moveaxis(zf, 1, -1)


CASES = [
    ("butter2_lp", signal.butter(2, 250 / (SR / 2), "lowpass", output="sos")),
    ("butter4_bp", signal.butter(4, [900 / (SR / 2), 1100 / (SR / 2)],
                                 "bandpass", output="sos")),
    ("k_weighting", design.k_weighting_sos(SR)),
    # the reference's Nyquist-clamped peak band (quirk Q14) — the
    # numerically pathological design the host-f64 tables must survive
    ("ref_peak_q14", design.reference_peak_band_sos(SR, 4000.0, 1.41)),
]


@pytest.mark.parametrize("name,sos", CASES, ids=[c[0] for c in CASES])
def test_matches_scipy(name, sos):
    x = _noise(100_003)
    ref, zf_ref = _scipy_ref(sos, x)
    y, zf = sosfilt_tileconv(np.asarray(sos, np.float64), jnp.asarray(x))
    scale = np.max(np.abs(ref)) + 1e-30
    assert np.max(np.abs(np.asarray(y) - ref)) / scale < 5e-5
    assert np.max(np.abs(np.asarray(zf) - zf_ref)) < 1e-4 * scale


@pytest.mark.parametrize("n", [5, 37, 128, 129, 2176, 10_000])
def test_awkward_lengths(n):
    """Shorter than / exactly / just past tile boundaries — y and zf exact."""
    sos = signal.butter(2, 0.11, "lowpass", output="sos")
    x = _noise(n, seed=n)
    ref, zf_ref = _scipy_ref(sos, x)
    y, zf = sosfilt_tileconv(np.asarray(sos, np.float64), jnp.asarray(x))
    assert np.max(np.abs(np.asarray(y) - ref)) < 1e-5
    assert np.max(np.abs(np.asarray(zf) - zf_ref)) < 1e-5


def test_zi_handoff_exact():
    """Filtering [a|b] in two tile-conv calls with the zf->zi handoff must
    equal one call over the concatenation (the streaming-mode contract)."""
    sos = signal.butter(4, 0.2, "lowpass", output="sos")
    x = _noise(50_000, seed=3)
    y_full, zf_full = sosfilt_tileconv(sos, jnp.asarray(x))
    cut = 20_011
    y1, z1 = sosfilt_tileconv(sos, jnp.asarray(x[:cut]))
    y2, z2 = sosfilt_tileconv(sos, jnp.asarray(x[cut:]), zi=z1)
    y_cat = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert np.max(np.abs(y_cat - np.asarray(y_full))) < 1e-5
    assert np.max(np.abs(np.asarray(z2) - np.asarray(zf_full))) < 1e-5


def test_traced_coefficients():
    """Gain-dependent (traced) coefficients under jit — the quality-EQ
    path — build their tables in-graph and still match scipy."""
    sos_np = signal.butter(4, 0.12, "lowpass", output="sos")
    x = _noise(70_001, seed=5)

    @jax.jit
    def run(sos_traced, xx):
        return sosfilt_tileconv(sos_traced, xx)

    y, zf = run(jnp.asarray(sos_np, jnp.float32), jnp.asarray(x))
    ref, zf_ref = _scipy_ref(sos_np, x)
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(np.asarray(y) - ref)) / scale < 5e-5
    assert np.max(np.abs(np.asarray(zf) - zf_ref)) < 1e-4 * scale


def test_bank_matches_individual():
    """The fused G-filter bank equals per-filter runs (shared input)."""
    x = _noise(70_001, seed=7)
    lo = design.linkwitz_riley_sos(4, 250.0, "lowpass", SR)
    hp = design.linkwitz_riley_sos(4, 250.0, "highpass", SR)
    mid = np.concatenate([hp, design.linkwitz_riley_sos(
        4, 4000.0, "lowpass", SR)])
    outs = sosfilt_tileconv_bank([lo, mid], jnp.asarray(x))
    for sos, out in zip((lo, mid), outs):
        ref, _ = _scipy_ref(sos, x)
        scale = np.max(np.abs(ref))
        assert np.max(np.abs(np.asarray(out) - ref)) / scale < 5e-5


def test_sosfilt_scan_routes_tileconv():
    """The public entry point routes 2-D f32 inputs here by default and
    stays scipy-exact (guards the routing wiring)."""
    from ame_tpu.ops.scan_iir import _route_tileconv, sosfilt_scan
    x = jnp.asarray(_noise(10_000, seed=9))
    assert _route_tileconv(x)
    sos = signal.butter(4, 0.3, "highpass", output="sos")
    y, zf = sosfilt_scan(np.asarray(sos, np.float64), x)
    ref, zf_ref = _scipy_ref(sos, np.asarray(x))
    assert np.max(np.abs(np.asarray(y) - ref)) < 1e-4
    assert np.max(np.abs(np.asarray(zf) - zf_ref)) < 1e-4
