"""Differential tests: associative-scan IIR vs scipy float64 oracles."""

import numpy as np
import pytest
from scipy.signal import butter, lfilter, sosfilt

import jax.numpy as jnp

from ame_tpu.dsp import design
from ame_tpu.ops.scan_iir import (
    biquad_scan, lfilter_scan, sosfilt_scan, sosfilt_chunked)
from tests.conftest import make_test_signal


def rel_err(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    denom = np.linalg.norm(want) + 1e-12
    return np.linalg.norm(got - want) / denom


SIGNALS = ["impulse", "tone", "sweep", "noise"]


@pytest.mark.parametrize("kind", SIGNALS)
@pytest.mark.parametrize("cutoff,btype", [(250.0, "low"), (8000.0, "high")])
def test_biquad_matches_scipy_lfilter(kind, cutoff, btype):
    sr = 44100
    x = make_test_signal(kind, 44100, sr, channels=1)
    b, a = design.butter_ba(2, cutoff / (0.5 * sr), btype)
    want = lfilter(b, a, x.astype(np.float64))
    got = lfilter_scan(b, a, jnp.asarray(x))
    assert rel_err(got, want) < 2e-4, (kind, btype)


@pytest.mark.parametrize("kind", SIGNALS)
def test_sos_bandpass_matches_scipy(kind):
    sr = 44100
    x = make_test_signal(kind, 44100, sr, channels=1)
    sos = design.reference_peak_band_sos(sr, 1000.0)
    want = sosfilt(sos, x.astype(np.float64))
    got, _ = sosfilt_scan(sos, jnp.asarray(x))
    assert rel_err(got, want) < 5e-4, kind


def test_stereo_axis_and_state_handoff():
    sr = 44100
    x = make_test_signal("noise", 30000, sr, channels=2)
    sos = design.butter_sos(4, 250.0, "lowpass", fs=sr)
    want = sosfilt(sos, x.astype(np.float64), axis=0)
    got = np.asarray(sosfilt_scan(sos, jnp.asarray(x))[0], np.float64)
    assert rel_err(got, want) < 2e-3  # 4 low-freq sections in f32: ~-64 dB

    # split into two chunks with explicit zi handoff == continuous result
    y1, zf = sosfilt_scan(sos, jnp.asarray(x[:13000]))
    y2, _ = sosfilt_scan(sos, jnp.asarray(x[13000:]), zi=zf)
    glued = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=0)
    # the handoff must not add error beyond the continuous scan itself
    assert rel_err(glued, got) < 2e-4


def test_zi_matches_scipy_convention():
    sr = 44100
    x = make_test_signal("noise", 8192, sr, channels=1).astype(np.float64)
    b, a = design.butter_ba(2, 1000 / (0.5 * sr), "low")
    zi = np.array([0.3, -0.2])
    want = lfilter(b, a, x, zi=zi)[0]
    coeffs = jnp.asarray(np.concatenate([b / a[0], a / a[0]]), jnp.float32)
    got, _ = biquad_scan(jnp.asarray(x, jnp.float32), coeffs,
                         zi=jnp.asarray(zi, jnp.float32))
    assert rel_err(got, want) < 2e-4


def test_chunked_reset_emulation():
    """sosfilt_chunked == scipy run independently per chunk (quirk Q6)."""
    sr = 1000
    chunk = 300
    x = make_test_signal("noise", 1000, sr, channels=2)
    sos = design.butter_sos(2, 100.0, "lowpass", fs=sr)
    want = np.concatenate(
        [sosfilt(sos, x[i:i + chunk].astype(np.float64), axis=0)
         for i in range(0, len(x), chunk)], axis=0)
    got = sosfilt_chunked(sos, jnp.asarray(x), chunk)
    assert rel_err(got, want) < 5e-4


def test_long_signal_stability():
    """f32 scan over 2M samples of a low-frequency pole stays near the
    float64 oracle (no drift blow-up)."""
    sr = 44100
    n = 2_000_000
    x = make_test_signal("noise", n, sr, channels=1)
    sos = design.butter_sos(2, 120.0, "lowpass", fs=sr)
    want = sosfilt(sos, x.astype(np.float64))
    got, _ = sosfilt_scan(sos, jnp.asarray(x))
    # worst-case filter (120 Hz pole, |p| ~ 0.994) in f32: ~-54 dB error
    # floor, uniform over time (no drift). Coupled-form state space would
    # tighten this further (roadmap).
    assert rel_err(got, want) < 3e-3
