"""Coefficient design parity + K-weighting sanity."""

import numpy as np
from scipy.signal import butter, sosfreqz

from ame_tpu.dsp import design


def test_butter_ba_parity():
    sr = 44100
    for cutoff, btype in [(250, "low"), (8000, "high"), (120, "low")]:
        b, a = design.butter_ba(2, cutoff / (0.5 * sr), btype)
        bw, aw = butter(2, cutoff / (0.5 * sr), btype=btype)
        np.testing.assert_allclose(b, bw, rtol=0, atol=0)
        np.testing.assert_allclose(a, aw, rtol=0, atol=0)


def test_reference_peak_band_clamps():
    # Quirk Q14: edges clamped to (1e-9, 0.999999)
    sos = design.reference_peak_band_sos(44100, 1000.0)
    assert sos.shape == (4, 6)  # order-4 bandpass = 8 poles = 4 sections
    # extreme center: high edge would exceed 1.0 -> clamp must not raise
    sos2 = design.reference_peak_band_sos(8000, 3900.0)
    assert np.all(np.isfinite(sos2))


def test_k_weighting_matches_itu_table_at_48k():
    """The design reproduces the BS.1770 published 48 kHz coefficients."""
    sos = design.k_weighting_sos(48000)
    itu1 = np.array([1.53512485958697, -2.69169618940638, 1.19839281085285,
                     1.0, -1.69065929318241, 0.73248077421585])
    itu2 = np.array([1.0, -2.0, 1.0,
                     1.0, -1.99004745483398, 0.99007225036621])
    np.testing.assert_allclose(sos[0], itu1, atol=1e-12)
    np.testing.assert_allclose(sos[1], itu2, atol=1e-12)


def test_k_weighting_response_any_rate():
    """K-weighting at 44.1 kHz: +0.691 dB at 997 Hz (offset term of the LUFS
    formula), ~+4.69 dB shelf plateau, deep low cut."""
    fs = 44100
    sos = design.k_weighting_sos(fs)
    w, h = sosfreqz(sos, worN=[20.0, 997.0, 10000.0], fs=fs)
    db = 20 * np.log10(np.abs(h))
    assert db[0] < -10.0
    assert abs(db[1] - 0.691) < 0.05
    assert 4.0 < db[2] < 5.2


def test_linkwitz_riley_flat_sum():
    """LR4 low + high crossover sums to (allpass) unity magnitude."""
    fs = 44100
    lo = design.linkwitz_riley_sos(4, 1000.0, "lowpass", fs)
    hi = design.linkwitz_riley_sos(4, 1000.0, "highpass", fs)
    freqs = np.logspace(1.3, 4.3, 200)
    _, hl = sosfreqz(lo, worN=freqs, fs=fs)
    _, hh = sosfreqz(hi, worN=freqs, fs=fs)
    mag = np.abs(hl + hh)
    np.testing.assert_allclose(mag, 1.0, atol=2e-3)
