"""Streaming mode: chunked processing with exact state handoff must equal
the offline quality chain (a capability-add over the reference, whose 30 s
chunking resets state at every boundary — quirk Q6)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ame_tpu.ops.eq import apply_eq_quality
from ame_tpu.ops.limiter import lookahead_limiter
from ame_tpu.ops.saturate import analog_character_quality
from ame_tpu.ops.stereo import stereo_width_quality
from ame_tpu.streaming import StreamingMaster
from tests.conftest import make_test_signal

SR = 44100


def _offline(x, settings, gain_db=0.0):
    """The offline quality chain (graph/chain._master_quality wiring,
    lufs replaced by a static gain)."""
    y = jnp.asarray(x, jnp.float32)
    if settings.get("analog_character", 0):
        y = analog_character_quality(y, SR,
                                     jnp.float32(settings["analog_character"]))
    y = apply_eq_quality(y, SR, settings.get("bass_boost", 0.0),
                         settings.get("mid_cut", 0.0),
                         settings.get("presence_boost", 0.0),
                         settings.get("treble_boost", 0.0))
    if settings.get("width", 1.0) != 1.0:
        y = stereo_width_quality(y, jnp.float32(settings["width"]))
    if settings.get("multiband"):
        from ame_tpu.graph.multiband import multiband_quality
        from ame_tpu.config import MasterSettings
        d = MasterSettings()
        y = multiband_quality(
            y, SR,
            jnp.asarray([settings.get("low_thresh", d.low_thresh),
                         settings.get("mid_thresh", d.mid_thresh),
                         settings.get("high_thresh", d.high_thresh)],
                        jnp.float32),
            jnp.asarray([settings.get("low_ratio", d.low_ratio),
                         settings.get("mid_ratio", d.mid_ratio),
                         settings.get("high_ratio", d.high_ratio)],
                        jnp.float32))
    y = y * 10.0 ** (gain_db / 20.0)
    return np.asarray(lookahead_limiter(y, SR))


def _stream(x, settings, chunk, gain_db=0.0):
    sm = StreamingMaster(SR, settings, gain_db=gain_db)
    outs = []
    for i in range(0, x.shape[0], chunk):
        outs.append(sm.process(x[i:i + chunk]))
    outs.append(sm.flush())
    return np.concatenate(outs, axis=0), sm


def _program(n):
    x = make_test_signal("noise", n, SR, seed=3) * 0.1
    x[n // 3: n // 2] *= 9.0  # hot section engages the limiter
    return np.clip(x, -1, 1).astype(np.float32)


@pytest.mark.parametrize("chunk", [4096, 11025])
def test_stream_equals_offline(chunk):
    settings = {"analog_character": 30.0, "bass_boost": 2.5, "mid_cut": 1.0,
                "presence_boost": -1.5, "treble_boost": 3.0, "width": 1.3}
    n = chunk * 3
    x = _program(n)
    want = _offline(x, settings, gain_db=-2.0)
    got, sm = _stream(x, settings, chunk, gain_db=-2.0)
    assert got.shape == want.shape  # stream emits every input sample
    assert sm.latency_samples == sm.attack - 1
    err = np.abs(got - want).max()
    assert err < 1e-4, err  # f32 segmented-scan rounding in the limiter


def test_stream_no_boundary_artifacts():
    """The handoff must be exact: errors at chunk boundaries must be no
    larger than anywhere else (the reference's Q6 reset would spike)."""
    settings = {"bass_boost": 4.0, "treble_boost": 4.0}
    chunk = 4096
    x = _program(chunk * 4)
    want = _offline(x, settings)
    got, _ = _stream(x, settings, chunk)
    err = np.abs(got - want).max(axis=1)
    for b in range(1, 4):
        around = err[b * chunk - 64: b * chunk + 64].max()
        assert around <= max(err.max() * 1.0 + 1e-12, 1e-6)


@pytest.mark.parametrize("chunk", [4096, 11025])
def test_stream_multiband_equals_offline(chunk):
    """Streaming multiband compression (crossover zi + detector history +
    release seed + attack-smoother zi carried) must equal the offline
    multiband_quality stage — ROADMAP round-2 feature."""
    settings = {"bass_boost": 1.5, "multiband": True,
                "low_thresh": -30.0, "low_ratio": 6.0,
                "mid_thresh": -25.0, "mid_ratio": 3.0,
                "high_thresh": -20.0, "high_ratio": 4.0}
    n = chunk * 3
    x = _program(n)
    want = _offline(x, settings, gain_db=-1.0)
    got, _ = _stream(x, settings, chunk, gain_db=-1.0)
    assert got.shape == want.shape
    err = np.abs(got - want).max()
    assert err < 2e-4, err


def test_stream_multiband_no_boundary_artifacts():
    settings = {"multiband": True, "low_thresh": -35.0, "mid_thresh": -30.0,
                "high_thresh": -28.0}
    chunk = 4096
    x = _program(chunk * 4)
    want = _offline(x, settings)
    got, _ = _stream(x, settings, chunk)
    err = np.abs(got - want).max(axis=1)
    for b in range(1, 4):
        around = err[b * chunk - 64: b * chunk + 64].max()
        assert around <= max(err.max() * 1.0 + 1e-12, 1e-6)


def test_stream_limiter_ceiling():
    x = _program(16384)
    got, _ = _stream(x, {"bass_boost": 5.0}, 8192, gain_db=6.0)
    assert np.abs(got).max() <= 0.98 + 1e-4


def test_stream_input_validation():
    sm = StreamingMaster(SR, {})
    with pytest.raises(ValueError):
        sm.process(np.zeros((10, 2), np.float32))  # below 2x lookahead
    with pytest.raises(ValueError):
        sm.process(np.zeros((5000,), np.float32))
    sm.process(np.zeros((4096, 2), np.float32))
    sm.flush()
    with pytest.raises(RuntimeError):
        sm.process(np.zeros((4096, 2), np.float32))
