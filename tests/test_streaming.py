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


class TestCompatStreaming:
    """StreamingCompatMaster == the offline compat chunked graph (30 s
    block resets, Q5/Q6) with a continuous limiter, fed incrementally."""

    SRC = 16000  # keeps the 30 s block tractable on CPU

    def _x(self, n, seed=2):
        rng = np.random.default_rng(seed)
        t = np.arange(n) / self.SRC
        x = (0.2 * np.sin(2 * np.pi * 220 * t)
             + 0.1 * np.sin(2 * np.pi * 3000 * t)
             + 0.02 * rng.standard_normal(n))
        x *= 0.4 + 0.6 * np.sin(2 * np.pi * 0.25 * t) ** 2
        x = np.stack([x, 0.85 * x], axis=1).astype(np.float32)
        return np.round(np.clip(x, -1, 1) * 32767) / 32768

    def test_matches_offline_compat_chunked(self):
        from ame_tpu.config import MasterSettings
        from ame_tpu.graph.chain import master_graph
        from ame_tpu.streaming import StreamingCompatMaster

        n = int(2.4 * 30 * self.SRC)  # 2 full blocks + a partial tail
        x = self._x(n)
        s = MasterSettings(bass_boost=2.0, presence_boost=1.0, width=1.2,
                           analog_character=15.0, lufs=None, mode="compat",
                           compat_chunked=True)
        want, _ = master_graph(jnp.asarray(x), self.SRC, s)
        want = np.asarray(want)

        sm = StreamingCompatMaster(self.SRC, s)
        outs = []
        step = 100000  # deliberately unaligned with the 30 s block
        for i in range(0, n, step):
            outs.append(sm.process(x[i:i + step]))
        outs.append(sm.flush())
        got = np.concatenate([o for o in outs if len(o)], axis=0)
        assert got.shape == want.shape, (got.shape, want.shape)
        # the offline path quantizes through vmapped chunks, the streamer
        # per block: f32 op order can flip an int16 rounding tie by 1 LSB
        err = np.abs(got - want)
        assert err.max() <= 1.0 / 32768 + 1e-6, err.max()
        assert (err > 1e-6).mean() < 0.001

    def test_multiband_blocks(self):
        from ame_tpu.config import MasterSettings
        from ame_tpu.graph.chain import master_graph
        from ame_tpu.streaming import StreamingCompatMaster

        n = int(1.5 * 30 * self.SRC)
        x = self._x(n, seed=9)
        s = MasterSettings(multiband=True, low_thresh=-30.0, low_ratio=5.0,
                           mid_thresh=-25.0, mid_ratio=3.0,
                           high_thresh=-22.0, high_ratio=4.0,
                           lufs=None, mode="compat", compat_chunked=True)
        want = np.asarray(master_graph(jnp.asarray(x), self.SRC, s)[0])
        sm = StreamingCompatMaster(self.SRC, s)
        got = np.concatenate([sm.process(x), sm.flush()], axis=0)
        assert got.shape == want.shape
        # the exact compressor runs per block here vs vmapped chunks
        # offline; f32 detector/gain order differences land within a few
        # int16 LSBs on isolated samples
        err = np.abs(got - want)
        assert err.max() <= 8.0 / 32768, err.max()
        assert np.quantile(err, 0.999) <= 1.0 / 32768 + 1e-6
        assert np.median(err) == 0.0

    def test_short_stream(self):
        """A stream shorter than one block still masters (single partial
        block through the offline-limiter fallback)."""
        from ame_tpu.streaming import StreamingCompatMaster

        x = self._x(2000)
        sm = StreamingCompatMaster(self.SRC, {"bass_boost": 1.0,
                                              "mode": "compat"})
        assert sm.process(x).shape == (0, 2)
        out = sm.flush()
        assert out.shape == x.shape
        assert np.isfinite(out).all()


def test_stream_gband_multiband_equals_offline():
    """Streaming G-band multiband (mb_edges) must equal the offline
    multiband_quality_n stage — the same allpass-compensated LR4 tree
    cascades with carried zi."""
    import jax.numpy as jnp
    from ame_tpu.graph.multiband import multiband_quality_n
    from ame_tpu.ops.limiter import lookahead_limiter

    edges = (200.0, 1200.0, 5000.0)
    threshs = (-32.0, -30.0, -26.0, -24.0)
    ratios = (4.0, 3.0, 3.0, 5.0)
    n = 4096 * 3
    x = _program(n)
    y = multiband_quality_n(jnp.asarray(x), SR, edges,
                            jnp.asarray(threshs, jnp.float32),
                            jnp.asarray(ratios, jnp.float32))
    want = np.asarray(lookahead_limiter(y, SR))

    settings = {"mb_edges": edges, "mb_thresholds": threshs,
                "mb_ratios": ratios}
    got, _ = _stream(x, settings, 4096)
    assert got.shape == want.shape
    err = np.abs(got - want).max()
    assert err < 2e-4, err


def test_stream_compat_rejects_gband():
    from ame_tpu.streaming import StreamingCompatMaster
    with pytest.raises(ValueError):
        StreamingCompatMaster(SR, {"mb_edges": (250.0, 2000.0)})
