"""Multi-chip paths on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ame_tpu.parallel.mesh import make_mesh
from tests.conftest import make_test_signal

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_master_batch_dp():
    from ame_tpu.parallel.batch import master_batch
    from ame_tpu.config import MasterSettings
    mesh = make_mesh({"data": 8})
    xs = jnp.asarray(
        np.stack([make_test_signal("noise", 4096, 44100, seed=i) * 0.2
                  for i in range(8)]))
    s = MasterSettings(bass_boost=1.5, lufs=-14.0, mode="quality")
    ys = np.asarray(master_batch(xs, 44100.0, s, mesh=mesh))
    assert ys.shape == xs.shape
    assert np.isfinite(ys).all()
    # each track processed independently: identical inputs -> identical outs
    xs2 = jnp.asarray(np.stack([np.asarray(xs[0])] * 8))
    ys2 = np.asarray(master_batch(xs2, 44100.0, s, mesh=mesh))
    for b in range(1, 8):
        np.testing.assert_array_equal(ys2[b], ys2[0])


def test_sequence_parallel_matches_single_device():
    from ame_tpu.parallel.sequence import sosfilt_sequence_parallel
    from ame_tpu.ops.scan_iir import sosfilt_scan
    from ame_tpu.dsp import design
    mesh = make_mesh({"sp": 8})
    n = 1024 * 8
    x = jnp.asarray(make_test_signal("noise", n, 44100) * 0.3)
    sos = design.butter_sos(4, 250.0, "lowpass", fs=44100)
    y_sp = np.asarray(sosfilt_sequence_parallel(sos, x, mesh, axis="sp"))
    y_1, _ = sosfilt_scan(sos, x)
    np.testing.assert_allclose(y_sp, np.asarray(y_1), atol=2e-5)


def test_sequence_parallel_non_pow2_shards():
    """Shard lengths no longer need to be powers of two (the A^{local_n}
    composition happens on the host in float64)."""
    from ame_tpu.parallel.sequence import sosfilt_sequence_parallel
    from ame_tpu.ops.scan_iir import sosfilt_scan
    from ame_tpu.dsp import design
    mesh = make_mesh({"sp": 8})
    n = 1000 * 8  # local_n = 1000, not a power of two
    x = jnp.asarray(make_test_signal("sweep", n, 44100) * 0.3)
    sos = design.butter_sos(4, 4000.0, "highpass", fs=44100)
    y_sp = np.asarray(sosfilt_sequence_parallel(sos, x, mesh, axis="sp"))
    y_1, _ = sosfilt_scan(sos, x)
    np.testing.assert_allclose(y_sp, np.asarray(y_1), atol=2e-5)
    # boundary continuity: no spike right after a shard boundary
    err = np.abs(y_sp - np.asarray(y_1)).max(axis=-1)
    assert err[1000:1032].max() <= max(err.max(), 1e-7)


def test_sharded_train_step_runs_and_learns():
    from ame_tpu.parallel.train import make_sharded_train_step
    from ame_tpu.models import mood_cnn
    mesh = make_mesh({"data": 4, "model": 2})
    with mesh:
        init_fn, step_fn, place_batch = make_sharded_train_step(
            mesh, learning_rate=1e-3)
        params, opt_state = init_fn(0)
        rng = np.random.default_rng(0)
        # [0, 1] spectrogram-image-like inputs
        batch = jnp.asarray(rng.random(
            (8, mood_cnn.IMG_SIZE, mood_cnn.IMG_SIZE, 3)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 4, 8), jnp.int32)
        batch, labels = place_batch(batch, labels)
        # fixed dropout key: deterministic objective -> loss must descend
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(8):
            params, opt_state, loss, acc = step_fn(
                params, opt_state, batch, labels, key)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses


def test_master_batch_matches_single_track_graph():
    """The host-designed batch chain must match the single-track quality
    graph per track (coefficients designed in f64 numpy vs the graph's
    in-graph f32 design: tiny rounding differences only)."""
    import jax.numpy as jnp
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.parallel.batch import master_batch

    rng = np.random.default_rng(4)
    n = 1 << 15
    xs = jnp.asarray(0.15 * rng.standard_normal((3, n, 2)), jnp.float32)
    s = MasterSettings(bass_boost=2.0, presence_boost=1.0, mid_cut=1.0,
                       treble_boost=-1.0, width=1.3, analog_character=20.0,
                       multiband=True, lufs=-14.0)
    ys = np.asarray(master_batch(xs, 44100.0, s))
    for b in range(3):
        want, _ = master_graph(xs[b], 44100.0, s)
        np.testing.assert_allclose(ys[b], np.asarray(want), atol=3e-4)


def test_master_batch_stacked_matches_per_track():
    """Channel-stacked [N, 2B] fleet chain == the single-track quality
    chain per track (track-halved width/detector/loudness/limiter
    semantics), up to f32 reduction-order noise."""
    import numpy as np
    import jax.numpy as jnp
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.parallel.stacked import master_batch_stacked
    from ame_tpu.config import MasterSettings
    from tests.conftest import make_test_signal

    sr = 22050
    n = sr * 2
    tracks = []
    for i in range(3):
        x = make_test_signal("noise", n, sr, seed=10 + i) * (0.1 + 0.1 * i)
        x[:, 1] *= 0.8  # genuinely stereo so width/link semantics matter
        tracks.append(x.astype(np.float32))
    xs = np.stack(tracks)

    s = MasterSettings(bass_boost=2.0, width=1.3, analog_character=15.0,
                       multiband=True, lufs=-14.0, mode="quality")
    got = np.asarray(master_batch_stacked(xs, sr, s))
    assert got.shape == xs.shape
    for b in range(3):
        want, _ = master_graph(jnp.asarray(tracks[b]), sr, s)
        np.testing.assert_allclose(got[b], np.asarray(want),
                                   atol=5e-5, rtol=1e-4)


def test_sp_master_matches_single_chip():
    """The sequence-parallel FULL quality chain (one track time-sharded
    over 8 devices: exact sp-IIR EQ, psum'd gated loudness, halo'd true
    peak + limiter) must reproduce the single-chip master: same loudness
    decision and samplewise-close output (limiter warm-up term e^-20)."""
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.parallel.sp_master import master_sequence_parallel

    sr = 44100
    n = 8 * sr  # 8 s: 1 s shard per device, multiple of the 100 ms hop
    x = make_test_signal("noise", n, sr, seed=3) * 0.15
    t = np.arange(n) / sr
    x[:, 0] += 0.1 * np.sin(2 * np.pi * 220.0 * t)      # genuinely stereo
    x[n // 3: n // 3 + sr] *= 3.0                       # a loud section
    x = np.clip(x, -0.9, 0.9).astype(np.float32)

    s = MasterSettings(bass_boost=2.0, presence_boost=1.0, width=1.2,
                       analog_character=20.0, lufs=-14.0, mode="quality")
    mesh = make_mesh({"sp": 8})
    y_sp, info_sp = master_sequence_parallel(jnp.asarray(x), sr, s, mesh)
    y_1, info_1 = master_graph(jnp.asarray(x), sr, s)

    for k in ("input_i", "input_lra", "input_tp", "gain_db"):
        assert abs(float(info_sp[k]) - float(info_1[k])) < 2e-2, (
            k, float(info_sp[k]), float(info_1[k]))
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_1),
                               atol=3e-4, rtol=2e-3)


def test_sp_master_guards():
    from ame_tpu.config import MasterSettings
    from ame_tpu.parallel.sp_master import master_sequence_parallel

    mesh = make_mesh({"sp": 8})
    x = jnp.zeros((8 * 4410, 2), jnp.float32)
    with pytest.raises(ValueError):  # compat loudnorm needs >= 3.1 s
        master_sequence_parallel(x, 44100, MasterSettings(mode="compat"),
                                 mesh)
    with pytest.raises(ValueError):  # 8 shards of 4409.875 samples
        master_sequence_parallel(x[:-1], 44100,
                                 MasterSettings(lufs=-14.0), mesh)
    with pytest.raises(ValueError):  # shard not a hop multiple
        master_sequence_parallel(x[: 8 * 441], 44100,
                                 MasterSettings(lufs=-14.0), mesh)


def test_sp_master_padded_awkward_length():
    """Arbitrary-length front end: pad + n_valid masking must reproduce
    the single-chip master of the UNPADDED track (gate blocks that extend
    into the padding are dropped, true peak ignores the padding)."""
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.parallel.sp_master import master_sequence_parallel_padded

    sr = 44100
    n = 5 * sr + 12345  # awkward: not a shard/hop multiple
    x = make_test_signal("noise", n, sr, seed=11) * 0.12
    x[: sr] *= 2.5
    x = np.clip(x, -0.9, 0.9).astype(np.float32)

    s = MasterSettings(bass_boost=1.5, lufs=-14.0, mode="quality")
    mesh = make_mesh({"sp": 8})
    y_sp, info_sp = master_sequence_parallel_padded(
        jnp.asarray(x), sr, s, mesh)
    y_1, info_1 = master_graph(jnp.asarray(x), sr, s)

    assert y_sp.shape == (n, 2)
    for k in ("input_i", "input_lra", "input_tp", "gain_db"):
        assert abs(float(info_sp[k]) - float(info_1[k])) < 2e-2, (
            k, float(info_sp[k]), float(info_1[k]))
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_1),
                               atol=3e-4, rtol=2e-3)


def test_band_split_n_sum_is_magnitude_flat():
    """The allpass-compensated LR4 tree must recombine magnitude-flat at
    any band count (the uncompensated tree dips -4.4 dB at G=8), and at
    ratio=1 G-band "compression" must be spectrally transparent."""
    from ame_tpu.graph.multiband import quality_band_split_n

    sr, n = 44100, 1 << 15
    imp = np.zeros((n, 2), np.float32)
    imp[100] = 1.0
    f = np.fft.rfftfreq(n, 1 / sr)
    sel = (f > 20) & (f < 20000)
    for edges in [(250.0, 4000.0),
                  (150.0, 1000.0, 6000.0),
                  tuple(float(e) for e in np.geomspace(120, 8000, 7))]:
        bands = quality_band_split_n(jnp.asarray(imp), sr, edges)
        h = np.sum([np.asarray(b)[:, 0] for b in bands], axis=0)
        mag = np.abs(np.fft.rfft(h))[sel]
        assert mag.min() > 0.995 and mag.max() < 1.005, (
            len(edges) + 1, mag.min(), mag.max())


def test_multiband_band_parallel_matches_single_device():
    """One band per mesh slice (expert parallelism over the frequency
    axis) == the single-device G-band stage."""
    from ame_tpu.graph.multiband import multiband_quality_n
    from ame_tpu.parallel.bands import multiband_band_parallel

    mesh = make_mesh({"band": 4})
    edges = (150.0, 1000.0, 6000.0)
    th = [-26.0, -22.0, -19.0, -16.0]
    ra = [2.0, 2.5, 3.0, 4.0]
    x = make_test_signal("sweep", 1 << 14, 44100, seed=7) * 0.4
    x[:, 1] *= 0.7
    x = jnp.asarray(x.astype(np.float32))

    y_bp = np.asarray(multiband_band_parallel(
        x, 44100.0, edges, th, ra, mesh))
    y_1 = np.asarray(multiband_quality_n(x, 44100.0, edges, th, ra))
    np.testing.assert_allclose(y_bp, y_1, atol=3e-5, rtol=1e-4)


def test_multiband_band_parallel_wrong_mesh_size():
    from ame_tpu.parallel.bands import multiband_band_parallel

    mesh = make_mesh({"band": 4})
    x = jnp.zeros((4096, 2), jnp.float32)
    with pytest.raises(ValueError):
        multiband_band_parallel(x, 44100.0, (250.0,), [-20.0, -16.0],
                                [2.0, 3.0], mesh)


def test_sp_master_multiband_matches_single_chip():
    """Sequence-parallel MULTIBAND mastering: per-band sp IIR split, haloed
    detector, exact release/attack boundary carries — must reproduce the
    single-chip quality chain with multiband on."""
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.parallel.sp_master import master_sequence_parallel

    sr = 44100
    n = 8 * sr
    x = make_test_signal("noise", n, sr, seed=5) * 0.15
    t = np.arange(n) / sr
    x[:, 0] += 0.2 * np.sin(2 * np.pi * 180.0 * t)
    x[n // 2: n // 2 + sr] *= 2.5                      # trip the compressor
    x = np.clip(x, -0.9, 0.9).astype(np.float32)

    s = MasterSettings(bass_boost=1.5, width=1.2, multiband=True,
                       low_thresh=-30.0, mid_thresh=-28.0,
                       high_thresh=-30.0, lufs=-14.0, mode="quality")
    mesh = make_mesh({"sp": 8})
    y_sp, info_sp = master_sequence_parallel(jnp.asarray(x), sr, s, mesh)
    y_1, info_1 = master_graph(jnp.asarray(x), sr, s)
    for k in ("input_i", "gain_db"):
        assert abs(float(info_sp[k]) - float(info_1[k])) < 2e-2
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_1),
                               atol=5e-4, rtol=2e-3)


def test_sp_master_gband_multiband():
    """G-band mb_edges through the sequence-parallel chain."""
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.parallel.sp_master import master_sequence_parallel

    sr = 22050
    n = 8 * sr
    x = make_test_signal("sweep", n, sr, seed=6) * 0.3
    x[:, 1] *= 0.8
    x = x.astype(np.float32)
    s = MasterSettings(multiband=True, mb_edges=(200.0, 1500.0, 5000.0),
                       mb_thresholds=(-32.0, -30.0, -28.0, -30.0),
                       mb_ratios=(3.0, 3.0, 4.0, 4.0),
                       lufs=None, mode="quality")
    mesh = make_mesh({"sp": 8})
    y_sp, _ = master_sequence_parallel(jnp.asarray(x), sr, s, mesh)
    y_1, _ = master_graph(jnp.asarray(x), sr, s)
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_1),
                               atol=5e-4, rtol=2e-3)


# ---------------------------------------------------------------------------
# Sequence-parallel COMPAT mode
# ---------------------------------------------------------------------------

def test_sp_alimiter_matches_single_chip():
    """Exact cross-shard (max,x) piece carries: the sp alimiter must
    reproduce ops.limiter.alimiter_compat to float rounding."""
    from ame_tpu.ops.limiter import alimiter_compat
    from ame_tpu.parallel.sp_compat import _alimiter_sp

    sr = 8000
    n = 8 * 4000
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((n, 2)) * 0.4).astype(np.float32)
    x[n // 3: n // 3 + 600] *= 4.0          # hard limiting episode
    x[2 * n // 3] = 3.0                     # isolated spike (attack side)
    mesh = make_mesh({"sp": 8})
    y_sp = np.asarray(_alimiter_sp(jnp.asarray(x), sr, mesh, "sp"))
    y_1 = np.asarray(alimiter_compat(jnp.asarray(x), sr))
    np.testing.assert_allclose(y_sp, y_1, atol=2e-6, rtol=1e-5)


def test_sp_compat_chunked_matches_single_chip(monkeypatch):
    """Chunked compat (Q6 resets) over the mesh: analog+EQ+width+multiband
    stages run shard-local on whole chunks, loudnorm's controller runs
    replicated on gathered frame moments, alimiter carries are exact."""
    import ame_tpu.config as config
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.parallel.sp_master import master_sequence_parallel

    monkeypatch.setattr(config, "COMPAT_CHUNK_SECONDS", 1.0)
    sr = 16000                               # crossovers < Nyquist
    n = 8 * sr                               # 8 shards x 1 chunk
    x = make_test_signal("noise", n, sr, seed=11) * 0.15
    t = np.arange(n) / sr
    x[:, 0] += 0.2 * np.sin(2 * np.pi * 120.0 * t)
    x[:, 1] += 0.2 * np.sin(2 * np.pi * 120.0 * t + 0.2)
    x = np.clip(x, -0.99, 0.99).astype(np.float32)
    x = np.trunc(x * 32767.0) / 32768.0      # int16-grid input (compat io)

    s = MasterSettings(analog_character=20.0, bass_boost=2.0, width=1.2,
                       multiband=True, low_thresh=-28.0, mid_thresh=-26.0,
                       high_thresh=-28.0, lufs=-14.0, mode="compat",
                       compat_chunked=True)
    mesh = make_mesh({"sp": 8})
    y_sp, info_sp = master_sequence_parallel(jnp.asarray(x), sr, s, mesh)
    y_1, info_1 = master_graph(jnp.asarray(x), sr, s)
    for k in ("input_i", "input_thresh", "gain_db", "target_offset"):
        assert abs(float(info_sp[k]) - float(info_1[k])) < 5e-2, k
    assert float(info_sp["linear_mode"]) == float(info_1["linear_mode"])
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_1),
                               atol=2e-3, rtol=5e-3)


def test_sp_compat_unchunked_eq_lufs():
    """Unchunked compat (no multiband): quirk filters through the exact
    sp IIR, blends shard-local."""
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.parallel.sp_master import master_sequence_parallel

    sr = 8000
    n = 8 * 4000                             # 4 s
    x = make_test_signal("sweep", n, sr, seed=3) * 0.3
    x[:, 1] *= 0.7
    x = (np.trunc(x * 32767.0) / 32768.0).astype(np.float32)
    s = MasterSettings(bass_boost=3.0, mid_cut=1.0, presence_boost=2.0,
                       treble_boost=1.0, width=1.3, lufs=-16.0,
                       mode="compat")
    mesh = make_mesh({"sp": 8})
    y_sp, info_sp = master_sequence_parallel(jnp.asarray(x), sr, s, mesh)
    y_1, info_1 = master_graph(jnp.asarray(x), sr, s)
    assert abs(float(info_sp["input_i"]) - float(info_1["input_i"])) < 5e-2
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_1),
                               atol=2e-3, rtol=5e-3)


def test_sp_compat_dynamic_mode(monkeypatch):
    """Hot content trips the linear gates -> the dynamic controller path
    must match single-chip (same replicated controller code)."""
    import ame_tpu.config as config
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.parallel.sp_master import master_sequence_parallel

    monkeypatch.setattr(config, "COMPAT_CHUNK_SECONDS", 1.0)
    sr = 16000
    n = 8 * sr
    t = np.arange(n) / sr
    # quiet program + a hot transient: the pass-2 gain is strongly
    # positive and the true-peak gate fails -> dynamic engine
    x = np.stack([0.05 * np.sin(2 * np.pi * 330.0 * t),
                  0.05 * np.sin(2 * np.pi * 331.0 * t)], 1)
    x[3 * n // 5: 3 * n // 5 + 64] = 0.9
    x = (np.trunc(np.clip(x, -1, 1) * 32767.0) / 32768.0).astype(np.float32)
    s = MasterSettings(lufs=-14.0, mode="compat", compat_chunked=True)
    mesh = make_mesh({"sp": 8})
    y_sp, info_sp = master_sequence_parallel(jnp.asarray(x), sr, s, mesh)
    y_1, info_1 = master_graph(jnp.asarray(x), sr, s)
    assert float(info_1["linear_mode"]) == 0.0   # gates must actually fail
    assert float(info_sp["linear_mode"]) == 0.0
    assert abs(float(info_sp["output_i"]) - float(info_1["output_i"])) < 5e-2
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_1),
                               atol=2e-3, rtol=5e-3)


def test_sp_compat_guards():
    from ame_tpu.config import MasterSettings
    from ame_tpu.parallel.sp_master import master_sequence_parallel

    mesh = make_mesh({"sp": 8})
    x = jnp.zeros((8 * 800, 2), jnp.float32)
    with pytest.raises(ValueError):   # shard not a whole-chunk multiple
        master_sequence_parallel(
            x, 8000.0, MasterSettings(mode="compat", compat_chunked=True,
                                      lufs=None), mesh)
    with pytest.raises(ValueError):   # G-band is quality-mode only
        master_sequence_parallel(
            x, 16000.0, MasterSettings(mode="compat",
                                       mb_edges=(500.0,), lufs=None), mesh)


def test_master_array_shard_time(tmp_path):
    """api.master_array(shard_time=True) routes through the padded sp
    chain over all local devices and must match the single-chip master."""
    from ame_tpu.api import master_array

    sr = 16000
    n = int(5.3 * sr)                        # awkward length -> sp padding
    x = make_test_signal("noise", n, sr, seed=21) * 0.2
    s = {"bass_boost": 2.0, "width": 1.2, "lufs": -14.0, "mode": "quality"}
    p1 = str(tmp_path / "one.wav")
    p2 = str(tmp_path / "sp.wav")
    info_1 = master_array(x, sr, p1, dict(s))
    info_sp = master_array(x, sr, p2, dict(s), shard_time=True)
    assert abs(info_sp["gain_db"] - info_1["gain_db"]) < 5e-2
    from ame_tpu.io.wav import read_wav
    y1, _ = read_wav(p1)
    y2, _ = read_wav(p2)
    np.testing.assert_allclose(np.asarray(y2, np.float32),
                               np.asarray(y1, np.float32), atol=2e-3)


def test_cli_master_shard_time(tmp_path):
    from ame_tpu.cli import main
    from ame_tpu.io.wav import write_wav, read_wav

    sr = 16000
    x = make_test_signal("tone", 4 * sr, sr) * 0.4
    pin = str(tmp_path / "in.wav")
    pout = str(tmp_path / "out.wav")
    write_wav(pin, x, sr)
    rc = main(["master", pin, pout, "--bass", "1.5", "--no-lufs",
               "--shard-time"])
    assert rc == 0
    y, _ = read_wav(pout)
    assert y.shape[0] == 4 * sr and np.isfinite(y).all()


def test_sp_compat_padded_awkward_length(monkeypatch):
    """Arbitrary-length chunked compat through the padded wrapper: pads to
    ndev x chunk granule, masks the measurement, trims back."""
    import ame_tpu.config as config
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.parallel.sp_master import master_sequence_parallel_padded

    monkeypatch.setattr(config, "COMPAT_CHUNK_SECONDS", 1.0)
    sr = 16000
    n = int(6.7 * sr)                        # not a chunk or hop multiple
    x = make_test_signal("noise", n, sr, seed=13) * 0.2
    x = (np.trunc(np.clip(x, -1, 1) * 32767.0) / 32768.0).astype(np.float32)
    s = MasterSettings(bass_boost=2.0, multiband=True, lufs=-14.0,
                       mode="compat", compat_chunked=True)
    mesh = make_mesh({"sp": 8})
    y_sp, info_sp = master_sequence_parallel_padded(jnp.asarray(x), sr, s,
                                                    mesh)
    assert y_sp.shape[0] == n
    y_1, info_1 = master_graph(jnp.asarray(x), sr, s)
    assert abs(float(info_sp["input_i"]) - float(info_1["input_i"])) < 0.1
    assert float(info_sp["linear_mode"]) == float(info_1["linear_mode"])
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_1),
                               atol=3e-3, rtol=5e-3)


def test_sp_compat_unchunked_multiband_matches_single_chip():
    """Unchunked compat MULTIBAND over the mesh: subtractive crossover
    through the sp IIR, haloed integer-RMS detector, and the whole-track
    exact pydub gain via shard-level Jacobi carry relaxation — must
    reproduce the single-chip chain."""
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.parallel.sp_master import master_sequence_parallel

    sr = 16000
    n = 8 * sr
    x = make_test_signal("noise", n, sr, seed=17) * 0.1
    t = np.arange(n) / sr
    x[:, 0] += 0.25 * np.sin(2 * np.pi * 150.0 * t)
    x[:, 1] += 0.25 * np.sin(2 * np.pi * 150.0 * t + 0.3)
    x[n // 2: n // 2 + sr // 2] *= 3.0              # drive the compressor
    x = (np.trunc(np.clip(x, -1, 1) * 32767.0) / 32768.0).astype(np.float32)

    s = MasterSettings(bass_boost=1.5, multiband=True, low_thresh=-30.0,
                       mid_thresh=-28.0, high_thresh=-30.0,
                       low_ratio=4.0, mid_ratio=3.0, high_ratio=4.0,
                       lufs=-14.0, mode="compat")
    mesh = make_mesh({"sp": 8})
    y_sp, info_sp = master_sequence_parallel(jnp.asarray(x), sr, s, mesh)
    y_1, info_1 = master_graph(jnp.asarray(x), sr, s)
    assert abs(float(info_sp["input_i"]) - float(info_1["input_i"])) < 5e-2
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_1),
                               atol=2e-3, rtol=5e-3)


def test_pydub_gain_sp_exact_vs_single():
    """The shard-level Jacobi relaxation must equal the single-track gain
    engine bit-for-bit — including content engineered so state crosses
    EVERY shard boundary (a never-zero slow ramp)."""
    from functools import partial
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from ame_tpu.ops.pydub_gain import pydub_gain_multi
    from ame_tpu.parallel.sp_compat import _pydub_gain_sp

    n = 8 * 4096
    rng = np.random.default_rng(23)
    m_noise = np.maximum(0.0, rng.standard_normal(n)).astype(np.float32) * 5
    m_noise[rng.random(n) < 0.5] = 0.0
    # adversarial: never zero, never clamps -> carries stay live at every
    # boundary and the relaxation must run its exactness-by-propagation
    # sweeps rather than converge early
    m_ramp = (4.0 + np.sin(np.arange(n) / 3000.0)).astype(np.float32)
    m = np.stack([m_noise, m_ramp], axis=1)
    a_f, r_f = 80.0, 800.0

    mesh = make_mesh({"sp": 8})
    fn = shard_map(partial(_pydub_gain_sp, attack_frames=a_f,
                           release_frames=r_f, axis="sp"),
                   mesh=mesh, in_specs=P("sp", None),
                   out_specs=P("sp", None), check_vma=False)
    got = np.asarray(jax.jit(fn)(jnp.asarray(m)))
    want = np.stack([np.asarray(a) for a in pydub_gain_multi(
        [jnp.asarray(m[:, 0]), jnp.asarray(m[:, 1])], a_f, r_f)], axis=1)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [31, 32])
def test_sp_compat_randomized_settings(monkeypatch, seed):
    """Randomized settings/content sweep: the sp compat chain must track
    the single-chip graph across random slider positions, chunked and
    unchunked."""
    import ame_tpu.config as config
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.parallel.sp_master import master_sequence_parallel

    monkeypatch.setattr(config, "COMPAT_CHUNK_SECONDS", 1.0)
    rng = np.random.default_rng(seed)
    sr = 16000
    n = 8 * sr
    x = make_test_signal("noise", n, sr, seed=seed) * float(
        rng.uniform(0.05, 0.3))
    t = np.arange(n) / sr
    x[:, 0] += 0.15 * np.sin(2 * np.pi * rng.uniform(100, 400) * t)
    x[:, 1] *= 0.9
    x = (np.trunc(np.clip(x, -1, 1) * 32767.0) / 32768.0).astype(np.float32)

    chunked = bool(seed % 2)
    s = MasterSettings(
        analog_character=float(rng.uniform(0, 40)),
        bass_boost=float(rng.uniform(-2, 3)),
        mid_cut=float(rng.uniform(0, 2)),
        presence_boost=float(rng.uniform(-1, 2)),
        treble_boost=float(rng.uniform(-1, 2)),
        width=float(rng.uniform(0.8, 1.5)),
        multiband=True,
        low_thresh=float(rng.uniform(-35, -20)),
        mid_thresh=float(rng.uniform(-35, -20)),
        high_thresh=float(rng.uniform(-35, -20)),
        low_ratio=float(rng.uniform(2, 6)),
        mid_ratio=float(rng.uniform(2, 6)),
        high_ratio=float(rng.uniform(2, 6)),
        lufs=float(rng.uniform(-18, -10)),
        mode="compat", compat_chunked=chunked)
    mesh = make_mesh({"sp": 8})
    y_sp, info_sp = master_sequence_parallel(jnp.asarray(x), sr, s, mesh)
    y_1, info_1 = master_graph(jnp.asarray(x), sr, s)
    i_sp, i_1 = float(info_sp["input_i"]), float(info_1["input_i"])
    if np.isfinite(i_1) or np.isfinite(i_sp):
        assert abs(i_sp - i_1) < 0.1
    assert float(info_sp["linear_mode"]) == float(info_1["linear_mode"])
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_1),
                               atol=3e-3, rtol=5e-3)


def test_init_distributed_noop_single_host():
    """Without a multi-process env contract, init_distributed is a no-op
    returning 1 (single-host boxes keep working untouched)."""
    import os
    from ame_tpu.parallel.mesh import init_distributed
    saved = {k: os.environ.pop(k, None)
             for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                       "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES")}
    try:
        assert init_distributed() == 1
    finally:
        for k, v in saved.items():
            if v is not None:
                os.environ[k] = v


def test_sp_single_device_mesh():
    """shard_time on a 1-device box (or AME_TPU_SP_DEVICES=1) routes
    through the sp chain with ndev=1 — every collective degenerates and
    the result must still match the single-chip graph."""
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph
    from ame_tpu.parallel.sp_master import master_sequence_parallel

    sr = 16000
    n = 4 * sr
    x = make_test_signal("noise", n, sr, seed=41) * 0.2
    x = (np.trunc(np.clip(x, -1, 1) * 32767.0) / 32768.0).astype(np.float32)
    mesh = make_mesh({"sp": 1}, devices=jax.devices()[:1])
    for mode in ("quality", "compat"):
        s = MasterSettings(bass_boost=2.0, multiband=True, lufs=-14.0,
                           mode=mode)
        y_sp, _ = master_sequence_parallel(jnp.asarray(x), sr, s, mesh)
        y_1, _ = master_graph(jnp.asarray(x), sr, s)
        np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_1),
                                   atol=2e-3, rtol=5e-3)


def test_pydub_gain_sp_pallas_interpret(monkeypatch):
    """The KERNEL engines (via the Pallas interpreter) inside the
    shard-relaxation's shard_map + while_loop — the same composition the
    real-TPU sp compat path lowers — must equal the single-track engine.
    The plain-CPU suite otherwise only ever exercises the scan path."""
    from functools import partial
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from ame_tpu.ops.pydub_gain import pydub_gain_multi
    from ame_tpu.parallel.sp_compat import _pydub_gain_sp

    monkeypatch.setenv("AME_TPU_SP_GAIN_INTERPRET", "1")
    n = 4 * (1 << 16)                        # big enough for real tiles
    rng = np.random.default_rng(29)
    m1 = np.maximum(0.0, rng.standard_normal(n)).astype(np.float32) * 4
    m1[rng.random(n) < 0.5] = 0.0
    m = m1[:, None]
    mesh = make_mesh({"sp": 4}, devices=jax.devices()[:4])
    fn = shard_map(partial(_pydub_gain_sp, attack_frames=220.5,
                           release_frames=2205.0, axis="sp"),
                   mesh=mesh, in_specs=P("sp", None),
                   out_specs=P("sp", None), check_vma=False)
    got = np.asarray(jax.jit(fn)(jnp.asarray(m)))[:, 0]
    want = np.asarray(pydub_gain_multi([jnp.asarray(m1)], 220.5,
                                       2205.0)[0])
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_shard_time_device_cap(tmp_path, monkeypatch):
    """AME_TPU_SP_DEVICES caps the sp pool (operator reserves chips for
    per-device serve workers); a malformed value fails loudly instead of
    silently degrading."""
    from ame_tpu.api import SpConfigError, master_array

    sr = 16000
    x = make_test_signal("tone", 2 * sr, sr) * 0.3
    monkeypatch.setenv("AME_TPU_SP_DEVICES", "2")
    msgs = []
    master_array(x, sr, str(tmp_path / "a.wav"), {"lufs": None},
                 msgs.append, lambda c, t: None, shard_time=True)
    assert any("over 2 devices" in m for m in msgs), msgs

    monkeypatch.setenv("AME_TPU_SP_DEVICES", "many")
    with pytest.raises(SpConfigError):
        master_array(x, sr, str(tmp_path / "b.wav"), {"lufs": None},
                     msgs.append, lambda c, t: None, shard_time=True)
