"""Musicologist tests: feature behavior + brief contract (ai_tagger parity)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ame_tpu.analysis import features as F
from ame_tpu.analysis import musicologist as M
from ame_tpu.analysis import stft as S
from ame_tpu.io import wav as W
from tests.conftest import make_test_signal

ASR = 22050


def _click_track(bpm, seconds=10, sr=ASR):
    n = int(seconds * sr)
    y = np.zeros(n, np.float32)
    period = int(60 / bpm * sr)
    for i in range(0, n, period):
        y[i:i + 80] += np.hanning(80).astype(np.float32) * 0.9
    return y


@pytest.mark.parametrize("bpm", [90, 128])
def test_tempo_estimation(bpm):
    y = _click_track(bpm)
    got = float(F.tempo_bpm(jnp.asarray(y), float(ASR)))
    # accept octave-exact matches within 3 BPM
    candidates = [bpm / 2, bpm, bpm * 2]
    assert min(abs(got - c) for c in candidates) < 3.0, got


def test_centroid_orders_bright_vs_dark():
    t = np.arange(ASR * 2) / ASR
    dark = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    bright = np.sin(2 * np.pi * 6000 * t).astype(np.float32)
    c_dark = float(F.spectral_centroid_mean(jnp.asarray(dark), float(ASR)))
    c_bright = float(F.spectral_centroid_mean(jnp.asarray(bright), float(ASR)))
    assert c_dark < 1000 < 2000 < c_bright


def test_rms_scaling():
    y = make_test_signal("noise", ASR, ASR, channels=1)
    r1 = float(F.rms_mean(jnp.asarray(y)))
    r2 = float(F.rms_mean(jnp.asarray(y * 2)))
    assert abs(r2 / r1 - 2.0) < 0.01


def test_bucket_thresholds_exact():
    """The reference's exact thresholds (ai_tagger.py:87-89)."""
    assert F.classify(121, 0, 0)["tempo_class"] == "fast"
    assert F.classify(120, 0, 0)["tempo_class"] == "moderate"
    assert F.classify(90, 0, 0)["tempo_class"] == "slow"
    assert F.classify(0, 2001, 0)["brightness"] == "bright"
    assert F.classify(0, 2000, 0)["brightness"] == "warm"
    assert F.classify(0, 1000, 0)["brightness"] == "dark"
    assert F.classify(0, 0, 0.11)["density"] == "dense"
    assert F.classify(0, 0, 0.09)["density"] == "moderate"
    assert F.classify(0, 0, 0.04)["density"] == "sparse"


def test_spectrogram_image_shape_and_range():
    y = make_test_signal("sweep", ASR * 3, ASR, channels=1)
    img = np.asarray(M.spectrogram_image(jnp.asarray(y)))
    assert img.shape == (128, 128, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert (img[..., 0] == img[..., 1]).all()


def test_analyze_song_brief_contract(tmp_path):
    x = make_test_signal("noise", 44100 * 3, 44100) * 0.2
    p = str(tmp_path / "song.wav")
    W.write_wav(p, x, 44100)
    brief = M.analyze_song(p)
    assert set(brief) == {"mood", "tempo", "brightness", "density", "key"}
    assert brief["mood"] in ("Angry/Anxious", "Calm/Content",
                             "Happy/Excited", "Sad/Depressed")
    assert "BPM (" in brief["tempo"]
    assert brief["brightness"] in ("bright", "warm", "dark")
    assert brief["density"] in ("dense", "moderate", "sparse")


def test_analyze_song_error_contract(tmp_path):
    brief = M.analyze_song(str(tmp_path / "missing.wav"))
    assert "error" in brief


def test_mel_filterbank_properties():
    fb = S.mel_filterbank(22050, 2048, 128)
    assert fb.shape == (128, 1025)
    assert (fb >= 0).all()
    # every filter has support; slaney normalization keeps areas ~equal
    assert (fb.sum(axis=1) > 0).all()


def test_frame_signal_slice_path_matches_naive():
    """The hop-tiled slice framing (TPU fast path) must be bit-identical to
    naive strided framing, for both divisible and non-divisible
    frame/hop ratios and with/without centering."""
    import jax.numpy as jnp
    from ame_tpu.analysis.stft import frame_signal
    rng = np.random.default_rng(0)
    for n, fl, hop, center in [(22050, 2048, 512, True),
                               (2048, 2048, 512, True),
                               (2048 + 512 * 3, 2048, 512, False),
                               (6000, 2000, 512, True),
                               (4096, 1024, 256, False)]:
        y = rng.standard_normal(n).astype(np.float32)
        got = np.asarray(frame_signal(jnp.asarray(y), fl, hop, center))
        yp = np.pad(y, fl // 2) if center else y
        nf = 1 + (len(yp) - fl) // hop
        want = np.stack([yp[i * hop:i * hop + fl] for i in range(nf)])
        assert got.shape == want.shape
        assert np.array_equal(got, want)


def test_analyze_batch_mixed_paths(tmp_path):
    """Batched analysis: valid tracks get briefs, broken paths get error
    dicts, order preserved."""
    from ame_tpu.analysis.musicologist import analyze_batch, analyze_song
    from ame_tpu.io.wav import write_wav

    sr = 22050
    t = np.arange(sr * 2) / sr
    a = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    b = (0.2 * np.sin(2 * np.pi * 2000 * t)
         + 0.1 * np.sin(2 * np.pi * 70 * t)).astype(np.float32)
    pa, pb = tmp_path / "a.wav", tmp_path / "b.wav"
    write_wav(str(pa), np.stack([a, a], 1), sr)
    write_wav(str(pb), np.stack([b, b], 1), sr)

    briefs = analyze_batch([str(pa), str(tmp_path / "missing.wav"),
                            str(pb)])
    assert len(briefs) == 3
    assert "error" in briefs[1]
    for i, p in ((0, pa), (2, pb)):
        assert set(briefs[i]) == {"mood", "tempo", "brightness",
                                  "density", "key"}
        # batched result must agree with the single-track path
        assert briefs[i] == analyze_song(str(p))


def test_analyze_batch_mixed_lengths_one_dispatch_per_group(tmp_path):
    """Different-length tracks group by conditioned length; every group
    runs as ONE _analyze_batch_jit dispatch and results still match the
    single-track path exactly."""
    from ame_tpu.analysis import musicologist as M
    from ame_tpu.io.wav import write_wav

    sr = 22050
    paths = []
    for i, secs in enumerate((2.0, 3.0, 2.0)):
        t = np.arange(int(sr * secs)) / sr
        y = (0.3 * np.sin(2 * np.pi * (200 + 300 * i) * t)).astype(
            np.float32)
        p = tmp_path / f"t{i}.wav"
        write_wav(str(p), np.stack([y, y], 1), sr)
        paths.append(str(p))

    calls = []
    orig = M._analyze_batch_jit

    def counting(params, ys):
        calls.append(ys.shape)
        return orig(params, ys)

    M._analyze_batch_jit, briefs = counting, None
    try:
        briefs = M.analyze_batch(paths)
    finally:
        M._analyze_batch_jit = orig
    assert sorted(c[0] for c in calls) == [1, 2]  # two length groups
    for p, brief in zip(paths, briefs):
        assert brief == M.analyze_song(p)


def test_key_detection_synthetic():
    """Key estimate (capability-add): tonal content with an emphasized
    tonic must classify to the right key for clear major/minor cases."""
    import jax.numpy as jnp
    from ame_tpu.analysis import features as F
    from ame_tpu.analysis import stft as S

    sr = 22050.0
    n = int(6 * sr)
    t = np.arange(n) / sr

    def tone(midi, amp):
        f = 440.0 * 2 ** ((midi - 69) / 12.0)
        return amp * np.sin(2 * np.pi * f * t)

    # C major: C-E-G triad over octaves, tonic emphasized
    cmaj = (tone(60, 1.0) + tone(64, 0.55) + tone(67, 0.65)
            + tone(72, 0.5) + tone(48, 0.7) + tone(62, 0.2)
            + tone(65, 0.2) + tone(69, 0.2) + tone(71, 0.2))
    # A minor: A-C-E triad, tonic emphasized
    amin = (tone(57, 1.0) + tone(60, 0.55) + tone(64, 0.65)
            + tone(69, 0.5) + tone(45, 0.7) + tone(59, 0.2)
            + tone(62, 0.2) + tone(65, 0.2) + tone(67, 0.2))
    for sig, want in ((cmaj, "C major"), (amin, "A minor")):
        mag = S.stft_mag(jnp.asarray(sig * 0.1, jnp.float32), 2048, 512)
        idx = int(F.key_index(mag, sr))
        assert F.key_name(idx) == want, (F.key_name(idx), want)


def test_brief_includes_key():
    import jax.numpy as jnp
    from ame_tpu.analysis import musicologist as M

    sr = M.ANALYSIS_SR
    t = np.arange(int(4 * sr)) / sr
    y = (0.2 * np.sin(2 * np.pi * 261.63 * t)
         + 0.1 * np.sin(2 * np.pi * 329.63 * t)
         + 0.12 * np.sin(2 * np.pi * 392.0 * t)).astype(np.float32)
    brief = M.analyze_waveform(jnp.asarray(y))
    assert set(brief) >= {"mood", "tempo", "brightness", "density", "key"}
    assert brief["key"].split()[1] in ("major", "minor")
