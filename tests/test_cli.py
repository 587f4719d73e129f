"""CLI smoke tests (in-process main() — subprocesses would recompile)."""

import json
import os

import numpy as np
import pytest

from ame_tpu.cli import main
from ame_tpu.io.wav import write_wav
from tests.conftest import make_test_signal


@pytest.fixture
def track(tmp_path):
    x = make_test_signal("noise", 4096, 44100) * 0.2
    p = str(tmp_path / "in.wav")
    write_wav(p, x, 44100)
    return p


def test_cli_master(track, tmp_path, capsys):
    out = str(tmp_path / "out.wav")
    rc = main(["master", track, out, "--bass", "2", "--no-lufs"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip())
    assert info["output_file"] == out
    assert os.path.exists(out)


def test_cli_master_preset(track, tmp_path, capsys):
    out = str(tmp_path / "p.wav")
    rc = main(["master", track, out, "--preset", "Bass Punch", "--no-lufs"])
    assert rc == 0 and os.path.exists(out)


def test_cli_analyze(track, capsys):
    rc = main(["analyze", track])
    assert rc == 0
    brief = json.loads(capsys.readouterr().out.strip())
    assert "mood" in brief or "error" in brief


def test_cli_fleet(track, tmp_path, capsys):
    src = str(tmp_path)  # contains in.wav
    dst = str(tmp_path / "out")
    rc = main(["fleet", src, dst, "--no-lufs"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["done"] == 1


def test_automaster_command(tmp_path, capsys):
    """CLI automaster: fit settings toward a bass-boosted reference and
    optionally master with them."""
    import json
    import jax.numpy as jnp
    from ame_tpu.cli import main
    from ame_tpu.io.wav import write_wav
    from ame_tpu.ops import eq
    from tests.conftest import make_test_signal

    sr = 44100
    x = make_test_signal("noise", sr, sr) * 0.2
    t = np.asarray(eq.apply_eq_quality(jnp.asarray(x), sr, 4.0, 0.0, 0.0,
                                       0.0))
    src = tmp_path / "src.wav"
    ref = tmp_path / "ref.wav"
    out = tmp_path / "out.wav"
    write_wav(str(src), x, sr)
    write_wav(str(ref), np.clip(t, -1, 1), sr)

    rc = main(["automaster", str(src), str(ref), str(out),
               "--steps", "40", "--lr", "0.1", "--no-lufs"])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines()
             if ln.startswith("{")]
    fitted = json.loads(lines[0])
    assert fitted["bass_boost"] > 0.5, fitted
    assert out.exists()


def test_measure_command(tmp_path, capsys):
    """CLI measure: BS.1770 stats for a known-level sine."""
    import json
    from ame_tpu.cli import main
    from ame_tpu.io.wav import write_wav

    sr = 48000
    t = np.arange(sr * 3) / sr
    tone = (0.5 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32)
    p = tmp_path / "tone.wav"
    write_wav(str(p), np.stack([tone, tone], axis=1), sr)

    assert main(["measure", str(p)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # stereo in-phase 997 Hz sine at 0.5 FS: I ~ -6 dBFS - 3.01 + ~0 dB
    # K-weighting at 1 kHz ~= -6.0 LUFS... measured against the BS.1770
    # anchors elsewhere; here assert the contract shape + sane ranges
    assert set(out) >= {"input_i", "input_lra", "input_tp", "sample_rate"}
    assert -8.0 < out["input_i"] < -4.0, out
    assert out["input_lra"] < 1.0
    assert abs(out["input_tp"] - 20 * np.log10(0.5)) < 0.2


def test_cli_profile(track, tmp_path, capsys):
    trace_dir = str(tmp_path / "trace")
    rc = main(["profile", track, "--runs", "2", "--lufs", "-16",
               "--bass", "1.5", "--trace", trace_dir])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["n_samples"] == 4096 and rep["mode"] == "quality"
    assert rep["x_realtime"] > 0 and rep["cold_start_s"] > 0
    # quality chain with lufs on: all four stages appear in the breakdown
    assert set(rep["stages_ms"]) == {"analog_eq_width", "loudnorm",
                                     "limiter"}
    assert all(v >= 0 for v in rep["stages_ms"].values())
    assert rep["host_rss_mb"] is None or rep["host_rss_mb"] > 0
    # the jax.profiler trace actually materialized
    assert os.path.isdir(trace_dir) and any(os.scandir(trace_dir))


def test_cli_profile_compat_stages(track, capsys):
    rc = main(["profile", track, "--runs", "1", "--mode", "compat",
               "--multiband", "--no-lufs"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert set(rep["stages_ms"]) == {"eq_width", "multiband", "limiter"}


def test_cli_analyze_batched(track, tmp_path, capsys):
    """Several inputs run through the batched Musicologist and report one
    brief per path (single-input stays the analyze_song contract)."""
    x = make_test_signal("tone", 4096, 44100) * 0.3
    p2 = str(tmp_path / "in2.wav")
    write_wav(p2, x, 44100)
    rc = main(["analyze", track, p2])
    assert rc == 0
    briefs = json.loads(capsys.readouterr().out.strip())
    assert set(briefs) == {track, p2}
    for b in briefs.values():
        assert "mood" in b and "tempo" in b


def test_cli_master_gband(track, tmp_path, capsys):
    out = str(tmp_path / "g.wav")
    rc = main(["master", track, out, "--mb-edges", "150,1000,6000",
               "--mb-ratios", "3,3,3,3", "--no-lufs"])
    assert rc == 0 and os.path.exists(out)
