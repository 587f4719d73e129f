"""Native async data loader (io/native/ameloader.cpp via io/loader.py):
decode parity with the pure-Python codecs, in-order delivery, and the
per-file fallback/degrade contract."""

import numpy as np
import pytest

from ame_tpu.io import read_audio
from ame_tpu.io.loader import PrefetchLoader, _lib
from ame_tpu.io.wav import write_wav

SR = 22050


def _tracks(tmp_path, n=5):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        x = (rng.standard_normal((SR // 2 + i * 37, 2)) * 0.2).astype(
            np.float32)
        p = str(tmp_path / f"t{i}.wav")
        write_wav(p, x, SR, bits=[16, 24, 32, 16, 24][i % 5])
        paths.append(p)
    return paths


def test_native_loader_available():
    assert _lib() is not None, "ameloader shim failed to build/bind"


def test_loader_matches_python_decoders(tmp_path):
    paths = _tracks(tmp_path)
    got = list(PrefetchLoader(paths, workers=3))
    assert [g[0] for g in got] == paths  # submission order
    for p, audio, sr in got:
        want, wsr = read_audio(p)
        assert sr == wsr
        np.testing.assert_array_equal(audio, want)


def test_loader_fallback_for_non_native_format(tmp_path):
    """AIFF isn't native-decodable: the loader must fall back to the
    Python decoder transparently."""
    import struct

    x = (np.sin(2 * np.pi * 440 * np.arange(SR) / SR) * 0.3)
    pcm = (x * 32767).astype(">i2")

    def ext80(rate):
        # 80-bit extended float for the AIFF rate field
        import math
        m, e = math.frexp(rate)
        return struct.pack(">HQ", e + 16382, int(m * (1 << 64)))

    comm = struct.pack(">HIH", 1, len(pcm), 16) + ext80(SR)
    ssnd = struct.pack(">II", 0, 0) + pcm.tobytes()
    body = (b"AIFF"
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    p = str(tmp_path / "a.aiff")
    with open(p, "wb") as f:
        f.write(b"FORM" + struct.pack(">I", len(body)) + body)

    got = list(PrefetchLoader([p], workers=1))
    assert len(got) == 1
    path, audio, sr = got[0]
    want, wsr = read_audio(p)
    assert sr == wsr
    np.testing.assert_array_equal(audio, want)


def test_loader_corrupt_file_yields_error(tmp_path):
    good = _tracks(tmp_path, 2)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFFgarbage")
    items = list(PrefetchLoader([good[0], bad, good[1]], workers=2))
    assert items[0][1] is not None and items[2][1] is not None
    assert items[1][1] is None
    assert isinstance(items[1][2], Exception)


def test_fleet_uses_loader(tmp_path):
    """End-to-end: run_fleet over a small dir (incl. one broken file)
    masters everything else and marks the broken one."""
    from ame_tpu.parallel.fleet import run_fleet

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        x = (rng.standard_normal((SR, 2)) * 0.1).astype(np.float32)
        write_wav(str(indir / f"s{i}.wav"), x, SR)
    with open(indir / "broken.wav", "wb") as f:
        f.write(b"RIFFnope")
    summary = run_fleet(str(indir), str(outdir),
                        {"lufs": None, "bass_boost": 1.0})
    assert summary["done"] == 2
    assert summary["failed"] == 1
