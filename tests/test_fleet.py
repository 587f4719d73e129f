"""Fleet runner: manifest checkpoint/resume semantics (SURVEY.md §5.4)."""

import json
import os

import numpy as np

from ame_tpu.io.wav import write_wav
from ame_tpu.parallel.fleet import run_fleet, Manifest
from tests.conftest import make_test_signal


def _make_tracks(d, names):
    os.makedirs(d, exist_ok=True)
    for i, n in enumerate(names):
        x = make_test_signal("noise", 4096, 44100, seed=i) * 0.2
        write_wav(os.path.join(d, n), x, 44100)


def test_fleet_and_resume(tmp_path):
    src = str(tmp_path / "in")
    dst = str(tmp_path / "out")
    _make_tracks(src, ["a.wav", "b.wav", "c.wav"])
    settings = {"bass_boost": 1.0, "lufs": None, "create_mp3": False}

    s1 = run_fleet(src, dst, settings)
    assert s1["done"] == 3 and s1["failed"] == 0
    assert os.path.exists(os.path.join(dst, "a_mastered.wav"))
    manifest = json.load(open(s1["manifest"]))
    assert all(manifest[t]["status"] == "done" for t in manifest)

    # resume: nothing re-runs
    s2 = run_fleet(src, dst, settings)
    assert s2["done"] == 0 and s2["resumed_skips"] == 3

    # a new track appears -> only it runs
    _make_tracks(src, ["d.wav"])
    s3 = run_fleet(src, dst, settings)
    assert s3["done"] == 1 and s3["resumed_skips"] == 3


def test_fleet_records_errors_and_continues(tmp_path):
    src = str(tmp_path / "in")
    dst = str(tmp_path / "out")
    _make_tracks(src, ["good.wav"])
    with open(os.path.join(src, "bad.wav"), "wb") as f:
        f.write(b"not audio at all")
    settings = {"lufs": None, "create_mp3": False}
    s = run_fleet(src, dst, settings)
    assert s["failed"] == 1 and s["done"] == 1
    manifest = json.load(open(s["manifest"]))
    assert manifest["bad.wav"]["status"] == "error"
    assert manifest["good.wav"]["status"] == "done"
    # failed tracks are retried on resume
    s2 = run_fleet(src, dst, settings)
    assert s2["failed"] == 1 and s2["resumed_skips"] == 1
