"""Art Director tests: prompt synthesis semantics (C15) + provider registry."""

import random

import numpy as np
import pytest

from ame_tpu.creative import art
from ame_tpu.creative.prompts import PROMPT_LIBRARY, generate_creative_prompt


def test_library_schema():
    """Axes and keys must match the reference's taxonomy exactly."""
    assert set(PROMPT_LIBRARY) == {"mood", "brightness", "density", "tempo"}
    assert set(PROMPT_LIBRARY["mood"]) == {
        "Happy/Excited", "Calm/Content", "Angry/Anxious", "Sad/Depressed"}
    assert set(PROMPT_LIBRARY["brightness"]) == {"bright", "warm", "dark"}
    assert set(PROMPT_LIBRARY["density"]) == {"dense", "moderate", "sparse"}
    assert set(PROMPT_LIBRARY["tempo"]) == {"fast", "moderate", "slow"}


def test_prompt_composition_and_tempo_parse():
    """Quirk Q15: tempo key parsed from '<n> BPM (fast)'."""
    brief = {"mood": "Happy/Excited", "tempo": "128 BPM (fast)",
             "brightness": "bright", "density": "dense"}
    rng = random.Random(0)
    p = generate_creative_prompt(brief, rng)
    assert p.startswith("An award-winning piece of ")
    assert p.endswith(".")
    # one phrase from each axis present
    assert any(s in p for s in PROMPT_LIBRARY["mood"]["Happy/Excited"])
    assert any(s in p for s in PROMPT_LIBRARY["tempo"]["fast"])


def test_prompt_fallback_on_unknown_mood():
    brief = {"mood": "Confused", "tempo": "100 BPM (moderate)",
             "brightness": "warm", "density": "sparse"}
    p = generate_creative_prompt(brief)
    assert "Confused" in p  # mood-only fallback (engine:86-91)


def test_prompt_fallback_on_malformed_brief():
    p = generate_creative_prompt({})
    assert "unknown" in p


def test_provider_registry(tmp_path):
    calls = []

    def fake(prompt, out_path):
        calls.append((prompt, out_path))
        with open(out_path, "wb") as f:
            f.write(b"png")
        return out_path

    art.register_provider("fake", fake)
    assert art.available()
    out = art.generate_cover_art("a test prompt",
                                 str(tmp_path / "master.wav"))
    assert out.endswith("master_art.png")  # engine:163-166 naming
    assert calls and calls[0][0] == "a test prompt"
    # cleanup: deactivate fake provider for other tests
    art._providers.pop("fake")
    art._active = None


class TestGcloudProjectFallback:
    """Reference parity: when ADC has no project id, the engine shells out
    to `gcloud config get-value project` (engine:157-159)."""

    def test_reads_gcloud_config(self, monkeypatch):
        import subprocess

        def fake_run(cmd, **kw):
            assert cmd == ["gcloud", "config", "get-value", "project"]
            return subprocess.CompletedProcess(cmd, 0,
                                               stdout="my-proj-123\n",
                                               stderr="")
        monkeypatch.setattr(subprocess, "run", fake_run)
        assert art._gcloud_project_id() == "my-proj-123"

    def test_unset_or_missing_gcloud_degrades_to_none(self, monkeypatch):
        import subprocess

        def fake_unset(cmd, **kw):
            return subprocess.CompletedProcess(cmd, 0, stdout="(unset)\n",
                                               stderr="")
        monkeypatch.setattr(subprocess, "run", fake_unset)
        assert art._gcloud_project_id() is None

        def fake_missing(cmd, **kw):
            raise FileNotFoundError("gcloud")
        monkeypatch.setattr(subprocess, "run", fake_missing)
        assert art._gcloud_project_id() is None


class TestProceduralArt:
    def test_render_deterministic_and_mood_aware(self, tmp_path):
        from PIL import Image
        from ame_tpu.creative import procedural

        p_happy = ("An award-winning piece of vibrant, euphoric digital "
                   "artwork, joyful energy")
        p_sad = ("An award-winning piece of melancholic, somber artwork, "
                 "rainy window")
        a1 = procedural.render(p_happy, str(tmp_path / "a1.png"))
        a2 = procedural.render(p_happy, str(tmp_path / "a2.png"))
        b = procedural.render(p_sad, str(tmp_path / "b.png"))
        i1 = np.asarray(Image.open(a1))
        i2 = np.asarray(Image.open(a2))
        ib = np.asarray(Image.open(b))
        assert i1.shape == (procedural.SIZE, procedural.SIZE, 3)
        np.testing.assert_array_equal(i1, i2)       # deterministic
        assert np.abs(i1.astype(int) - ib.astype(int)).mean() > 10
        # palette check: happy art warmer (more red+yellow) than sad
        assert i1[..., 0].mean() > ib[..., 0].mean()

    def test_opt_in_activation(self, tmp_path, monkeypatch):
        from ame_tpu.creative import art as art_mod
        monkeypatch.setattr(art_mod, "_providers", {})
        monkeypatch.setattr(art_mod, "_active", None)
        monkeypatch.delenv("AME_TPU_ART_PROVIDER", raising=False)
        art_mod.available()
        # default: procedural NOT registered (reference degrade contract —
        # only the cloud provider, which needs credentials at call time)
        assert "procedural" not in art_mod._providers
        monkeypatch.setenv("AME_TPU_ART_PROVIDER", "procedural")
        assert art_mod.available()
        assert art_mod._active == "procedural"
        out = art_mod.generate_cover_art(
            "serene tranquil pastel artwork", str(tmp_path / "m.wav"))
        assert out.endswith("m_art.png")
        import os
        assert os.path.getsize(out) > 10000
