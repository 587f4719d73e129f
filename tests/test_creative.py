"""Art Director tests: prompt synthesis semantics (C15) + provider registry."""

import random

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
