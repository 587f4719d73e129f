"""Preset and GUI-schema parity with the reference's public data contracts
(audio_mastering_engine.py:32-38; mastering_gui.py:46-55, 67, 74)."""

import ame_tpu
from ame_tpu import gui


def test_preset_values_match_reference_table():
    """The five presets with the reference's exact four-parameter values."""
    want = {
        "Vocal Clarity": (-1.0, 2.0, 2.5, 1.0),
        "Bass Punch": (2.5, 1.0, -1.0, 0.5),
        "Vintage Warmth": (1.5, 0.0, -1.5, -2.0),
        "Lo-Fi Haze": (-2.0, 3.0, -2.0, -4.0),
        "EDM Kick & Highs": (2.0, 4.0, 1.0, 3.0),
    }
    assert set(ame_tpu.EQ_PRESETS) == set(want)
    for name, (bass, mid, pres, treb) in want.items():
        p = ame_tpu.EQ_PRESETS[name]
        assert p["bass_boost"] == bass
        assert p["mid_cut"] == mid
        assert p["presence_boost"] == pres
        assert p["treble_boost"] == treb


def test_gui_slider_schema():
    """Slider keys/ranges/defaults match the reference GUI's control set."""
    main = {key: (lo, hi, dflt)
            for (_, key, lo, hi, dflt) in gui.MAIN_SLIDERS}
    assert main["analog_character"] == (0, 100, 0.0)
    assert main["bass_boost"] == (-6, 6, 0.0)
    assert main["mid_cut"] == (0, 6, 0.0)
    assert main["presence_boost"] == (-6, 6, 0.0)
    assert main["treble_boost"] == (-6, 6, 0.0)
    assert main["width"] == (0, 2, 1.0)
    assert main["lufs"] == (-20, -6, -14.0)

    mb = {key: (lo, hi, dflt) for (_, key, lo, hi, dflt) in gui.MB_SLIDERS}
    assert mb["low_thresh"] == (-40, 0, -25.0)
    assert mb["low_ratio"] == (1, 10, 6.0)
    assert mb["mid_thresh"] == (-40, 0, -20.0)
    assert mb["mid_ratio"] == (1, 10, 3.0)
    assert mb["high_thresh"] == (-40, 0, -15.0)
    assert mb["high_ratio"] == (1, 10, 4.0)


def test_settings_defaults_match_reference():
    """MasterSettings defaults mirror the reference GUI variable defaults
    (mastering_gui.py:46-55)."""
    from ame_tpu.config import MasterSettings
    s = MasterSettings()
    assert s.analog_character == 0.0
    assert s.width == 1.0
    assert s.lufs == -14.0
    assert s.multiband is False
    assert s.create_mp3 is True
    assert (s.low_thresh, s.low_ratio) == (-25.0, 6.0)
    assert (s.mid_thresh, s.mid_ratio) == (-20.0, 3.0)
    assert (s.high_thresh, s.high_ratio) == (-15.0, 4.0)
