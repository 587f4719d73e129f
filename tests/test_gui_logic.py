"""Behavior tests for the desktop GUI's logic (reference C18,
mastering_gui.py:108-137, 175-194) — headless, via the GuiController /
fake-view split. These exercise exactly the surface where the reference
accumulated its v5.6-era bugs: the worker→UI event pump (quirk Q12) and
the status-prefix busy contract (quirk Q13)."""

import threading
import time

import pytest

from ame_tpu.gui_logic import (GuiController, build_settings,
                               preset_updates, suggest_output_path)
from ame_tpu.presets import EQ_PRESETS


class FakeView:
    """Records every controller→view call, in order."""

    def __init__(self):
        self.calls = []
        self.values = {}
        self.busy = None
        self.match_busy = None
        self.multiband = False

    def set_status(self, text):
        self.calls.append(("status", text))

    def set_progress(self, value, maximum):
        self.calls.append(("progress", value, maximum))

    def set_tag(self, text):
        self.calls.append(("tag", text))

    def show_art(self, path):
        self.calls.append(("art", path))

    def set_busy(self, busy):
        self.busy = busy
        self.calls.append(("busy", busy))

    def set_match_busy(self, busy):
        self.match_busy = busy
        self.calls.append(("match_busy", busy))

    def show_info(self, title, message):
        self.calls.append(("info", title, message))

    def show_error(self, title, message):
        self.calls.append(("error", title, message))

    def set_value(self, key, value):
        self.values[key] = value
        self.calls.append(("value", key, value))

    def enable_multiband(self):
        self.multiband = True
        self.calls.append(("multiband_on",))


def _settings(**over):
    base = dict(input_file="in.wav", output_file="out.wav",
                multiband=False, art_prompt="", auto_generate_prompt=False,
                create_mp3=True)
    base.update(over)
    return build_settings({"bass_boost": 2.0, "lufs": -14.0}, **base)


# -- settings construction (mastering_gui.py:175-194) -------------------------

def test_build_settings_key_contract():
    s = _settings()
    # slider values pass through untouched; the api contract keys are all
    # present (api.process_audio reads exactly these)
    assert s["bass_boost"] == 2.0 and s["lufs"] == -14.0
    for key in ("input_file", "output_file", "multiband", "art_prompt",
                "auto_generate_prompt", "create_mp3", "shard_time"):
        assert key in s
    assert s["shard_time"] is False  # default off


def test_suggest_output_path():
    assert suggest_output_path("/a/b/song.flac") == "/a/b/song_mastered.wav"


# -- presets (mastering_gui.py:67-74) ------------------------------------------

def test_preset_none_zeroes_eq():
    up = preset_updates("None", EQ_PRESETS)
    assert up == {"bass_boost": 0, "mid_cut": 0, "presence_boost": 0,
                  "treble_boost": 0}


def test_preset_applies_values_and_status():
    view = FakeView()
    ctl = GuiController(view)
    name = next(iter(EQ_PRESETS))
    ctl.apply_preset(name, EQ_PRESETS)
    for key, value in EQ_PRESETS[name].items():
        assert view.values[key] == value
    assert ("status", f"Loaded '{name}' preset.") in view.calls
    # a preset load is NOT a terminal status — busy state untouched
    assert view.busy is None


# -- start validation -----------------------------------------------------------

def test_start_requires_both_files():
    view = FakeView()
    ctl = GuiController(view)
    assert ctl.start(_settings(input_file=""), lambda *a: None) is None
    assert ctl.start(_settings(output_file=""), lambda *a: None) is None
    assert [c for c in view.calls if c[0] == "error"] == [
        ("error", "Error",
         "Please select both an input and an output file.")] * 2
    assert view.busy is None and not ctl.busy


# -- the full start -> callbacks -> completion flow ----------------------------

def _fake_process(settings, status_cb, progress_cb, art_cb, tag_cb):
    """A worker following api.process_audio's callback contract
    (audio_mastering_engine.py:94-137 / Q13 prefixes)."""
    status_cb("Loading audio file...")
    progress_cb(0, 4)
    for i in range(1, 5):
        progress_cb(i, 4)
    tag_cb("Energetic | 124.0 BPM")
    art_cb("/tmp/cover.png")
    status_cb("Success: saved to " + settings["output_file"])


def test_start_to_completion_flow():
    view = FakeView()
    ctl = GuiController(view)
    ctl.start(_settings(), _fake_process, thread=False)
    assert view.busy is True and ctl.busy  # busy immediately on start
    ctl.drain()
    # Q13: the Success: status ended the busy state and raised the dialog
    assert view.busy is False and not ctl.busy
    assert ("info", "Success", "Your audio has been mastered.") in view.calls
    # progress reached 4/4; the indeterminate (0, None) reset came first
    assert ("progress", 0, None) == next(
        c for c in view.calls if c[0] == "progress")
    assert ("progress", 4, 4) in view.calls
    # tag + art arrived through the pump
    assert ("tag", "Studio Notes: Energetic | 124.0 BPM") in view.calls
    assert ("art", "/tmp/cover.png") in view.calls
    # statuses rendered in order
    statuses = [c[1] for c in view.calls if c[0] == "status"]
    assert statuses[0] == "Loading audio file..."
    assert statuses[-1].startswith("Success:")


@pytest.mark.parametrize("terminal", ["Error: decode failed",
                                      "Failed: no output written"])
def test_error_statuses_unbusy_without_dialog(terminal):
    view = FakeView()
    ctl = GuiController(view)

    def proc(settings, status_cb, *cbs):
        status_cb("Loading audio file...")
        status_cb(terminal)

    ctl.start(_settings(), proc, thread=False)
    ctl.drain()
    assert view.busy is False and not ctl.busy
    assert not [c for c in view.calls if c[0] == "info"]  # no success dialog


def test_nonterminal_status_keeps_busy():
    view = FakeView()
    ctl = GuiController(view)

    def proc(settings, status_cb, *cbs):
        status_cb("Applying mastering chain...")

    ctl.start(_settings(), proc, thread=False)
    ctl.drain()
    assert view.busy is True and ctl.busy  # still processing


def test_zero_total_progress_ignored():
    view = FakeView()
    ctl = GuiController(view)

    def proc(settings, status_cb, progress_cb, *cbs):
        progress_cb(1, 0)  # the reference guards total > 0

    ctl.start(_settings(), proc, thread=False)
    ctl.drain()
    assert [c for c in view.calls if c[0] == "progress"] == [
        ("progress", 0, None)]


def test_pump_from_real_worker_thread():
    """Quirk Q12 regression: callbacks fire on a WORKER thread; the view
    must only ever be touched from drain() on the caller's thread."""
    view = FakeView()
    ctl = GuiController(view)
    ui_thread = threading.get_ident()
    touched_from = []

    class ThreadCheckView(FakeView):
        def __getattribute__(self, name):
            if name.startswith(("set_", "show_", "enable_")):
                touched_from.append(threading.get_ident())
            return super().__getattribute__(name)

    view = ThreadCheckView()
    ctl = GuiController(view)
    worker = ctl.start(_settings(), _fake_process)  # real thread
    worker.join(10)
    assert not worker.is_alive()
    # pump until quiescent, like the Tk after() loop
    deadline = time.time() + 10
    while time.time() < deadline:
        ctl.drain()
        if view.busy is False:
            break
        time.sleep(0.01)
    assert view.busy is False
    assert statuses_end_with_success(view)
    # every view touch happened on the UI thread (minus the start() call's
    # own set_busy/set_progress, which ARE on the UI thread too)
    assert set(touched_from) == {ui_thread}


def statuses_end_with_success(view):
    statuses = [c[1] for c in view.calls if c[0] == "status"]
    return statuses and statuses[-1].startswith("Success:")


# -- reference match (Match Reference... button) --------------------------------

def test_match_flow_applies_fitted_and_unbusies():
    view = FakeView()
    ctl = GuiController(view)

    def fit(src, ref, fit_mb):
        assert (src, ref, fit_mb) == ("in.wav", "ref.wav", True)
        return {"bass_boost": 1.23456, "width": 1.4, "multiband": True,
                "loss": 0.42}

    ctl.start_match("in.wav", "ref.wav", True, fit, thread=False)
    assert view.match_busy is True
    ctl.drain()
    assert view.match_busy is False
    assert view.values["bass_boost"] == 1.23  # rounded for display
    assert view.values["width"] == 1.4
    assert "loss" not in view.values and "multiband" not in view.values
    assert view.multiband is True
    statuses = [c[1] for c in view.calls if c[0] == "status"]
    assert statuses[-1] == "Success: matched reference (loss 0.42)."


def test_match_failure_reports_error_status():
    view = FakeView()
    ctl = GuiController(view)

    def fit(src, ref, fit_mb):
        raise RuntimeError("unreadable file")

    ctl.start_match("in.wav", "ref.wav", False, fit, thread=False)
    ctl.drain()
    assert view.match_busy is False
    statuses = [c[1] for c in view.calls if c[0] == "status"]
    assert statuses[-1] == "Error: reference match failed: unreadable file"
    # no fitted values applied
    assert view.values == {}


# -- the Tk app delegates to the controller -------------------------------------

def test_tk_app_wires_controller():
    """The Tk view must delegate to GuiController (not re-implement the
    logic); verified structurally so the test runs without a display."""
    import inspect
    from ame_tpu import gui
    src = inspect.getsource(gui.MasteringApp)
    assert "GuiController(self)" in src
    assert "self.controller.start(" in src
    assert "self.controller.drain()" in src
    assert "self.controller.apply_preset(" in src
    # the view surface the controller drives must exist on the app
    for meth in ("set_status", "set_progress", "set_tag", "show_art",
                 "set_busy", "set_match_busy", "show_info", "show_error",
                 "set_value", "enable_multiband"):
        assert hasattr(gui.MasteringApp, meth), meth
