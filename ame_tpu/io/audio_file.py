"""Format dispatch: one entry point per direction, like the reference's
"AudioSegment.from_file / export" surface but without subprocesses.

First-class (self-contained in-repo decoders): WAV, AIFF (pure numpy),
MP3 (native shim), FLAC (self-contained bitstream decoder — io/flac.py).
Everything else (ogg/vorbis, opus, m4a/aac, alac, wma, wavpack, ...) routes
through the in-process FFmpeg shim (io/av.py, io/native/ameav.cpp) —
the reference's "any input ffmpeg handles" coverage (engine:190) without
subprocesses. Input conditioning reproduces engine:190-191: mono -> stereo
duplication and 16-bit-equivalent float semantics are applied by the
pipeline, not here.
"""

from __future__ import annotations

import os

import numpy as np

from ame_tpu.io import wav as _wav
from ame_tpu.io import codecs as _codecs
from ame_tpu.io import flac as _flac
from ame_tpu.io import av as _av


def force_stereo(audio: np.ndarray) -> np.ndarray:
    """[N, C] -> [N, 2]: mono duplicated, multichannel keeps the front
    pair (the reference's set_channels(2) conditioning,
    audio_mastering_engine.py:190)."""
    if audio.shape[1] == 1:
        return np.repeat(audio, 2, axis=1)
    if audio.shape[1] > 2:
        return audio[:, :2]
    return audio


def read_audio(path: str, prefer_int16: bool = False):
    """Decode any supported file -> ([N, C] float32 in [-1, 1), rate).

    ``prefer_int16``: PCM16 WAV may come back as raw int16 (the
    mastering pipeline converts on device — half the staging upload);
    every other format still returns float32."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".wav", ".wave"):
        return _wav.read_wav(path, prefer_int16=prefer_int16)
    if ext in (".aif", ".aiff", ".aifc"):
        return _wav.read_aiff(path)
    if ext == ".mp3":
        return _codecs.decode_mp3(path)
    if ext == ".flac":
        return _flac.read_flac(path)
    if ext in _av.DECODE_EXTENSIONS and _av.have_av():
        return _av.decode(path)
    # fall back to sniffing WAV/AIFF magic
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"RIFF":
        return _wav.read_wav(path)
    if magic == b"FORM":
        return _wav.read_aiff(path)
    if magic[:3] == b"fLa" or magic == b"fLaC":
        return _flac.read_flac(path)
    if _av.have_av():  # unknown extension/magic: let libavformat probe it
        return _av.decode(path)
    raise ValueError(f"unsupported audio format: {path}")


def write_audio(path: str, audio: np.ndarray, sample_rate: int,
                bits: int = 16) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".wav", ".wave"):
        return _wav.write_wav(path, audio, sample_rate, bits)
    if ext == ".mp3":
        return _codecs.encode_mp3(path, audio, sample_rate, vbr_quality=0)
    if ext in (".aif", ".aiff"):
        return _wav.write_aiff(path, audio, sample_rate, bits)
    if ext in _av.ENCODE_EXTENSIONS and _av.have_av():
        return _av.encode(path, audio, sample_rate)
    raise ValueError(f"unsupported output format: {path}")
