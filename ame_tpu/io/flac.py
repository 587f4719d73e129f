"""FLAC decode via the native C++ shim (ame_flac_decode in amecodec.cpp).

Covers the reference's FLAC input capability (mastering_gui.py:170 file
filter; decoding went through ffmpeg, SURVEY.md N1)."""

from __future__ import annotations

import ctypes

import numpy as np

from ame_tpu.io import codecs as _codecs


def read_flac(path: str):
    """Returns (audio [N, C] float32, sample_rate)."""
    lib = _codecs._load()
    if lib is None:
        raise RuntimeError("FLAC decode unavailable (native shim not built)")
    if not hasattr(lib, "ame_flac_decode"):
        raise RuntimeError("FLAC decode unavailable (shim too old)")
    lib.ame_flac_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.ame_flac_decode.restype = ctypes.c_int
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    ch = ctypes.c_int()
    rate = ctypes.c_int()
    rc = lib.ame_flac_decode(path.encode(), ctypes.byref(out),
                             ctypes.byref(n), ctypes.byref(ch),
                             ctypes.byref(rate))
    if rc != 0:
        raise RuntimeError(f"FLAC decode failed (code {rc}) for {path}")
    try:
        buf = np.ctypeslib.as_array(out, shape=(n.value * ch.value,)).copy()
    finally:
        lib.ame_free(out)
    return buf.reshape(n.value, ch.value), rate.value
