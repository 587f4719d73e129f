"""ctypes binding for the native codec shim (lazy-built via make).

Graceful degradation mirrors the reference's optional-dependency policy
(vertexai import guard, engine:20-26): if the shim can't build or the
system libraries are absent, MP3 support reports unavailable instead of
crashing the pipeline — MP3 export failures are warnings in the reference
too (engine:150).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_NATIVE_DIR = os.path.join(_HERE, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libamecodec.so")

_lib = None
_lib_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # toolchain missing: degrade
            logging.warning("amecodec build failed: %s", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ame_mp3_encode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.ame_mp3_encode.restype = ctypes.c_int
        lib.ame_mp3_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.ame_mp3_decode.restype = ctypes.c_int
        lib.ame_free.argtypes = [ctypes.c_void_p]
        lib.ame_have_lame.restype = ctypes.c_int
        lib.ame_have_mpg123.restype = ctypes.c_int
        _lib = lib
    except OSError as e:
        logging.warning("amecodec load failed: %s", e)
    return _lib


def have_mp3_encode() -> bool:
    lib = _load()
    return bool(lib and lib.ame_have_lame())


def have_mp3_decode() -> bool:
    lib = _load()
    return bool(lib and lib.ame_have_mpg123())


def encode_mp3(path: str, audio: np.ndarray, sample_rate: int,
               vbr_quality: int = 0) -> None:
    """LAME VBR encode; vbr_quality 0 == the reference's `-q:a 0` (V0,
    engine:147)."""
    lib = _load()
    if not (lib and lib.ame_have_lame()):
        raise RuntimeError("MP3 encode unavailable (libmp3lame not found)")
    audio = np.ascontiguousarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[:, None]
    n, c = audio.shape
    rc = lib.ame_mp3_encode(
        path.encode(), audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, c, int(sample_rate), int(vbr_quality))
    if rc != 0:
        raise RuntimeError(f"MP3 encode failed (code {rc})")


def decode_mp3(path: str):
    """Returns (audio [N, C] float32, sample_rate)."""
    lib = _load()
    if not (lib and lib.ame_have_mpg123()):
        raise RuntimeError("MP3 decode unavailable (libmpg123 not found)")
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    ch = ctypes.c_int()
    rate = ctypes.c_int()
    rc = lib.ame_mp3_decode(path.encode(), ctypes.byref(out),
                            ctypes.byref(n), ctypes.byref(ch),
                            ctypes.byref(rate))
    if rc != 0:
        raise RuntimeError(f"MP3 decode failed (code {rc})")
    try:
        count = n.value * ch.value
        buf = np.ctypeslib.as_array(out, shape=(count,)).copy()
    finally:
        lib.ame_free(out)
    return buf.reshape(n.value, ch.value), rate.value
