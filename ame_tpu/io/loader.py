"""Async native data loader — prefetch-decode for fleet mastering.

Binds io/native/ameloader.cpp (a C++ thread pool decoding WAV natively
and MP3/FLAC via the amecodec decoders) over ctypes. The blocking
``next`` call releases the GIL, so decode of upcoming tracks genuinely
overlaps device mastering of the current one — the framework's native
data-loader tier (the reference shells out to ffmpeg per file,
audio_mastering_engine.py:229; SURVEY.md N1).

Degrade contract: if the shim is unavailable, or a file's format isn't
native-decodable (e.g. AIFF), the loader transparently falls back to the
pure-Python decoders in ame_tpu.io — same results, just not prefetched.

    with PrefetchLoader(paths, workers=4) as loader:
        for path, audio, sr in loader:   # audio [N, C] float32, in order
            ...
"""

from __future__ import annotations

import ctypes
import logging
import os

import numpy as np

log = logging.getLogger("ame_tpu.io")

_loader_bound = False


def _lib():
    """The shared amecodec/ameloader library with loader symbols bound."""
    from ame_tpu.io import codecs
    lib = codecs._load()
    global _loader_bound
    if lib is not None and not _loader_bound:
        try:
            lib.ame_loader_open.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int]
            lib.ame_loader_open.restype = ctypes.c_void_p
            lib.ame_loader_next.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int]
            lib.ame_loader_next.restype = ctypes.c_int
            lib.ame_loader_close.argtypes = [ctypes.c_void_p]
            _loader_bound = True
        except AttributeError:
            # stale .so without the loader entry points: rebuild next run
            log.warning("libamecodec.so predates ameloader; "
                        "delete it to rebuild")
            return None
    return lib if _loader_bound else None


class PrefetchLoader:
    """Iterate (path, audio [N, C] float32, sample_rate) in submission
    order, decoding ahead on native worker threads."""

    def __init__(self, paths: list[str], workers: int = 4):
        self.paths = list(paths)
        self._handle = None
        self._lib = _lib()
        if self._lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._handle = self._lib.ame_loader_open(
                arr, len(self.paths), int(workers))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        if self._handle is not None:
            self._lib.ame_loader_close(self._handle)
            self._handle = None

    def _fallback(self, path: str):
        """Pure-Python decode; decode failures surface as (None, exc) so a
        fleet iteration can mark ONE file failed and continue."""
        from ame_tpu.io import read_audio
        try:
            return read_audio(path)
        except Exception as e:
            return None, e

    def __iter__(self):
        """Yields (path, audio [N, C] float32, sample_rate); on a decode
        failure yields (path, None, exception) instead."""
        for i, path in enumerate(self.paths):
            if self._handle is None:
                audio, sr = self._fallback(path)
                yield path, audio, sr
                continue
            out = ctypes.POINTER(ctypes.c_float)()
            n = ctypes.c_long()
            ch = ctypes.c_int()
            rate = ctypes.c_int()
            err = ctypes.create_string_buffer(200)
            rc = self._lib.ame_loader_next(
                self._handle, i, ctypes.byref(out), ctypes.byref(n),
                ctypes.byref(ch), ctypes.byref(rate), err, len(err))
            if rc != 0:
                log.debug("native loader: %s -> rc %d (%s); python fallback",
                          path, rc, err.value.decode(errors="replace"))
                audio, sr = self._fallback(path)
                yield path, audio, sr
                continue
            try:
                nvals = n.value * ch.value
                audio = np.ctypeslib.as_array(out, (nvals,)).reshape(
                    n.value, ch.value).copy()
            finally:
                self._lib.ame_free(out)
            yield path, audio, int(rate.value)
