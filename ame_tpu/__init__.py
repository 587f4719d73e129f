"""ame_tpu — a TPU-native audio mastering framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
theouterlimitz/Audio-Mastering-Engine (reference mounted at /root/reference).
The reference's chunk->disk->ffmpeg->disk pipeline is replaced by a single
jit-compiled signal graph over an HBM-resident [N, 2] float32 buffer; its
native backends (ffmpeg loudnorm/alimiter/codecs, scipy IIR, pydub/audioop
dynamics) become on-device scan kernels plus a thin host-side codec edge.

Public API (mirrors reference audio_mastering_engine.py:94-137, 32-38):
    process_audio(settings, status_cb, progress_cb, art_cb, tag_cb)
    EQ_PRESETS
plus the typed, TPU-first API in ame_tpu.graph / ame_tpu.ops.
"""

import os as _os

from ame_tpu.presets import EQ_PRESETS
from ame_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

if _os.environ.get("AME_TPU_PLATFORM"):
    # Operational escape hatch: pin the JAX backend (e.g. "cpu" to keep a
    # box serving when the TPU is unreachable). Set via jax.config because
    # a JAX_PLATFORMS env var is overridden by installed accelerator
    # plugins on some deployments. Best-effort: in a process that already
    # initialized a JAX backend before importing ame_tpu the update can
    # raise — importing the package must still succeed.
    try:
        import jax as _jax

        _jax.config.update("jax_platforms",
                           _os.environ["AME_TPU_PLATFORM"])
    except Exception:  # pragma: no cover
        import warnings as _warnings

        _warnings.warn("AME_TPU_PLATFORM was set but the JAX platform "
                       "could not be changed (backend already "
                       "initialized?)", RuntimeWarning)

__version__ = "0.1.0"

__all__ = ["process_audio", "master_file", "StreamingMaster",
           "StreamingCompatMaster", "EQ_PRESETS", "__version__"]


def __getattr__(name):
    # Lazy: keep `import ame_tpu` light (no jax trace-time work) while still
    # exposing the reference-parity entry points at top level.
    if name in ("process_audio", "master_file"):
        from ame_tpu import api
        return getattr(api, name)
    if name in ("StreamingMaster", "StreamingCompatMaster"):
        from ame_tpu import streaming
        return getattr(streaming, name)
    raise AttributeError(f"module 'ame_tpu' has no attribute {name!r}")
