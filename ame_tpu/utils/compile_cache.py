"""Persistent XLA compile cache setup.

First compile of a mastering graph costs tens of seconds (TPU) to minutes
(this CPU environment); with the persistent cache every (shape, structure)
compiles once per machine, ever. Enabled automatically on package import;
opt out with AME_TPU_NO_COMPILE_CACHE=1 or redirect with
AME_TPU_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "ame_tpu", "xla_cache")

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Idempotently enable the JAX persistent compilation cache."""
    global _enabled
    if _enabled:
        return None
    if os.environ.get("AME_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = (path or os.environ.get("AME_TPU_COMPILE_CACHE_DIR")
                 or _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
        return cache_dir
    except Exception:  # pragma: no cover - cache is best-effort
        return None
