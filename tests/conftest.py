"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths compile and execute without TPU hardware (the
"fake backend" the reference lacks — SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The env var alone is NOT honored in this environment (the TPU plugin wins
# platform selection); the config update is.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: op compiles on this host are ~1 s each, so cache
# them across test runs. Shares the package-default cache dir so ad-hoc
# scripts and the test suite warm each other.
from ame_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop live-executable references between test modules.

    On this host, loading one more XLA:CPU executable into a process that
    already holds several hundred (a full-suite run) intermittently makes
    the loader request a ~180 GiB allocation, which the kernel denies
    (__vm_enough_memory) and the process dies with SIGSEGV — reproduced
    both on the fresh-compile path (compiler.backend_compile_and_load)
    and the persistent-cache read path (get_executable_and_time), and
    absent in a fresh process for the same program. Clearing per module
    keeps the live-executable count bounded; the persistent compile cache
    makes the re-loads cheap."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_test_signal(kind: str, n: int, sr: int = 44100, channels: int = 2,
                     seed: int = 0) -> np.ndarray:
    """Synthetic differential-test signals (SURVEY.md §4): impulse, tone,
    sweep, noise, silence."""
    t = np.arange(n) / sr
    rng = np.random.default_rng(seed)
    if kind == "impulse":
        x = np.zeros(n)
        x[n // 4] = 1.0
    elif kind == "tone":
        x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    elif kind == "sweep":
        f = np.logspace(np.log10(20), np.log10(sr / 2.2), n)
        x = 0.5 * np.sin(2 * np.pi * np.cumsum(f) / sr)
    elif kind == "noise":
        x = 0.3 * rng.standard_normal(n)
    elif kind == "silence":
        x = np.zeros(n)
    else:
        raise ValueError(kind)
    if channels == 2:
        x2 = np.stack([x, np.roll(x, 7) * 0.9], axis=1)
        return x2.astype(np.float32)
    return x.astype(np.float32)
