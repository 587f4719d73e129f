"""Sequence-parallel scaling benchmark: one long track over 1..N chips.

Measures the FULL quality chain and the compat chain through
``parallel.sp_master.master_sequence_parallel`` at mesh sizes 1, 2, 4, 8
(whatever divides the device count) on a fixed ~6-minute track, printing
one JSON line per (mode, ndev):

  {"mode": ..., "ndev": N, "ms": ..., "x_realtime": ...,
   "speedup_vs_1": ...}

On real multi-chip hardware this shows the communication-light design's
scaling (per-cascade carry gathers + tiny frame-vector gathers + edge
halos — volume independent of track length). On the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8 with AME_TPU_PLATFORM
=cpu) it exercises the same programs but the "chips" share one host, so
wall-clock speedups are NOT meaningful there — use it as a smoke run.

Timing uses a scalar fetch to force completion (block_until_ready is
unreliable over the tunneled TPU — ROADMAP environment notes).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from ame_tpu.config import MasterSettings
    from ame_tpu.parallel.mesh import make_mesh
    from ame_tpu.parallel.sp_master import master_sequence_parallel

    sr = 44100
    hop = 4410
    ndev_all = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev_all]
    # ~6 min (override with AME_TPU_BENCH_N for smoke runs), rounded to a
    # multiple of every mesh size x hop
    want_n = int(os.environ.get("AME_TPU_BENCH_N", 1 << 24))
    gran = max(sizes) * hop
    n = max(want_n // gran, 1) * gran
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.1 * rng.standard_normal((n, 2)), jnp.float32)

    configs = {
        "quality_full": MasterSettings(
            bass_boost=2.0, presence_boost=1.5, width=1.2,
            analog_character=20.0, multiband=True, lufs=-14.0,
            mode="quality"),
        "compat_full": MasterSettings(
            bass_boost=2.0, width=1.2, multiband=True, lufs=-14.0,
            mode="compat"),
    }

    def fetch(y):
        return float(np.asarray(y[0, 0]))

    base = {}
    for mode, s in configs.items():
        for ndev in sizes:
            mesh = make_mesh({"sp": ndev}, devices=jax.devices()[:ndev])
            try:
                y, _ = master_sequence_parallel(x, sr, s, mesh)
                fetch(y)                       # compile + settle
                t0 = time.perf_counter()
                reps = 3
                for _ in range(reps):
                    y, _ = master_sequence_parallel(x, sr, s, mesh)
                fetch(y)
                ms = (time.perf_counter() - t0) / reps * 1e3
            except (ValueError, NotImplementedError) as e:
                print(json.dumps({"mode": mode, "ndev": ndev,
                                  "skipped": str(e)}))
                continue
            if ndev == 1:
                base[mode] = ms
            row = {"mode": mode, "ndev": ndev, "ms": round(ms, 1),
                   "x_realtime": round((n / sr) / (ms / 1e3), 1)}
            if mode in base:            # only vs a REAL ndev=1 run
                row["speedup_vs_1"] = round(base[mode] / ms, 2)
            print(json.dumps(row))


if __name__ == "__main__":
    main()
