"""Benchmark: full-chain mastering throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config: BASELINE.json north star — master a 3-minute-class 44.1 kHz stereo
track (2^23 samples = 190.2 s) through the full quality chain (analog
character + 4-band EQ + stereo width + gated-LUFS normalization incl. true
peak + lookahead limiter) on one chip. Baseline = the north-star target of
500x realtime (the reference publishes no numbers — BASELINE.md), so
vs_baseline = value / 500.

Timing note: ``block_until_ready`` does NOT reliably block on the tunneled
TPU platform here, so completion is forced by fetching a scalar from the
output; the measured loop amortizes that round-trip over 20 chained runs
and subtracts it explicitly.
"""

import json
import time

import numpy as np


def main():
    import jax.numpy as jnp
    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph_fused

    sr = 44100
    n = 1 << 23  # 8,388,608 samples = 190.2 s
    duration_s = n / sr

    rng = np.random.default_rng(0)
    x = jnp.asarray(0.1 * rng.standard_normal((n, 2)), jnp.float32)

    settings = MasterSettings(bass_boost=2.0, presence_boost=1.5,
                              treble_boost=0.5, width=1.2,
                              analog_character=20.0, lufs=-14.0,
                              mode="quality")

    def fetch(y):
        return float(np.asarray(y[0, 0]))

    # warmup / compile (persistently cached)
    for _ in range(2):
        y, info = master_graph_fused(x, sr, settings)
        fetch(y)

    # transfer round-trip to subtract
    t0 = time.perf_counter()
    fetch(y)
    rtt = time.perf_counter() - t0

    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        y, info = master_graph_fused(x, sr, settings)
    fetch(y)
    elapsed = (time.perf_counter() - t0 - rtt) / reps
    x_realtime = duration_s / elapsed

    print(json.dumps({
        "metric": "full-master x-realtime per chip (3-min 44.1kHz stereo, "
                  "quality chain: analog+EQ+width+LUFS+limiter)",
        "value": round(x_realtime, 1),
        "unit": "x_realtime",
        "vs_baseline": round(x_realtime / 500.0, 2),
    }))


if __name__ == "__main__":
    main()
