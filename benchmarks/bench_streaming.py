"""Streaming latency benchmark: per-block wall time of the incremental
quality chain (streaming.StreamingMaster) at live-audio block sizes.

Prints one JSON line per block size:
  {"block": n, "ms_per_block": ..., "block_ms_of_audio": ...,
   "x_realtime": ..., "algorithmic_latency_ms": ...}

Real-time headroom = block_ms_of_audio / ms_per_block: how many concurrent
live streams one chip sustains at that block size (per-dispatch tunnel RTT
dominates here; on-pod serving removes ~29 ms of it).
"""

import json
import time

import numpy as np


def main():
    import jax.numpy as jnp

    from ame_tpu.streaming import StreamingMaster

    sr = 48000
    rng = np.random.default_rng(0)
    for block in (512, 1024, 4096, 48000):
        sm = StreamingMaster(sr, {"bass_boost": 2.0, "width": 1.2,
                                  "analog_character": 15.0}, gain_db=-1.0)
        chunks = [jnp.asarray(0.1 * rng.standard_normal((block, 2)),
                              jnp.float32) for _ in range(8)]
        # warm the per-size compile, then measure steady state
        for c in chunks[:3]:
            np.asarray(sm.process(c))
        t0 = time.perf_counter()
        reps = 20
        for i in range(reps):
            out = sm.process(chunks[i % len(chunks)])
        np.asarray(out[0, 0])
        ms = (time.perf_counter() - t0) / reps * 1e3
        block_ms = block / sr * 1e3
        print(json.dumps({
            "block": block,
            "ms_per_block": round(ms, 3),
            "block_ms_of_audio": round(block_ms, 2),
            "x_realtime": round(block_ms / ms, 1),
            "algorithmic_latency_ms": round(
                sm.latency_samples / sr * 1e3, 2),
        }))


if __name__ == "__main__":
    main()
