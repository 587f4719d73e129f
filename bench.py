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

import argparse
import json
import time

import numpy as np

SR = 44100
N = 1 << 23  # 8,388,608 samples = 190.2 s


def _configs():
    """The five BASELINE.json bench configs as MasterSettings."""
    from ame_tpu.config import MasterSettings
    return {
        "eq_only": MasterSettings(bass_boost=2.5, mid_cut=1.0,
                                  presence_boost=-1.0, treble_boost=0.5,
                                  lufs=None, mode="quality"),
        "eq_width_saturation": MasterSettings(
            bass_boost=2.0, presence_boost=1.5, width=1.3,
            analog_character=35.0, lufs=None, mode="quality"),
        "multiband": MasterSettings(multiband=True, lufs=None,
                                    mode="quality"),
        "full_lufs": MasterSettings(bass_boost=2.0, presence_boost=1.5,
                                    treble_boost=0.5, width=1.2,
                                    analog_character=20.0, lufs=-14.0,
                                    mode="quality"),
        # bit-faithful pydub-gain multiband + real ffmpeg two-pass loudnorm
        # + alimiter-contract limiter, one traced program (round 3: the
        # Jacobi verdict moved on device, so compat fuses end to end)
        "exact_compat_multiband": MasterSettings(
            bass_boost=1.5, treble_boost=-1.0, multiband=True,
            lufs=-14.0, mode="compat"),
    }


def _time_config(x, settings, reps=20):
    from ame_tpu.graph.chain import master_graph_fused

    def fetch(y):
        # block_until_ready is unreliable over the tunneled TPU; a scalar
        # fetch forces completion.
        return float(np.asarray(y[0, 0]))

    for _ in range(2):
        y, _ = master_graph_fused(x, SR, settings)
        fetch(y)
    t0 = time.perf_counter()
    fetch(y)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        y, _ = master_graph_fused(x, SR, settings)
    fetch(y)
    elapsed = (time.perf_counter() - t0 - rtt) / reps
    return (N / SR) / elapsed


def _arm_watchdog(seconds: float):
    """Hard-exit if the bench never finishes — a hung accelerator tunnel
    (observed at two round ends, including MID-round hangs after
    successful round-trips) would otherwise stall the caller
    indefinitely; a bounded nonzero exit is diagnosable. Returns a
    disarm() to call after the final report line."""
    import os
    import sys
    import threading

    fired = threading.Event()

    def _boom():
        if not fired.is_set():
            print(f"bench: not finished within {seconds:.0f}s — "
                  f"accelerator unreachable or wedged (tunnel hung?); "
                  f"aborting", file=sys.stderr, flush=True)
            os._exit(1)

    t = threading.Timer(seconds, _boom)
    t.daemon = True
    t.start()

    def disarm():
        fired.set()
        t.cancel()

    return disarm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all-configs", action="store_true",
                    help="also report per-config lines (BASELINE configs)")
    ap.add_argument("--watchdog-s", type=float, default=3600.0,
                    help="abort if the WHOLE bench hasn't finished within "
                         "this (cold compiles included) — a tunnel hang "
                         "at ANY round-trip must not stall the caller")
    args = ap.parse_args()

    import ame_tpu  # noqa: F401  — platform override + compile cache first
    import jax.numpy as jnp

    disarm = _arm_watchdog(args.watchdog_s)
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.1 * rng.standard_normal((N, 2)), jnp.float32)
    float(np.asarray(x[0, 0]))    # first round-trip: upload + fetch
    configs = _configs()

    if args.all_configs:
        for name, settings in configs.items():
            xr = _time_config(x, settings, reps=10)
            print(json.dumps({"config": name,
                              "value": round(xr, 1),
                              "unit": "x_realtime"}))
        # Fleet throughput: dp-batched mastering (parallel/batch.py) on one
        # chip — amortizes dispatch/fixed costs across B tracks
        from ame_tpu.parallel.batch import master_batch
        B = 4
        xb = jnp.asarray(
            0.1 * np.random.default_rng(1).standard_normal((B, N, 2)),
            jnp.float32)
        fleet_settings = configs["full_lufs"]

        def run_fleet():
            return master_batch(xb, SR, fleet_settings)

        def fetch(y):
            return float(np.asarray(y[0, 0, 0]))

        fetch(run_fleet())
        t0 = time.perf_counter()
        fetch(run_fleet())
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            y = run_fleet()
        fetch(y)
        per_batch = (time.perf_counter() - t0 - rtt) / 5
        print(json.dumps({"config": f"fleet_batch_{B}x_full_lufs",
                          "value": round(B * (N / SR) / per_batch, 1),
                          "unit": "x_realtime_aggregate"}))

        # Musicologist batch (config 5): spectrogram+CNN+features per track
        from ame_tpu.analysis import musicologist as M
        y22 = jnp.asarray(
            0.1 * rng.standard_normal((int(30 * M.ANALYSIS_SR),)),
            jnp.float32)
        M.analyze_waveform(y22)  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(5):
            M.analyze_waveform(y22)
        per = (time.perf_counter() - t0) / 5
        print(json.dumps({"config": "musicologist_30s",
                          "value": round(30.0 / per, 1),
                          "unit": "x_realtime"}))

    # Headline: median of three independent timing batches — tunnel state
    # swings a single batch by ±20-60% run to run (measured 29.6k vs 47.7k
    # for the SAME config minutes apart), and this line is recorded once.
    x_realtime = float(np.median(
        [_time_config(x, configs["full_lufs"], reps=10) for _ in range(3)]))
    print(json.dumps({
        "metric": "full-master x-realtime per chip (3-min 44.1kHz stereo, "
                  "quality chain: analog+EQ+width+LUFS+limiter)",
        "value": round(x_realtime, 1),
        "unit": "x_realtime",
        "vs_baseline": round(x_realtime / 500.0, 2),
    }))
    disarm()


if __name__ == "__main__":
    main()
