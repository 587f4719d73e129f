"""Benchmark: full-chain mastering throughput per chip.

Emits machine-readable JSON lines on stdout — one per board config
(key ``config``) and the headline LAST (key ``metric``):

  {"config": "eq_only", "value": N, "unit": "x_realtime"}
  ...
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline config: BASELINE.json north star — master a 3-minute-class
44.1 kHz stereo track (2^23 samples = 190.2 s) through the full quality
chain (analog character + 4-band EQ + stereo width + gated-LUFS
normalization incl. true peak + lookahead limiter) on one chip.
Baseline = the north-star target of 500x realtime (the reference
publishes no numbers — BASELINE.md), so vs_baseline = value / 500.

Failure policy (round-4 hardening): the accelerator tunnel in this
environment dies without warning, historically BEFORE the first device
op (BENCH_r03.json died inside backend init with rc=1 and nothing
parseable). Now:
  * backend bring-up is retried with backoff, and a final failure emits
    a parseable sentinel headline {"error": "tpu-unavailable", ...} and
    exits 0;
  * every board section is individually guarded, so a mid-run tunnel
    death still leaves the already-measured lines on stdout plus an
    error sentinel;
  * the whole-run watchdog (hangs, not crashes) is kept.

Timing note: ``block_until_ready`` does NOT reliably block on the
tunneled TPU platform here, so completion is forced by fetching a scalar
from the output; the measured loop amortizes that round-trip over the
chained runs and subtracts it explicitly.
"""

import argparse
import json
import sys
import time

import numpy as np

SR = 44100
N = 1 << 23  # 8,388,608 samples = 190.2 s


def _emit(obj):
    print(json.dumps(obj), flush=True)


def _sentinel_headline(error, detail=""):
    _emit({
        "metric": "full-master x-realtime per chip (3-min 44.1kHz stereo, "
                  "quality chain: analog+EQ+width+LUFS+limiter)",
        "value": 0.0,
        "unit": "x_realtime",
        "vs_baseline": 0.0,
        "error": error,
        "detail": detail[:300],
    })


def _backend_up(retries=None, backoff_s=None):
    """Bring the accelerator up, retrying with backoff.

    Returns the error string on final failure, None on success. The
    probe runs a real device op round-trip — BENCH_r03 died at the
    FIRST device op (`RuntimeError: Unable to initialize backend`),
    after `import jax` itself succeeded.
    """
    import os
    if retries is None:
        retries = int(os.environ.get("AME_TPU_BENCH_RETRIES", "3"))
    if backoff_s is None:
        backoff_s = float(os.environ.get("AME_TPU_BENCH_BACKOFF_S", "20"))
    last = ""
    for attempt in range(retries):
        try:
            import jax
            import jax.numpy as jnp
            devs = jax.devices()
            probe = jnp.zeros((8,), jnp.float32) + 1.0
            assert float(np.asarray(probe[0])) == 1.0
            print(f"bench: backend up, devices={devs}", file=sys.stderr,
                  flush=True)
            return None
        except Exception as e:  # noqa: BLE001 — any init failure retries
            last = f"{type(e).__name__}: {e}"
            print(f"bench: backend probe failed (attempt {attempt + 1}/"
                  f"{retries}): {last}", file=sys.stderr, flush=True)
            if attempt + 1 < retries:
                time.sleep(backoff_s * (attempt + 1))
    return last


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
    import threading

    fired = threading.Event()

    def _boom():
        if not fired.is_set():
            # Emit the sentinel BEFORE dying so the run stays parseable.
            _sentinel_headline("tpu-hang",
                               f"not finished within {seconds:.0f}s")
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


def _board(x, configs):
    """Per-config board lines. Each section individually guarded so a
    mid-run failure keeps everything already measured."""
    import jax
    import jax.numpy as jnp

    failures = 0
    for name, settings in configs.items():
        try:
            xr = _time_config(x, settings, reps=10)
            _emit({"config": name, "value": round(xr, 1),
                   "unit": "x_realtime"})
        except Exception as e:  # noqa: BLE001
            failures += 1
            _emit({"config": name, "error": f"{type(e).__name__}: {e}"[:300]})
            if failures >= 2:
                raise   # backend is gone; stop burning the watchdog

    # Fleet throughput: dp-batched mastering (parallel/batch.py) on one
    # chip — amortizes dispatch/fixed costs across B tracks
    try:
        from ame_tpu.parallel.batch import master_batch
        B = 4
        xb = jnp.asarray(
            0.1 * np.random.default_rng(1).standard_normal((B, N, 2)),
            jnp.float32)
        fleet_settings = configs["full_lufs"]

        def fetchb(y):
            return float(np.asarray(y[0, 0, 0]))

        fetchb(master_batch(xb, SR, fleet_settings))
        t0 = time.perf_counter()
        fetchb(master_batch(xb, SR, fleet_settings))
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            y = master_batch(xb, SR, fleet_settings)
        fetchb(y)
        per_batch = (time.perf_counter() - t0 - rtt) / 5
        _emit({"config": f"fleet_batch_{B}x_full_lufs",
               "value": round(B * (N / SR) / per_batch, 1),
               "unit": "x_realtime_aggregate"})
        del xb
    except Exception as e:  # noqa: BLE001
        _emit({"config": "fleet_batch", "error": str(e)[:300]})

    # Musicologist (config 5): spectrogram+CNN+features, single track.
    # Timed like every other config — chained dispatches, one completion
    # fetch, RTT subtracted — so the number is device throughput, not the
    # tunnel's ~25-30 ms per-fetch round trip (which dominates a
    # synchronous single call and is absent on real deployments).
    try:
        from ame_tpu.analysis import musicologist as M
        from ame_tpu.models import mood_cnn
        params, _ = mood_cnn.load_params()
        rng = np.random.default_rng(2)
        y22 = jnp.asarray(
            0.1 * rng.standard_normal((int(30 * M.ANALYSIS_SR),)),
            jnp.float32)

        def fetchm(v):
            return float(np.asarray(v[0]))

        v = M._analyze_jit(params, y22)   # warmup/compile
        fetchm(v)
        t0 = time.perf_counter()
        fetchm(v)
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(20):
            v = M._analyze_jit(params, y22)
        fetchm(v)
        per = (time.perf_counter() - t0 - rtt) / 20
        _emit({"config": "musicologist_30s", "value": round(30.0 / per, 1),
               "unit": "x_realtime"})
    except Exception as e:  # noqa: BLE001
        _emit({"config": "musicologist_30s", "error": str(e)[:300]})

    # Sequence-parallel chain at every mesh size the hardware allows
    # (validates the Pallas-in-shard_map sp path on real silicon even at
    # mesh size 1 — VERDICT r3 item 3).
    try:
        from ame_tpu.config import MasterSettings
        from ame_tpu.parallel.mesh import make_mesh
        from ame_tpu.parallel.sp_master import master_sequence_parallel
        ndev_all = len(jax.devices())
        sizes = [k for k in (1, 2, 4, 8) if k <= ndev_all]
        sp_settings = {
            "sp_quality": MasterSettings(
                bass_boost=2.0, presence_boost=1.5, width=1.2,
                analog_character=20.0, multiband=True, lufs=-14.0,
                mode="quality"),
            "sp_compat": MasterSettings(
                bass_boost=2.0, width=1.2, multiband=True, lufs=-14.0,
                mode="compat"),
        }
        hop = 4410
        nsp = (N // (max(sizes) * hop)) * (max(sizes) * hop)
        xsp = x[:nsp]

        def fetch(y):
            return float(np.asarray(y[0, 0]))

        for mode, s in sp_settings.items():
            for ndev in sizes:
                mesh = make_mesh({"sp": ndev},
                                 devices=jax.devices()[:ndev])
                y, _ = master_sequence_parallel(xsp, SR, s, mesh)
                fetch(y)
                t0 = time.perf_counter()
                reps = 3
                for _ in range(reps):
                    y, _ = master_sequence_parallel(xsp, SR, s, mesh)
                fetch(y)
                ms = (time.perf_counter() - t0) / reps * 1e3
                _emit({"config": f"{mode}_ndev{ndev}",
                       "value": round((nsp / SR) / (ms / 1e3), 1),
                       "unit": "x_realtime"})
    except Exception as e:  # noqa: BLE001
        _emit({"config": "sp_chain", "error": str(e)[:300]})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all-configs", action="store_true",
                    help="(kept for compatibility; the full board is now "
                         "the default)")
    ap.add_argument("--headline-only", action="store_true",
                    help="skip the per-config board")
    ap.add_argument("--watchdog-s", type=float, default=3300.0,
                    help="abort if the WHOLE bench hasn't finished within "
                         "this (cold compiles included) — a tunnel hang "
                         "at ANY round-trip must not stall the caller")
    args = ap.parse_args()

    disarm = _arm_watchdog(args.watchdog_s)

    import ame_tpu  # noqa: F401  — platform override + compile cache first

    err = _backend_up()
    if err is not None:
        _sentinel_headline("tpu-unavailable", err)
        disarm()
        sys.exit(0)

    import jax.numpy as jnp

    try:
        rng = np.random.default_rng(0)
        x = jnp.asarray(0.1 * rng.standard_normal((N, 2)), jnp.float32)
        float(np.asarray(x[0, 0]))    # first round-trip: upload + fetch
        configs = _configs()
    except Exception as e:  # noqa: BLE001
        _sentinel_headline("tpu-unavailable", f"{type(e).__name__}: {e}")
        disarm()
        sys.exit(0)

    if not args.headline_only:
        try:
            _board(x, configs)
        except Exception as e:  # noqa: BLE001
            print(f"bench: board aborted: {e}", file=sys.stderr, flush=True)

    # Headline: median of three independent timing batches — tunnel state
    # swings a single batch by ±20-60% run to run (measured 29.6k vs 47.7k
    # for the SAME config minutes apart), and this line is recorded once.
    try:
        x_realtime = float(np.median(
            [_time_config(x, configs["full_lufs"], reps=10)
             for _ in range(3)]))
    except Exception as e:  # noqa: BLE001
        _sentinel_headline("tpu-died-midrun", f"{type(e).__name__}: {e}")
        disarm()
        sys.exit(0)
    _emit({
        "metric": "full-master x-realtime per chip (3-min 44.1kHz stereo, "
                  "quality chain: analog+EQ+width+LUFS+limiter)",
        "value": round(x_realtime, 1),
        "unit": "x_realtime",
        "vs_baseline": round(x_realtime / 500.0, 2),
    })
    disarm()


if __name__ == "__main__":
    main()
