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


def _backend_up(retries=None, backoff_s=None, probe_timeout_s=None):
    """Bring the accelerator up, retrying with backoff.

    Returns the error string on final failure, None on success. The
    probe runs a real device op round-trip — BENCH_r03 died at the
    FIRST device op (`RuntimeError: Unable to initialize backend`),
    after `import jax` itself succeeded.

    The probe is TIME-BOUNDED (round-5 fix): a hung tunnel makes the
    first device op block FOREVER — no exception, so the retry loop
    never engaged and the whole watchdog budget burned inside attempt 1.
    Each attempt now runs in a daemon thread joined with a deadline;
    a timed-out attempt counts as a failure and the backoff/retry cycle
    gets its chance (the tunnel has been observed to recover between
    hangs). A late-completing orphan probe is harmless.
    """
    import os
    import threading
    if retries is None:
        retries = int(os.environ.get("AME_TPU_BENCH_RETRIES", "3"))
    if backoff_s is None:
        backoff_s = float(os.environ.get("AME_TPU_BENCH_BACKOFF_S", "20"))
    if probe_timeout_s is None:
        probe_timeout_s = float(os.environ.get(
            "AME_TPU_BENCH_PROBE_TIMEOUT_S", "180"))
    last = ""
    for attempt in range(retries):
        result: dict = {}

        def _probe():
            try:
                import jax
                import jax.numpy as jnp
                devs = jax.devices()
                probe = jnp.zeros((8,), jnp.float32) + 1.0
                assert float(np.asarray(probe[0])) == 1.0
                result["devices"] = devs
            except Exception as e:  # noqa: BLE001 — reported below
                result["error"] = f"{type(e).__name__}: {e}"

        t = threading.Thread(target=_probe, daemon=True)
        t.start()
        t.join(probe_timeout_s)
        if "devices" in result:
            print(f"bench: backend up, devices={result['devices']}",
                  file=sys.stderr, flush=True)
            return None
        last = result.get(
            "error",
            f"probe hung > {probe_timeout_s:.0f}s (tunnel wedged)")
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
        # the sp_quality settings on the SINGLE-CHIP fused graph — the
        # apples-to-apples comparison point for sp_quality_ndev1 (the r4
        # "6x sp overhead" compared sp-with-multiband against a headline
        # WITHOUT multiband; this line pins the real ratio)
        "full_lufs_mb": MasterSettings(bass_boost=2.0, presence_boost=1.5,
                                       width=1.2, analog_character=20.0,
                                       multiband=True, lufs=-14.0,
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


def _median_spread(run, batches=3):
    """Median + [min, max] over independent timing batches. The tunnel
    link swings a single batch by +/-20-60% for the SAME config
    (measured 29.6k vs 47.7k minutes apart), so every recorded board
    line carries its spread — cross-round deltas are uninterpretable
    without it (VERDICT r4 weak #3)."""
    vals = [float(run()) for _ in range(batches)]
    return float(np.median(vals)), [round(min(vals), 1),
                                    round(max(vals), 1)]


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
    """Per-config board lines (median of 3 batches + spread). Each
    section individually guarded so a mid-run failure keeps everything
    already measured. Returns {config: median} for the derived
    speedup-vs-reference lines."""
    import jax
    import jax.numpy as jnp

    measured = {}
    failures = 0
    for name, settings in configs.items():
        try:
            med, spread = _median_spread(
                lambda: _time_config(x, settings, reps=10))
            measured[name] = med
            _emit({"config": name, "value": round(med, 1),
                   "spread": spread, "unit": "x_realtime"})
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

        fetchb(master_batch(xb, SR, fleet_settings))   # warmup/compile

        def one_batch():
            y = master_batch(xb, SR, fleet_settings)
            fetchb(y)
            t0 = time.perf_counter()
            fetchb(y)
            rtt = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(5):
                y = master_batch(xb, SR, fleet_settings)
            fetchb(y)
            per_batch = (time.perf_counter() - t0 - rtt) / 5
            return B * (N / SR) / per_batch

        med, spread = _median_spread(one_batch)
        _emit({"config": f"fleet_batch_{B}x_full_lufs",
               "value": round(med, 1), "spread": spread,
               "unit": "x_realtime_aggregate"})
        del xb
    except Exception as e:  # noqa: BLE001
        _emit({"config": "fleet_batch", "error": str(e)[:300]})

    # Musicologist (config 5): spectrogram+CNN+features, single track.
    # TWO protocols, both labeled (VERDICT r4 weak #6): the chained
    # number (dispatches queued back to back, one completion fetch, RTT
    # subtracted) is device throughput — what a pipelined deployment
    # gets; the single-dispatch number pays the tunnel's ~25-40 ms fetch
    # round trip on EVERY call — what a naive synchronous caller gets
    # over this link.
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

        fetchm(M._analyze_jit(params, y22))   # warmup/compile

        def chained():
            v = M._analyze_jit(params, y22)
            fetchm(v)
            t0 = time.perf_counter()
            fetchm(v)
            rtt = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(20):
                v = M._analyze_jit(params, y22)
            fetchm(v)
            per = (time.perf_counter() - t0 - rtt) / 20
            return 30.0 / per

        med, spread = _median_spread(chained)
        _emit({"config": "musicologist_30s", "value": round(med, 1),
               "spread": spread, "unit": "x_realtime",
               "protocol": "chained dispatches, one completion fetch, "
                           "tunnel RTT subtracted (device throughput)"})

        def single_dispatch():
            t0 = time.perf_counter()
            for _ in range(10):
                fetchm(M._analyze_jit(params, y22))
            per = (time.perf_counter() - t0) / 10
            return 30.0 / per

        med, spread = _median_spread(single_dispatch)
        _emit({"config": "musicologist_30s_single_dispatch",
               "value": round(med, 1), "spread": spread,
               "unit": "x_realtime",
               "protocol": "one dispatch + completion fetch per call, "
                           "tunnel RTT included"})
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

        from jax.sharding import NamedSharding, PartitionSpec

        for mode, s in sp_settings.items():
            for ndev in sizes:
                mesh = make_mesh({"sp": ndev},
                                 devices=jax.devices()[:ndev])
                # board-aligned protocol: input pre-staged with the sp
                # sharding and reps matching _time_config, so the sp
                # lines measure device time the way every other board
                # line does (reps=3 with per-call host staging was
                # under-amortizing dispatch overhead into the sp number)
                xd = jax.device_put(
                    xsp, NamedSharding(mesh, PartitionSpec("sp", None)))
                y, _ = master_sequence_parallel(xd, SR, s, mesh)
                fetch(y)   # warmup/compile

                def one_sp():
                    t0 = time.perf_counter()
                    reps = 8
                    for _ in range(reps):
                        yy, _ = master_sequence_parallel(xd, SR, s, mesh)
                    fetch(yy)
                    per = (time.perf_counter() - t0) / reps
                    return (nsp / SR) / per

                med, spread = _median_spread(one_sp)
                _emit({"config": f"{mode}_ndev{ndev}",
                       "value": round(med, 1), "spread": spread,
                       "unit": "x_realtime"})
                # sp fixed-overhead factor at mesh 1 vs the single-chip
                # fused graph with the SAME settings (VERDICT r4 item 4)
                if mode == "sp_quality" and ndev == 1 and \
                        measured.get("full_lufs_mb"):
                    _emit({"config": "sp_overhead_factor_at_ndev1",
                           "value": round(measured["full_lufs_mb"] / med,
                                          2),
                           "unit": "x_slower_than_single_chip",
                           "protocol": "full_lufs_mb median / "
                                       "sp_quality_ndev1 median"})
    except Exception as e:  # noqa: BLE001
        _emit({"config": "sp_chain", "error": str(e)[:300]})

    return measured


def _end_to_end():
    """The honest product-level number (VERDICT r4 missing #1): wall
    clock of `api.process_audio` file-in -> mastered-file-out — decode,
    host staging, the full quality chain incl. the two-pass loudnorm
    host sync, WAV write; the _mp3 variant adds the inherently serial
    LAME encode. This is what a user of the reference's API contract
    (audio_mastering_engine.py:94-137, 171-226) actually experiences;
    the device-graph board lines above exclude all host I/O."""
    import os
    import tempfile

    from ame_tpu import api
    from ame_tpu.io import wav as wavio

    dur = N / SR
    rng = np.random.default_rng(7)
    x = (0.1 * rng.standard_normal((N, 2))).astype(np.float32)

    def noop(*_a, **_k):
        pass

    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "bench_in.wav")
        wavio.write_wav(src, x, SR, bits=16)   # a real user's PCM16 file
        del x

        for tag, mp3 in (("end_to_end_file", False),
                         ("end_to_end_file_mp3", True)):
            try:
                out = os.path.join(td, f"bench_out_{tag}.wav")
                settings = {
                    "input_file": src, "output_file": out,
                    "bass_boost": 2.0, "presence_boost": 1.5,
                    "treble_boost": 0.5, "width": 1.2,
                    "analog_character": 20.0, "lufs": -14.0,
                    "mode": "quality", "create_mp3": mp3,
                }

                def one():
                    t0 = time.perf_counter()
                    api.process_audio(settings, noop, noop, noop, noop)
                    return dur / (time.perf_counter() - t0)

                one()   # warmup: compile + codec shim load
                med, spread = _median_spread(one)
                _emit({"config": tag, "value": round(med, 1),
                       "spread": spread, "unit": "x_realtime",
                       "protocol": "process_audio wall clock: decode + "
                                   "staging + full quality chain + "
                                   "loudnorm host sync + WAV write"
                                   + (" + LAME VBR-V0 encode" if mp3
                                      else "")})
            except Exception as e:  # noqa: BLE001
                _emit({"config": tag,
                       "error": f"{type(e).__name__}: {e}"[:300]})

        # where the product-level time goes: decode / device chain (incl.
        # staging + the loudnorm host sync) / WAV write, timed separately
        # (the VERDICT r4 ask was to expose whether host I/O dominates)
        try:
            import jax.numpy as jnp
            from ame_tpu.io import force_stereo, read_audio
            from ame_tpu.io import wav as _w
            from ame_tpu.graph.chain import master_graph_fused
            from ame_tpu.config import MasterSettings
            t0 = time.perf_counter()
            audio, sr_in = read_audio(src)
            audio = force_stereo(audio)
            t_dec = time.perf_counter() - t0
            s = MasterSettings(bass_boost=2.0, presence_boost=1.5,
                               treble_boost=0.5, width=1.2,
                               analog_character=20.0, lufs=-14.0,
                               mode="quality")
            xg = jnp.asarray(audio)
            y, _info = master_graph_fused(xg, sr_in, s)   # compile
            float(np.asarray(y[0, 0]))
            t0 = time.perf_counter()
            y, _info = master_graph_fused(xg, sr_in, s)
            float(np.asarray(y[0, 0]))
            t_dev = time.perf_counter() - t0
            t0 = time.perf_counter()
            yh = np.asarray(y)
            t_fetch = time.perf_counter() - t0
            out2 = os.path.join(td, "bench_breakdown.wav")
            t0 = time.perf_counter()
            _w.write_wav(out2, yh, sr_in, bits=16)
            t_enc = time.perf_counter() - t0
            _emit({"config": "end_to_end_breakdown_s",
                   "decode": round(t_dec, 3),
                   "device_chain": round(t_dev, 3),
                   "fetch": round(t_fetch, 3),
                   "wav_write": round(t_enc, 3),
                   "unit": f"seconds ({N / SR:.1f} s track)"})
        except Exception as e:  # noqa: BLE001
            _emit({"config": "end_to_end_breakdown_s",
                   "error": f"{type(e).__name__}: {e}"[:300]})


def _reference_proxy(measured):
    """Measured reference-chain CPU speed (VERDICT r4 missing #2 /
    BASELINE.md 'must be benchmarked'). pydub/ffmpeg-CLI are absent from
    this image; the float64 oracle chain in tests/oracles.py is a
    faithful transcription of the reference's per-chunk DSP formulas
    (audio_mastering_engine.py:250-309) and is timed here as the proxy.
    A 15 s slice is used — every stage is linear per-sample (scipy IIR +
    the per-frame Python compressor loop), so x-realtime transfers to
    the 3-min track; full-track timing would burn ~10 min of watchdog on
    a number that does not change."""
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests import oracles

    slice_n = 15 * SR
    rng = np.random.default_rng(11)
    x = (0.1 * rng.standard_normal((slice_n, 2))).astype(np.float64)
    mb_settings = {"low_thresh": -25.0, "low_ratio": 6.0,
                   "mid_thresh": -20.0, "mid_ratio": 3.0,
                   "high_thresh": -15.0, "high_ratio": 4.0}

    def run_compat():
        """exact_compat_multiband's DSP portion, reference-style: int16
        round trips between stages (Q5), EQ, multiband with the
        per-frame compressor loop. The device config additionally runs
        loudnorm + the limiter, so the derived ratio is conservative."""
        t0 = time.perf_counter()
        xi = oracles.int16_roundtrip(x)
        y = oracles.apply_eq(np.asarray(xi, np.float32), SR,
                             {"bass_boost": 1.5, "treble_boost": -1.0,
                              "mid_cut": 0.0, "presence_boost": 0.0})
        y = oracles.int16_roundtrip(y)
        oracles.multiband_compress(y, SR, mb_settings)
        return (slice_n / SR) / (time.perf_counter() - t0)

    def run_full():
        """The headline chain's DSP portion (no multiband): analog
        character + 4-band EQ + width, reference formulas in float64."""
        t0 = time.perf_counter()
        y = oracles.apply_analog_character(x, SR, 20.0)
        y = oracles.apply_eq(np.asarray(y, np.float32), SR,
                             {"bass_boost": 2.0, "presence_boost": 1.5,
                              "treble_boost": 0.5, "mid_cut": 0.0})
        oracles.apply_stereo_width(y, 1.2)
        return (slice_n / SR) / (time.perf_counter() - t0)

    for tag, run, dev_key in (
            ("reference_cpu_proxy_compat_multiband", run_compat,
             "exact_compat_multiband"),
            ("reference_cpu_proxy_full_lufs_dsp", run_full, "full_lufs")):
        try:
            med, spread = _median_spread(run)
            _emit({"config": tag, "value": round(med, 1), "spread": spread,
                   "unit": "x_realtime",
                   "protocol": "float64 oracle transcription of the "
                               "reference DSP formulas on this host CPU, "
                               "15 s slice (linear per-sample cost)"})
            dev = measured.get(dev_key)
            if dev:
                _emit({"config": f"speedup_vs_reference__{dev_key}",
                       "value": round(dev / med, 1), "unit": "x",
                       "protocol": f"device {dev_key} median / {tag}"})
        except Exception as e:  # noqa: BLE001
            _emit({"config": tag, "error": f"{type(e).__name__}: {e}"[:300]})


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
    ap.add_argument("--smoke", action="store_true",
                    help="tiny-N fast pass that exercises EVERY board "
                         "section (values meaningless) — validates the "
                         "bench code paths on CPU before a driver run "
                         "burns the hardware window on a crash")
    args = ap.parse_args()

    if args.smoke:
        global N
        N = 1 << 18   # 5.9 s — big enough for the 3.1 s compat controller

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

    measured = {}
    if not args.headline_only:
        try:
            measured = _board(x, configs) or {}
        except Exception as e:  # noqa: BLE001
            print(f"bench: board aborted: {e}", file=sys.stderr, flush=True)
        try:
            _reference_proxy(measured)
        except Exception as e:  # noqa: BLE001
            print(f"bench: reference proxy aborted: {e}", file=sys.stderr,
                  flush=True)
        try:
            _end_to_end()
        except Exception as e:  # noqa: BLE001
            print(f"bench: end-to-end aborted: {e}", file=sys.stderr,
                  flush=True)

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
