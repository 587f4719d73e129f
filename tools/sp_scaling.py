"""Sequence-parallel overhead scaling curve on the virtual CPU mesh
(VERDICT r4 item 4: "produce a CPU-mesh scaling curve (1/2/4/8)
estimating break-even").

What this measures and what it means
------------------------------------
On this host the 1/2/4/8 "devices" are XLA:CPU virtual devices sharing
one physical CPU, so sharding does NOT reduce wall-clock the way real
chips do. What the curve DOES measure is the sp machinery's **total-work
inflation** I(ndev) = T_sp(ndev) / T_single: every extra FLOP and byte
the sp decomposition adds (zero-input-response corrections, halos,
replicated loudnorm gate math, carry all-gathers) shows up as extra
wall-clock on the shared CPU.

On real chips, per-chip wall-clock is ~ T_single * I(ndev) / ndev plus
ICI collective latency (which this CPU curve cannot see but which is
microseconds-scale for the fixed-size carries involved: one
[ndev, k, C, 2] gather per cascade, one [n_hops] gather, two edge
halos). So the estimated break-even is the smallest ndev with
I(ndev) < ndev, and the estimated speedup at ndev is ndev / I(ndev).

Run:  python tools/sp_scaling.py [--n 2097152]
Emits one JSON line per point; paste into docs/SP_SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AME_TPU_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

SR = 44100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 21,
                    help="track length in samples (hop/shard-granule "
                         "aligned internally)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import ame_tpu  # noqa: F401 — platform override + compile cache
    import jax
    import jax.numpy as jnp

    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph_fused
    from ame_tpu.parallel.mesh import make_mesh
    from ame_tpu.parallel.sp_master import master_sequence_parallel

    hop = 4410
    n = (args.n // (8 * hop)) * (8 * hop)
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.1 * rng.standard_normal((n, 2)), jnp.float32)

    settings = {
        "sp_quality": MasterSettings(
            bass_boost=2.0, presence_boost=1.5, width=1.2,
            analog_character=20.0, multiband=True, lufs=-14.0,
            mode="quality"),
        "sp_compat": MasterSettings(
            bass_boost=2.0, width=1.2, multiband=True, lufs=-14.0,
            mode="compat"),
    }

    def timed(fn):
        fn()  # warmup/compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            y = fn()
            jax.block_until_ready(y)
            best = min(best, time.perf_counter() - t0)
        return best

    out = {"n": n, "sr": SR, "host_devices": len(jax.devices())}
    print(json.dumps({"config": "meta", **out}), flush=True)

    # single-chip fused graph, sp_quality settings — the I(ndev) baseline
    t_single = timed(
        lambda: master_graph_fused(x, SR, settings["sp_quality"])[0])
    print(json.dumps({"config": "single_chip_full_mb",
                      "seconds": round(t_single, 3),
                      "x_realtime": round((n / SR) / t_single, 1)}),
          flush=True)

    for mode, s in settings.items():
        base = None
        for ndev in (1, 2, 4, 8):
            mesh = make_mesh({"sp": ndev}, devices=jax.devices()[:ndev])
            t = timed(lambda: master_sequence_parallel(x, SR, s, mesh)[0])
            if ndev == 1:
                base = t
            rec = {"config": f"{mode}_ndev{ndev}",
                   "seconds": round(t, 3),
                   "x_realtime": round((n / SR) / t, 1),
                   "work_inflation_vs_sp1": round(t / base, 3)}
            if mode == "sp_quality":
                infl = t / t_single
                rec["work_inflation_vs_single"] = round(infl, 3)
                rec["est_real_chip_speedup_at_ndev"] = round(ndev / infl, 2)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
