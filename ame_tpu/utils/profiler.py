"""On-demand performance profiler for the mastering graph (SURVEY.md §5.1
observability, beyond the reference's timestamped logs — the tool you reach
for when a deployment asks "where does the time go?").

``profile_master`` measures, for one (track, settings) pair:

  * cold-start cost: first fused-graph call incl. XLA compile;
  * steady-state throughput: median fused-program wall time over N runs
    with the host<->device fetch round-trip measured and subtracted
    (``block_until_ready`` does not block over tunneled TPU transports, so
    completion is forced by a scalar fetch — same discipline as bench.py);
  * per-stage breakdown via the STAGED graph path (graph.chain.master_graph
    with a timer sink; stage boundaries force completion, so the stage sum
    exceeds the fused time — the fused program overlaps/fuses across them);
  * host RSS and per-device HBM peaks (utils.telemetry).

Optionally wraps the steady-state loop in ``jax.profiler`` tracing so the
XLA op-level timeline can be inspected in tensorboard/xprof.
"""

from __future__ import annotations

import time

import numpy as np

from ame_tpu.utils import telemetry


def _fetch_scalar(tree) -> float:
    import jax
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(leaf[(0,) * leaf.ndim]))


def profile_master(x, sample_rate: float, settings, runs: int = 10,
                   stages: bool = True, trace_dir: str | None = None) -> dict:
    """Profile the mastering graph on device for [N, 2] audio ``x``."""
    import jax.numpy as jnp

    from ame_tpu.config import MasterSettings
    from ame_tpu.graph.chain import master_graph, master_graph_fused

    if isinstance(settings, dict):
        settings = MasterSettings.from_dict(settings)
    x = jnp.asarray(x)
    n = int(x.shape[0])
    seconds = n / float(sample_rate)

    report: dict = {
        "n_samples": n,
        "sample_rate": float(sample_rate),
        "seconds": round(seconds, 3),
        "mode": settings.mode,
        "runs": runs,
    }

    # cold start: compile + first execution of the fused program
    t0 = time.perf_counter()
    y, _ = master_graph_fused(x, sample_rate, settings)
    _fetch_scalar(y)
    report["cold_start_s"] = round(time.perf_counter() - t0, 3)

    # fetch round-trip, measured on an already-materialized value
    t0 = time.perf_counter()
    _fetch_scalar(y)
    rtt = time.perf_counter() - t0
    report["fetch_rtt_ms"] = round(rtt * 1e3, 3)

    # steady state: each sample is one dispatch + forced completion
    def _one_run():
        t0 = time.perf_counter()
        yy, _ = master_graph_fused(x, sample_rate, settings)
        _fetch_scalar(yy)
        return time.perf_counter() - t0 - rtt

    times = None
    if trace_dir is not None:
        import jax
        with jax.profiler.trace(trace_dir):
            times = [_one_run() for _ in range(runs)]
        report["trace_dir"] = trace_dir
    else:
        times = [_one_run() for _ in range(runs)]
    med = float(np.median(times))
    report["steady_ms"] = round(med * 1e3, 3)
    report["steady_ms_min"] = round(float(np.min(times)) * 1e3, 3)
    report["x_realtime"] = round(seconds / max(med, 1e-9), 1)

    if stages:
        # staged path: per-stage wall clock, completion forced per stage.
        sink: dict = {}
        master_graph(x, sample_rate, settings, timer={})  # warm stage jits
        for _ in range(max(runs // 2, 1)):
            master_graph(x, sample_rate, settings, timer=sink)
        k = max(runs // 2, 1)
        report["stages_ms"] = {name: round(t / k * 1e3, 3)
                               for name, t in sink.items()}
        report["stages_note"] = (
            "per-stage times include one forced host sync each; their sum "
            "exceeds steady_ms because the fused program overlaps stages")

    report["host_rss_mb"] = telemetry.host_rss_mb()
    hbm = telemetry.device_memory_stats()
    if hbm:
        report["hbm_peak_mb"] = [
            {"device": s["device"],
             "peak_mb": round((s["peak_bytes_in_use"] or 0) / 1024 ** 2, 1)}
            for s in hbm]
    return report
