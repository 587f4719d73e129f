"""Record golden numbers from the REAL FFmpeg filters into
tests/fixtures/golden_ffmpeg.json.

Run once in an environment where the bundled FFmpeg 8 stack is available
(ame_tpu.io.avfilter.available() is True); the committed fixture lets
tests/test_golden_ffmpeg.py's fixture-layer tests assert loudnorm/alimiter
parity (reference call sites audio_mastering_engine.py:223, 229-241) even
where the real filters are not loadable.

Usage:  python tools/gen_golden_fixtures.py
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # never the (slow) TPU tunnel

import numpy as np

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

from ame_tpu.io import avfilter as F  # noqa: E402

import test_golden_ffmpeg as T  # noqa: E402  (signal recipes live there)


def _aligned_lag(ours: np.ndarray, ff: np.ndarray, max_lag: int = 600):
    n = min(len(ours), len(ff)) - max_lag
    a = ours[:n, 0]
    best = (0, np.inf)
    for lag in range(max_lag):
        d = a - ff[lag:lag + n, 0]
        e = float(np.dot(d, d))
        if e < best[1]:
            best = (lag, e)
    return best[0]


def main() -> None:
    if not F.available():
        raise SystemExit("FFmpeg filter stack unavailable; cannot record")
    from ame_tpu.ops.limiter import alimiter_compat
    import jax.numpy as jnp

    fx = {"sr": T.SR, "measure": {}, "limiter": {}}

    for kind in T.MEASURE_KINDS:
        x = T.make_signal(kind)
        st = T._linear_mode_stats(x)
        fx["measure"][kind] = {"linear_stats": {
            k: st[k] for k in ("input_i", "input_tp", "input_lra",
                               "input_thresh")}}
        print(f"measure/{kind}: {fx['measure'][kind]['linear_stats']}")

    for kind in T.LIMITER_KINDS:
        x = T.limiter_signal(kind)
        yf, osr = F.alimiter(x, T.SR)
        assert osr == T.SR
        ours = np.asarray(alimiter_compat(jnp.asarray(x), T.SR))
        lag = _aligned_lag(ours, yf)
        n = (len(yf) - lag) // 1024 * 1024
        blocks = yf[lag:lag + n, 0].reshape(-1, 1024)
        env_ff = np.sqrt((blocks.astype(np.float64) ** 2).mean(1))
        # measure the actual envelope error of the current engine and set
        # the bound with 6 dB headroom (floored at 0.5 dB)
        env_ours = np.sqrt(
            (ours[:n, 0].reshape(-1, 1024).astype(np.float64) ** 2).mean(1))
        err = 20 * np.log10((env_ours + 1e-6) / (env_ff + 1e-6))
        bound = float(max(0.5, 2.0 * np.abs(err).max()))
        fx["limiter"][kind] = {
            "peak": float(np.abs(yf).max()),
            "lag": int(lag),
            "env_bound_db": round(bound, 3),
            "block_rms": [round(float(v), 6) for v in env_ff],
        }
        print(f"limiter/{kind}: peak={fx['limiter'][kind]['peak']:.4f} "
              f"lag={lag} env_err_max={np.abs(err).max():.3f} dB "
              f"bound={bound:.3f} dB ({len(env_ff)} blocks)")

    # dynamic-mode gain trajectories: the real filter's two-pass dynamic
    # output as a 100 ms RMS envelope (dB re input), per probe signal.
    fx["dynamic"] = {}
    L = T.SR // 10
    for kind in ("alt", "ramp", "multi"):
        x = T.make_signal(kind)
        p1 = F.loudnorm_pass1(x, T.SR)
        yf, _, stf = F.loudnorm_pass2(x, T.SR, p1, i=-14.0, tp=-1.5,
                                      lra=7.0, resample_to=T.SR)
        assert stf["normalization_type"] == "dynamic"
        nb = min(len(yf), len(x)) // L
        ef = np.sqrt((yf[:nb * L, 0].reshape(nb, L) ** 2).mean(1))
        ex = np.sqrt((x[:nb * L, 0].reshape(nb, L) ** 2).mean(1))
        g = 20 * np.log10((ef + 1e-7) / (ex + 1e-7))
        fx["dynamic"][kind] = {
            "p1": {k: p1[k] for k in ("input_i", "input_tp", "input_lra",
                                      "input_thresh", "target_offset")},
            "gain_env_db": [round(float(v), 4) for v in g],
        }
        print(f"dynamic/{kind}: {nb} frames, gain "
              f"{g.min():.2f}..{g.max():.2f} dB")

    out = os.path.join(os.path.dirname(__file__), os.pardir, "tests",
                       "fixtures", "golden_ffmpeg.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(fx, f, indent=1)
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()
