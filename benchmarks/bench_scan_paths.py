"""Microbenchmark: IIR engine paths on the real TPU.

Compares, at full-track length (2^23 samples, stereo):
  * XLA blocked Kogge-Stone scan   (ops/scan_iir, AME_TPU_PALLAS=0)
  * Pallas one-pass cascade kernel (ops/pallas_scan)
  * tile-conv MXU engine           (ops/tile_conv)
for k = 1, 2, 4 host-designed cascades plus the traced k=4 quality-EQ
case and the 3-cascade crossover bank.

Timing uses a scalar fetch to force completion (block_until_ready is
unreliable over the tunneled TPU — ROADMAP environment notes).
"""
import os
import sys
import time

# NB: do NOT use PYTHONPATH to make ame_tpu importable — setting it breaks
# the axon TPU plugin discovery in this environment. Self-path instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from scipy import signal

from ame_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

SR = 44100.0
N = 1 << 23
REPS = 10


def timeit(fn, *args):
    y = fn(*args)
    y0 = y[0] if isinstance(y, tuple) else y
    float(np.asarray(y0[0, 0]))  # warm + sync
    t0 = time.perf_counter()
    float(np.asarray(y0[0, 0]))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        y = fn(*args)
        y0 = y[0] if isinstance(y, tuple) else y
    float(np.asarray(y0[0, 0]))
    return (time.perf_counter() - t0 - rtt) / REPS


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.1 * rng.standard_normal((N, 2)), jnp.float32)

    cases = {
        1: signal.butter(2, 250 / (SR / 2), "lowpass", output="sos"),
        2: signal.butter(4, 250 / (SR / 2), "lowpass", output="sos"),
        4: signal.butter(4, [900 / (SR / 2), 1100 / (SR / 2)], "bandpass",
                         output="sos"),
    }

    from ame_tpu.ops import scan_iir as si
    from ame_tpu.ops.pallas_scan import sosfilt_pallas
    from ame_tpu.ops.tile_conv import sosfilt_tileconv, sosfilt_tileconv_bank

    for k, sos in cases.items():
        sos64 = np.asarray(sos, np.float64)
        t_xla = timeit(lambda: si._cascade_ks_pack(
            x, tuple(map(jnp.asarray, si._host_pack_cached(
                np.ascontiguousarray(sos64).tobytes(), k, si._MAX_BLOCK,
                "float32"))), None, si._MAX_BLOCK, k))
        t_tc = timeit(lambda: sosfilt_tileconv(sos64, x))
        try:
            t_pl = timeit(lambda: sosfilt_pallas(sos64, x))
        except Exception as e:  # pragma: no cover
            t_pl = float("nan")
        print(f"k={k}: xla={t_xla*1e3:7.2f} ms  pallas={t_pl*1e3:7.2f} ms"
              f"  tileconv={t_tc*1e3:7.2f} ms")

    # traced quality-EQ shape (k=4, gains traced)
    sos_t = jnp.asarray(cases[4], jnp.float32)

    @jax.jit
    def run_traced_tc(s, xx):
        return sosfilt_tileconv(s, xx)

    @jax.jit
    def run_traced_pl(s, xx):
        return sosfilt_pallas(s, xx)

    t_tc = timeit(lambda: run_traced_tc(sos_t, x))
    t_pl = timeit(lambda: run_traced_pl(sos_t, x))
    print(f"traced k=4:           pallas={t_pl*1e3:7.2f} ms"
          f"  tileconv={t_tc*1e3:7.2f} ms")

    # crossover bank: LR4 low + (HP250->LP4k) mid + (HP250->HP4k) high
    from ame_tpu.dsp import design
    lo = design.linkwitz_riley_sos(4, 250.0, "lowpass", SR)
    hp = design.linkwitz_riley_sos(4, 250.0, "highpass", SR)
    lp4k = design.linkwitz_riley_sos(4, 4000.0, "lowpass", SR)
    hp4k = design.linkwitz_riley_sos(4, 4000.0, "highpass", SR)
    mid = np.concatenate([hp, lp4k])
    high = np.concatenate([hp, hp4k])
    t_bank = timeit(lambda: sosfilt_tileconv_bank([lo, mid, high], x))
    print(f"bank G=3 (k=2,4,4):   tileconv={t_bank*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
