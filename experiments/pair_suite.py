"""Time the PRODUCTION v2 pair kernel for every pyramid pair at APE scale.

Chained-jit slope timing (PERF.md). Run on the real TPU:

    python experiments/pair_suite.py [levels]

levels default: 256,128,64,32,16 (square). Prints per-pair ms and the
per-encoder-layer total.
"""

from __future__ import annotations

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from ape_tpu.ops.msda_window_pallas_v2 import _run_pair_v2

H, P, D = 8, 4, 32
C = H * D
RADIUS = int(os.environ.get("RADIUS", "4"))
OFF_SCALE = float(os.environ.get("OFF_SCALE", "2.0"))


def time_pair(hq, wq, hv, wv, chains=(4, 20), reps=3):
    rng = np.random.RandomState(0)
    b = 1
    v_l = jnp.asarray(rng.randn(b, hv * wv, C), jnp.float32)
    off = jnp.asarray(rng.randn(b, hq * wq, H, P, 2) * OFF_SCALE, jnp.float32)
    att = jnp.asarray(rng.rand(b, hq * wq, H, P), jnp.float32)
    # pre-touch perturbed inputs so eager-add compiles stay out of the timings
    alts = [v_l + k * 1e-3 for k in range(1, reps + 1)]
    for a in alts:
        np.asarray(a[..., :1])

    times = {}
    for n in chains:
        @jax.jit
        def chained(v_l, off, att):
            acc = jnp.float32(0)
            for _ in range(n):
                out = _run_pair_v2(
                    v_l + acc * 1e-6, off, att, hq, wq, hv, wv, RADIUS, H, D, P
                )
                acc = acc + jnp.sum(out[:, :1, :1])
            return acc

        r = chained(v_l, off, att)
        float(r)  # warm/compile
        best = float("inf")
        for a in alts:  # min over repeats: tunnel RPC jitter is one-sided
            t0 = time.perf_counter()
            r = chained(a, off, att)
            float(r)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n0, n1 = chains
    return (times[n1] - times[n0]) / (n1 - n0)


if __name__ == "__main__":
    levels = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1 else [])] or [
        256, 128, 64, 32, 16
    ]
    total = 0.0
    for lq in levels:
        for lv in levels:
            dt = time_pair(lq, lq, lv, lv)
            total += dt
            print(f"  q{lq:4d}^2 <- v{lv:4d}^2 : {dt*1e3:7.2f} ms", flush=True)
    print(f"encoder-layer MSDA total: {total*1e3:.1f} ms")
