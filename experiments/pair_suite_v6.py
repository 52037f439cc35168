"""Time the v6 transposed pair kernel vs v2 for the wide query levels.

Chained-jit slope timing (PERF.md harness). Run on the real TPU:

    OFF_SCALE=2.0 python experiments/pair_suite_v6.py

Covers the pairs v6 takes in production (query levels 256^2 and 128^2 of the
5-level pyramid) and prints v2 and v6 ms per pair side by side.
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
from experiments.msda_window_pallas_v6 import _run_pair_v6

H, P, D = 8, 4, 32
C = H * D
RADIUS = 4
OFF_SCALE = float(os.environ.get("OFF_SCALE", "2.0"))


def time_pair(runner, hq, wq, hv, wv, chains=(4, 20), reps=3, transposed=False):
    rng = np.random.RandomState(0)
    b = 1
    v_l = jnp.asarray(rng.randn(b, hv * wv, C), jnp.float32)
    off = jnp.asarray(rng.randn(b, hq * wq, H, P, 2) * OFF_SCALE, jnp.float32)
    att = jnp.asarray(rng.rand(b, hq * wq, H, P), jnp.float32)
    alts = [v_l + k * 1e-3 for k in range(1, reps + 1)]
    for a in alts:
        np.asarray(a[..., :1])

    times = {}
    for n in chains:

        @jax.jit
        def chained(v_l, off, att):
            acc = jnp.float32(0)
            for _ in range(n):
                out = runner(
                    v_l + acc * 1e-6, off, att, hq, wq, hv, wv, RADIUS, H, D, P
                )
                acc = acc + jnp.sum(out[:, :1, :1])
            return acc

        r = chained(v_l, off, att)
        float(r)
        best = float("inf")
        for a in alts:
            t0 = time.perf_counter()
            r = chained(a, off, att)
            float(r)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    ks = sorted(times)
    return (times[ks[-1]] - times[ks[0]]) / (ks[-1] - ks[0]) * 1000.0


def main():
    qlevels = [(256, 256), (128, 128)]
    vlevels = [(256, 256), (128, 128), (64, 64), (32, 32), (16, 16)]
    tot2 = tot6 = 0.0
    print(f"OFF_SCALE={OFF_SCALE}")
    for hq, wq in qlevels:
        for hv, wv in vlevels:
            t2 = time_pair(_run_pair_v2, hq, wq, hv, wv)
            t6 = time_pair(_run_pair_v6, hq, wq, hv, wv)
            tot2 += t2
            tot6 += t6
            print(
                f"  q {hq:3d}^2 <- v {hv:3d}^2 : v2 {t2:6.2f} ms   v6 {t6:6.2f} ms"
            )
    print(f"wide-row totals: v2 {tot2:.1f} ms   v6 {tot6:.1f} ms")


if __name__ == "__main__":
    main()
