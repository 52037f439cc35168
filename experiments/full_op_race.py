"""Race the full 5-level window-MSDA op: v2 (25 pair kernels) vs v3 (fused rows).

    python experiments/full_op_race.py [v2|v3|both]
"""

from __future__ import annotations

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

H, P, D = 8, 4, 32
RADIUS = 4
_LEVELS = [
    int(x) for x in os.environ.get("LEVELS", "256,128,64,32,16").split(",")
]
SHAPES = tuple((l, l) for l in _LEVELS)


def time_op(fn, chains=(2, 8), reps=3):
    S = sum(h * w for h, w in SHAPES)
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(1, S, H, D), jnp.float32)
    off = jnp.asarray(
        rng.randn(1, S, H, len(SHAPES), P, 2)
        * float(os.environ.get("OFF_SCALE", "2")),
        jnp.float32,
    )
    att = jnp.asarray(rng.rand(1, S, H, len(SHAPES), P), jnp.float32)
    alts = [value + k * 1e-3 for k in range(1, reps + 1)]
    for a in alts:
        np.asarray(a[..., :1, :1])

    times = {}
    for n in chains:
        @jax.jit
        def chained(value, off, att):
            acc = jnp.float32(0)
            for _ in range(n):
                out = fn(value + acc * 1e-6, SHAPES, off, att, RADIUS)
                acc = acc + jnp.sum(out[:, :1, :1])
            return acc

        float(chained(value, off, att))  # compile
        best = float("inf")
        for a in alts:
            t0 = time.perf_counter()
            float(chained(a, off, att))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n0, n1 = chains
    return (times[n1] - times[n0]) / (n1 - n0)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("v2", "both"):
        from ape_tpu.ops.msda_window_pallas_v2 import ms_deform_attn_window_pallas_v2

        print(f"v2 (25 pair kernels): {time_op(ms_deform_attn_window_pallas_v2)*1e3:7.2f} ms/layer", flush=True)
    if which in ("v3", "both"):
        from experiments.msda_window_pallas_v3 import ms_deform_attn_window_pallas_v3

        print(f"v3 (fused rows)     : {time_op(ms_deform_attn_window_pallas_v3)*1e3:7.2f} ms/layer", flush=True)
    if which in ("v5", "both"):
        from experiments.msda_window_pallas_v5 import ms_deform_attn_window_pallas_v5

        print(f"v5 (fused vlevels)  : {time_op(ms_deform_attn_window_pallas_v5)*1e3:7.2f} ms/layer", flush=True)
