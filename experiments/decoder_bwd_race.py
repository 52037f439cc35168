"""Time decoder MSDA fwd+bwd at APE scale: hybrid custom VJP vs alternatives.

    python experiments/decoder_bwd_race.py [hybrid|dense_ad|gather_ad]
"""

from __future__ import annotations

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = ((256, 256), (128, 128), (64, 64), (32, 32), (16, 16))
B, Q, H, D, P = 1, 900, 8, 32, 4


def time_grad(fn, chains=(1, 3), reps=3):
    S = sum(h * w for h, w in SHAPES)
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    loc = jnp.asarray(rng.rand(B, Q, H, len(SHAPES), P, 2), jnp.float32)
    att = jnp.asarray(rng.rand(B, Q, H, len(SHAPES), P), jnp.float32)
    alts = [value + k * 1e-3 for k in range(1, reps + 1)]
    for a in alts:
        np.asarray(a[..., :1, :1])

    times = {}
    for n in chains:
        @jax.jit
        def chained(value, loc, att):
            def loss(v, l, a):
                return jnp.sum(fn(v, SHAPES, l, a) ** 2)

            acc = jnp.float32(0)
            v = value
            for _ in range(n):
                l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(v + acc * 1e-9, loc, att)
                acc = acc + l + sum(jnp.sum(gg[..., :1]) for gg in grads)
            return acc

        float(chained(value, loc, att))
        best = float("inf")
        for a in alts:
            t0 = time.perf_counter()
            float(chained(a, loc, att))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n0, n1 = chains
    return (times[n1] - times[n0]) / (n1 - n0)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "hybrid"
    if which == "hybrid":
        from ape_tpu.ops.msda_decoder import ms_deform_attn_decoder as fn
    elif which == "dense_ad":
        from ape_tpu.ops.msda_decoder import ms_deform_attn_dense as fn
    else:
        from ape_tpu.ops.msda import ms_deform_attn

        fn = lambda v, s, l, a: ms_deform_attn(v, s, l, a)
    dt = time_grad(fn)
    print(f"{which}: fwd+bwd {dt*1e3:.1f} ms/layer")
