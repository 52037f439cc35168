"""Time encoder window-MSDA fwd+bwd at APE scale: Pallas bwd vs exact-path VJP.

    python experiments/encoder_bwd_race.py [pallas|exact]
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
B, H, D, P = 1, 8, 32, 4
RADIUS = 4
OFF_SCALE = float(os.environ.get("OFF_SCALE", "0.3"))


def main(which):
    from ape_tpu.ops.msda_dispatch import (
        _exact_equiv,
        ms_deform_attn_window_dispatch,
    )

    S = sum(h * w for h, w in SHAPES)
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    off = jnp.asarray(rng.randn(B, S, H, len(SHAPES), P, 2) * OFF_SCALE, jnp.float32)
    att = jnp.asarray(rng.rand(B, S, H, len(SHAPES), P), jnp.float32)
    alts = [value + k * 1e-3 for k in range(1, 4)]
    for a in alts:
        np.asarray(a[..., :1, :1])

    if which == "pallas":
        f = lambda v, o, a: ms_deform_attn_window_dispatch(v, SHAPES, o, a, RADIUS)
    else:
        f = lambda v, o, a: _exact_equiv(v, SHAPES, o, a, RADIUS)

    times = {}
    for n in (1, 2):
        @jax.jit
        def chained(value, off, att):
            def loss(v, o, a):
                return jnp.sum(f(v, o, a) ** 2)

            acc = jnp.float32(0)
            for _ in range(n):
                l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                    value + acc * 1e-9, off, att
                )
                acc = acc + l + sum(jnp.sum(gg[..., :1]) for gg in grads)
            return acc

        float(chained(value, off, att))
        best = float("inf")
        for a in alts:
            t0 = time.perf_counter()
            float(chained(a, off, att))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    dt = times[2] - times[1]
    print(f"{which}: encoder MSDA fwd+bwd {dt*1e3:.1f} ms/layer (OFF_SCALE={OFF_SCALE})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "pallas")
