"""Attribute backward window-MSDA time per pair: offatt kernel vs d_value
kernel (incl. its dplanes zero-init + fold-back) vs plane prep.

    OFF_SCALE=0.3 python experiments/bwd_attrib.py [pairs]

pairs: comma list like 256:256,256:128,128:256 (query:value edge). Chained
slope timing as in pair_suite.py.
"""

from __future__ import annotations

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from ape_tpu.ops.msda_window_pallas_bwd import (
    _run_pair_grad_merged,
    _run_pair_grad_offatt,
    _run_pair_grad_value,
)
from ape_tpu.ops.msda_window_pallas_v2 import _PairGeom, _prep_planes

H, P, D = 8, 4, 32
C = H * D
RADIUS = 4
OFF_SCALE = float(os.environ.get("OFF_SCALE", "0.3"))


def slope(fn, args, alts, chains=(2, 6), reps=3):
    times = {}
    for n in chains:
        @jax.jit
        def chained(a0, *rest):
            acc = jnp.float32(0)
            for _ in range(n):
                outs = fn(a0 + acc * 1e-9, *rest)
                leaf = jax.tree.leaves(outs)[0]
                acc = acc + jnp.sum(leaf[..., :1])
            return acc

        float(chained(*args))
        best = float("inf")
        for a in alts:
            t0 = time.perf_counter()
            float(chained(a, *args[1:]))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n0, n1 = chains
    return (times[n1] - times[n0]) / (n1 - n0)


def run(hq, hv):
    wq, wv = hq, hv
    rng = np.random.RandomState(0)
    b = 1
    v_l = jnp.asarray(rng.randn(b, hv * wv, C), jnp.float32)
    off = jnp.asarray(rng.randn(b, hq * wq, H, P, 2) * OFF_SCALE, jnp.float32)
    att = jnp.asarray(rng.rand(b, hq * wq, H, P), jnp.float32)
    g_out = jnp.asarray(rng.randn(b, hq * wq, C), jnp.float32)
    alts = [v_l + k * 1e-3 for k in range(1, 4)]
    galts = [g_out + k * 1e-3 for k in range(1, 4)]
    for a in alts + galts:
        np.asarray(a[..., :1])

    geom = _PairGeom(hq, wq, hv, wv, RADIUS)

    t_prep = slope(
        lambda v: _prep_planes(v.reshape(b, hv, wv, C), geom, jnp.bfloat16),
        (v_l,), alts,
    )
    t_offatt = slope(
        lambda v, o, a, gg: _run_pair_grad_offatt(
            v, o, a, gg, hq, wq, hv, wv, RADIUS, H, D, P
        ),
        (v_l, off, att, g_out), alts,
    )
    t_value = slope(
        lambda gg, o, a: _run_pair_grad_value(
            o, a, gg, hq, wq, hv, wv, RADIUS, H, D, P
        ),
        (g_out, off, att), galts,
    )
    t_merged = slope(
        lambda v, o, a, gg: _run_pair_grad_merged(
            v, o, a, gg, hq, wq, hv, wv, RADIUS, H, D, P
        ),
        (v_l, off, att, g_out), alts,
    )
    print(
        f"  q{hq:4d}^2 <- v{hv:4d}^2 : prep {t_prep*1e3:6.2f}  "
        f"offatt(incl prep) {t_offatt*1e3:6.2f}  value {t_value*1e3:6.2f}  "
        f"merged {t_merged*1e3:6.2f} ms",
        flush=True,
    )
    return t_merged


if __name__ == "__main__":
    pairs = (
        [tuple(int(x) for x in s.split(":")) for s in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [(256, 256), (256, 128), (256, 64), (128, 256), (128, 128)]
    )
    total = 0.0
    for hq, hv in pairs:
        total += run(hq, hv)
    print(f"bwd listed-pairs total: {total*1e3:.1f} ms (OFF_SCALE={OFF_SCALE})")
