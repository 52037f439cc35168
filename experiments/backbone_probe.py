"""Decompose backbone+neck time (APE-Ti bench scale, 13.9 ms measured vs
~1 ms roofline): patch embed vs window blocks vs global blocks vs neck.

    python experiments/backbone_probe.py
"""

from __future__ import annotations

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

IMG = int(os.environ.get("BENCH_IMG", 1024))
DTYPE = jnp.dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))


def timed(fn, *args, chains=(1, 5), reps=3):
    x, rest = args[0], args[1:]
    alts = [jax.tree.map(lambda a: a + k * 1e-4, x) for k in range(1, reps + 1)]
    for a in alts:
        np.asarray(jax.tree_util.tree_leaves(a)[0].ravel()[:1])

    times = {}
    for n in chains:
        @jax.jit
        def chained(x, *rest):
            acc = jnp.float32(0)
            for _ in range(n):
                out = fn(jax.tree.map(lambda a: a + acc.astype(a.dtype) * 1e-9, x), *rest)
                leaf = jax.tree_util.tree_leaves(out)[0]
                acc = acc + jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:1]).astype(jnp.float32)
            return acc

        float(chained(x, *rest))
        best = float("inf")
        for a in alts:
            t0 = time.perf_counter()
            float(chained(a, *rest))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n0, n1 = chains
    return (times[n1] - times[n0]) / (n1 - n0)


def synth(shapes):
    prng = np.random.RandomState(0)
    return jax.tree.map(
        lambda s: jnp.asarray(prng.normal(0, 0.02, s.shape).astype(s.dtype)), shapes
    )


def main():
    from ape_tpu.modeling.build import build_backbone_ti

    fpn = build_backbone_ti(img_size=IMG, dtype=DTYPE)
    net = fpn.net
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, IMG, IMG, 3), jnp.float32)

    fpn_params = synth(
        jax.eval_shape(lambda r: fpn.init(r, images, True), jax.random.PRNGKey(0))
    )["params"]
    net_params = fpn_params["net"]

    t_all = timed(lambda im, p: fpn.apply({"params": p}, im, True), images, fpn_params)
    print(f"backbone+neck total : {t_all*1e3:7.2f} ms", flush=True)

    t_vit = timed(lambda im, p: net.apply({"params": p}, im, True), images, net_params)
    print(f"  ViT (patch+12 blk): {t_vit*1e3:7.2f} ms  (neck = {1e3*(t_all-t_vit):.2f})", flush=True)

    # patch conv alone
    import flax.linen as nn

    pconv = nn.Conv(192, (16, 16), strides=(16, 16), dtype=DTYPE)
    pc_params = synth(
        jax.eval_shape(lambda r: pconv.init(r, images), jax.random.PRNGKey(0))
    )["params"]
    t_pe = timed(lambda im, p: pconv.apply({"params": p}, im), images, pc_params)
    print(f"  patch conv        : {t_pe*1e3:7.2f} ms", flush=True)

    # single blocks at (1, 64, 64, 192)
    from ape_tpu.modeling.backbone.eva_vit import Block
    from ape_tpu.modeling.backbone.vit_utils import rope_2d_table

    feat = jnp.asarray(rng.randn(1, IMG // 16, IMG // 16, 192), DTYPE)
    for kind, wsz in (("window", 14), ("global", 0)):
        blk = Block(
            dim=192, num_heads=3, mlp_hidden_dim=int(192 * 4 * 2 / 3),
            window_size=wsz, packed_swiglu=True, dtype=DTYPE,
        )
        half = 192 // 3 // 2
        cos, sin = rope_2d_table(half, wsz if wsz else IMG // 16, 16)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)
        bp = synth(
            jax.eval_shape(
                lambda r: blk.init(r, feat, cos, sin, True), jax.random.PRNGKey(0)
            )
        )["params"]
        t_b = timed(
            lambda f, p: blk.apply({"params": p}, f, cos, sin, True), feat, bp,
            chains=(1, 9),
        )
        print(f"  {kind:6s} block x1  : {t_b*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
