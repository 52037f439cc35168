#!/usr/bin/env python
"""Training-step wall time on the real chip (fwd + bwd + AdamW).

The encoder MSDA backward currently routes through the exact-gather VJP
(scatter-adds — the known round-2 perf gap, PERF.md); this harness is the
meter for that work. BENCH_IMG shrinks the resolution (default 512: the full
1024 backward exceeds the remote-compile budget pre-Pallas-backward).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

IMG = int(os.environ.get("BENCH_IMG", 512))
ITERS = int(os.environ.get("BENCH_ITERS", 3))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from ape_tpu.modeling.build import build_ape_ti
    from ape_tpu.modeling.ape_deta.criterion import DeformableCriterion, default_weight_dict
    from ape_tpu.engine.train_step import create_train_state, make_train_step

    model = build_ape_ti(
        img_size=IMG, num_queries=300, window_radius=4,
        use_act_checkpoint=IMG >= 1024,  # 1024^2 training OOMs HBM without remat
    )
    rng = np.random.RandomState(0)
    nt = 80
    batch = {
        "images": jnp.asarray(rng.randn(1, IMG, IMG, 3), jnp.float32),
        "image_sizes": jnp.asarray([[IMG, IMG]], jnp.int32),
        "text_features": jnp.asarray(rng.randn(1, nt, 1024), jnp.float32),
        "text_valid": jnp.ones((1, nt), bool),
        "targets": {
            "labels": jnp.asarray(rng.randint(0, nt, (1, 8)), jnp.int32),
            "boxes": jnp.asarray(rng.uniform(0.2, 0.6, (1, 8, 4)), jnp.float32),
            "valid": jnp.asarray(np.arange(8)[None] < 4),
            "masks": jnp.asarray((rng.rand(1, 8, IMG // 4, IMG // 4) > 0.7), jnp.float32),
        },
    }
    shapes = jax.eval_shape(
        lambda r: model.init(r, batch["images"], batch["image_sizes"],
                             batch["text_features"], batch["text_valid"]),
        jax.random.PRNGKey(0),
    )["params"]
    prng = np.random.RandomState(0)
    params = jax.tree.map(lambda s: jnp.asarray(prng.normal(0, 0.02, s.shape), s.dtype), shapes)
    crit = DeformableCriterion(num_classes=nt, weight_dict=default_weight_dict(),
                               num_queries=300, losses=("class", "boxes", "masks"))
    tx = optax.chain(optax.clip_by_global_norm(0.1), optax.adamw(2e-4))
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, crit, tx), donate_argnums=(0,))
    key = jax.random.PRNGKey(0)
    state, m = step(state, batch, key)
    print("first step loss:", float(m["total_loss"]), flush=True)
    t0 = time.perf_counter()
    for k in range(ITERS):
        batch["images"] = batch["images"] + 1e-4
        state, m = step(state, batch, key)
    _ = float(m["total_loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"metric": f"APE-Ti train step @ {IMG}x{IMG}",
                      "value": round(dt, 3), "unit": "s/step"}))


if __name__ == "__main__":
    main()
