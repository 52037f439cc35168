"""Bisect the training step: model fwd+bwd (dummy loss) vs criterion fwd+bwd.

tools/bench_train.py measures the full step (fwd+bwd+AdamW); this splits it:
  * model-only: grad of sum-of-outputs through the model — isolates the
    model's backward (encoder/decoder/backbone).
  * criterion-only: grad of the loss w.r.t. precomputed model OUTPUTS —
    isolates matcher + losses (Hungarian auction, stage assigners, fed loss).

    BENCH_IMG=512 python experiments/train_attrib.py
"""

from __future__ import annotations

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

IMG = int(os.environ.get("BENCH_IMG", 512))


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[:1]) if hasattr(x, "ravel") else x,
                 jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    return (time.perf_counter() - t0) / iters


def main():
    from ape_tpu.modeling.build import build_ape_ti
    from ape_tpu.modeling.ape_deta.criterion import (
        DeformableCriterion,
        default_weight_dict,
    )

    model = build_ape_ti(img_size=IMG, num_queries=300, window_radius=4)
    rng = np.random.RandomState(0)
    nt = 80
    images = jnp.asarray(rng.randn(1, IMG, IMG, 3), jnp.float32)
    sizes = jnp.asarray([[IMG, IMG]], jnp.int32)
    text = jnp.asarray(rng.randn(1, nt, 1024), jnp.float32)
    tvalid = jnp.ones((1, nt), bool)
    targets = {
        "labels": jnp.asarray(rng.randint(0, nt, (1, 16)), jnp.int32),
        "boxes": jnp.asarray(rng.uniform(0.2, 0.6, (1, 16, 4)), jnp.float32),
        "valid": jnp.asarray(np.arange(16)[None] < 8),
        "masks": jnp.asarray((rng.rand(1, 16, IMG // 4, IMG // 4) > 0.7), jnp.float32),
    }

    shapes = jax.eval_shape(
        lambda r: model.init(r, images, sizes, text, tvalid), jax.random.PRNGKey(0)
    )["params"]
    prng = np.random.RandomState(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(prng.normal(0, 0.02, s.shape).astype(s.dtype)), shapes
    )

    # ---- model fwd+bwd with dummy scalar loss ----
    @jax.jit
    def model_grad(params, images):
        def loss(p):
            out = model.apply({"params": p}, images, sizes, text, tvalid)
            s = jnp.sum(out["pred_logits"]) + jnp.sum(out["pred_boxes"])
            if out.get("pred_masks") is not None:
                s = s + jnp.sum(out["pred_masks"]) * 1e-6
            for a in out["aux_outputs"]:
                s = s + jnp.sum(a["pred_logits"]) * 1e-6
            s = s + jnp.sum(out["enc_outputs"]["pred_logits"]) * 1e-6
            return s
        return jax.grad(loss)(params)

    t_model = timeit(model_grad, params, images)
    print(f"model fwd+bwd (dummy loss): {t_model*1e3:8.1f} ms", flush=True)

    # ---- criterion fwd+bwd w.r.t. model outputs ----
    out = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, text, tvalid)
    )(params)
    out = jax.tree.map(lambda x: x, out)  # concretize

    criterion = DeformableCriterion(
        num_classes=nt,
        weight_dict=default_weight_dict(),
        losses=["class", "boxes", "masks"],
        num_queries=300,
    )

    diffable = {
        "pred_logits": out["pred_logits"],
        "pred_boxes": out["pred_boxes"],
        "pred_masks": out.get("pred_masks"),
    }

    num_boxes = jnp.clip(jnp.sum(targets["valid"].astype(jnp.float32)), 1.0)

    @jax.jit
    def crit_grad(diffable):
        def loss(d):
            o = dict(out)
            o.update({k: v for k, v in d.items() if v is not None})
            losses = criterion(jax.random.PRNGKey(0), o, targets, num_boxes)
            return criterion.total(losses)
        return jax.grad(loss)(diffable)

    try:
        t_crit = timeit(crit_grad, diffable)
        print(f"criterion fwd+bwd         : {t_crit*1e3:8.1f} ms", flush=True)
    except Exception as e:
        print(f"criterion part failed: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
