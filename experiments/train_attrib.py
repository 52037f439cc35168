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


def timeit(fn, *args, iters=3, variants=None):
    """variants: list of first-arg replacements (pre-materialized) so repeated
    dispatches differ — the remote tunnel caches identical dispatches."""
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[:1]) if hasattr(x, "ravel") else x,
                 jax.tree_util.tree_leaves(out)[0])
    variants = variants or [args[0]] * iters
    t0 = time.perf_counter()
    for k in range(iters):
        out = fn(variants[k % len(variants)], *args[1:])
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    return (time.perf_counter() - t0) / iters


def main():
    from ape_tpu.modeling.build import build_ape_ti
    from ape_tpu.modeling.ape_deta.criterion import (
        DeformableCriterion,
        default_weight_dict,
    )

    from ape_tpu.utils.bench_utils import rearm_offsets, synth_params

    b = int(os.environ.get("BENCH_BATCH", 1))
    model = build_ape_ti(
        img_size=IMG, num_queries=300, window_radius=4,
        use_act_checkpoint=IMG >= 1024,
    )
    rng = np.random.RandomState(0)
    nt = 80
    images = jnp.asarray(rng.randn(b, IMG, IMG, 3), jnp.float32)
    sizes = jnp.asarray([[IMG, IMG]] * b, jnp.int32)
    text = jnp.asarray(rng.randn(b, nt, 1024), jnp.float32)
    tvalid = jnp.ones((b, nt), bool)
    targets = {
        "labels": jnp.asarray(rng.randint(0, nt, (b, 16)), jnp.int32),
        "boxes": jnp.asarray(rng.uniform(0.2, 0.6, (b, 16, 4)), jnp.float32),
        "valid": jnp.asarray(np.broadcast_to(np.arange(16)[None] < 8, (b, 16))),
        "masks": jnp.asarray((rng.rand(b, 16, IMG // 4, IMG // 4) > 0.7), jnp.float32),
    }

    params = synth_params(model, (images, sizes, text, tvalid))
    if os.environ.get("BENCH_REALISTIC", "1") != "0":
        params = rearm_offsets(
            params, off_scale=float(os.environ.get("BENCH_OFF_SCALE", "1.0"))
        )

    # ---- model fwd+bwd with dummy scalar loss ----
    @jax.jit
    def model_grad(images, params):
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

    img_variants = [images + k * 1e-3 for k in range(1, 4)]
    for v in img_variants:
        np.asarray(v[..., :1, :1])
    t_model = timeit(model_grad, images, params, variants=img_variants)
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
        d_variants = [
            {**diffable, "pred_logits": diffable["pred_logits"] + k * 1e-3}
            for k in range(1, 4)
        ]
        for v in d_variants:
            np.asarray(v["pred_logits"][..., :1])
        t_crit = timeit(crit_grad, diffable, variants=d_variants)
        print(f"criterion fwd+bwd         : {t_crit*1e3:8.1f} ms", flush=True)
    except Exception as e:
        print(f"criterion part failed: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
