#!/usr/bin/env python
"""FLOPs + MFU report for the benchmark configurations (round-5 verdict #4).

Compiles the exact forward (or train step) that bench.py / tools/bench_train.py
time and prints XLA's own cost analysis: FLOPs/image, HBM bytes accessed, and
— given a measured img/s — the implied MFU against the v5e bf16 peak.

Capability match: /root/reference/scripts/eval_flops.sh (fvcore flop counts at
num_classes in {1,128,1280}, segm off, reduced FPN) — here the XLA compiled-
HLO cost analysis of the same configurations bench.py times.

Usage:
  python tools/flops_report.py --model ti --mode protocol [--img-per-s 16.4]
  python tools/flops_report.py --model l_d --mode full
  python tools/flops_report.py --model ti --mode train [--img-per-s 1.93]

Writes/updates FLOPS.json at the repo root (keyed "{model}-{mode}") so
bench.py and BASELINE.md can cite one source of truth.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# TPU v5e: 197 TFLOP/s bf16 peak per chip, 819 GB/s HBM BW (public spec).
V5E_PEAK_BF16 = 197e12
V5E_HBM_GBPS = 819e9


def build_forward(model_name: str, mode: str, img: int, num_text: int, dtype):
    import jax
    import jax.numpy as jnp

    from ape_tpu.modeling.build import build_ape_l_d, build_ape_ti

    full = mode != "protocol"
    kwargs = dict(
        img_size=img,
        num_queries=900,
        window_radius=4,
        mask_on=full,
        scale_factors=(4.0, 2.0, 1.0, 0.5) if full else (2.0, 1.0, 0.5),
        dtype=dtype,
    )
    if model_name == "ti":
        model = build_ape_ti(**kwargs)
    elif model_name == "l_d":
        model = build_ape_l_d(use_act_checkpoint=False, drop_path_rate=0.0, **kwargs)
    else:
        raise SystemExit(f"unknown model {model_name}")

    rng = np.random.RandomState(0)
    x = (
        jnp.asarray(rng.randn(1, img, img, 3), jnp.float32),
        jnp.asarray([[img, img]], jnp.int32),
        jnp.asarray(rng.randn(1, num_text, 1024), jnp.float32),
        jnp.ones((1, num_text), bool),
    )
    shapes = jax.eval_shape(lambda r: model.init(r, *x), jax.random.PRNGKey(0))["params"]
    prng = np.random.RandomState(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(prng.normal(0, 0.02, s.shape).astype(s.dtype)), shapes
    )

    def fwd(params, *a):
        out = model.apply({"params": params}, *a)
        return out["pred_logits"], out["pred_boxes"], out.get("pred_masks")

    import jax as _jax

    return _jax.jit(fwd), (params,) + x, params, 1


def build_train(model_name: str, img: int, num_text: int, batch: int):
    """The exact train step tools/bench_train.py times (full model, remat)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ape_tpu.engine.train_step import create_train_state, make_train_step
    from ape_tpu.modeling.ape_deta.criterion import (
        DeformableCriterion,
        default_weight_dict,
    )
    from ape_tpu.modeling.build import build_ape_l_d, build_ape_ti

    build = {"ti": build_ape_ti, "l_d": build_ape_l_d}[model_name]
    model = build(
        img_size=img, num_queries=300, window_radius=4,
        use_act_checkpoint=img >= 1024,
    )
    rng = np.random.RandomState(0)
    b = batch
    batch_d = {
        "images": jnp.asarray(rng.randn(b, img, img, 3), jnp.float32),
        "image_sizes": jnp.asarray([[img, img]] * b, jnp.int32),
        "text_features": jnp.asarray(rng.randn(b, num_text, 1024), jnp.float32),
        "text_valid": jnp.ones((b, num_text), bool),
        "targets": {
            "labels": jnp.asarray(rng.randint(0, num_text, (b, 8)), jnp.int32),
            "boxes": jnp.asarray(rng.uniform(0.2, 0.6, (b, 8, 4)), jnp.float32),
            "valid": jnp.asarray(np.broadcast_to(np.arange(8)[None] < 4, (b, 8))),
            "masks": jnp.asarray(
                (rng.rand(b, 8, img // 4, img // 4) > 0.7), jnp.float32
            ),
        },
    }
    shapes = jax.eval_shape(
        lambda r: model.init(
            r, batch_d["images"], batch_d["image_sizes"],
            batch_d["text_features"], batch_d["text_valid"],
        ),
        jax.random.PRNGKey(0),
    )["params"]
    prng = np.random.RandomState(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(prng.normal(0, 0.02, s.shape), s.dtype), shapes
    )
    crit = DeformableCriterion(
        num_classes=num_text, weight_dict=default_weight_dict(),
        num_queries=300, losses=("class", "boxes", "masks"),
    )
    tx = optax.chain(optax.clip_by_global_norm(0.1), optax.adamw(2e-4))
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, crit, tx), donate_argnums=(0,))
    return step, (state, batch_d, jax.random.PRNGKey(0)), params, b


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["ti", "l_d"], default="ti")
    p.add_argument("--mode", choices=["protocol", "full", "train"], default="protocol")
    p.add_argument("--img", type=int, default=1024)
    p.add_argument("--num-text", type=int, default=0, help="default: 80 ti / 1203 l_d")
    p.add_argument("--batch", type=int, default=2, help="train-mode batch")
    p.add_argument("--img-per-s", type=float, default=0.0, help="measured, for MFU")
    p.add_argument("--no-save", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    num_text = args.num_text or (1203 if args.model == "l_d" else 80)
    if args.mode == "train":
        fn, fargs, params, per_call_imgs = build_train(
            args.model, args.img, num_text, args.batch
        )
    else:
        fn, fargs, params, per_call_imgs = build_forward(
            args.model, args.mode, args.img, num_text,
            jnp.bfloat16 if args.mode != "train" else jnp.float32,
        )

    n_params = sum(v.size for v in jax.tree.leaves(params))
    lowered = fn.lower(*fargs)
    cost = lowered.compile().cost_analysis()
    flops = float(cost.get("flops", float("nan")))
    bytes_acc = float(cost.get("bytes accessed", float("nan")))
    flops_per_img = flops / per_call_imgs
    bytes_per_img = bytes_acc / per_call_imgs

    rec = {
        "model": args.model,
        "mode": args.mode,
        "img": args.img,
        "num_text": num_text,
        "params_M": round(n_params / 1e6, 2),
        "gflops_per_img": round(flops_per_img / 1e9, 1),
        "hbm_gb_per_img": round(bytes_per_img / 1e9, 2),
        # chip-physics floors on v5e, per image
        "compute_floor_ms": round(flops_per_img / V5E_PEAK_BF16 * 1e3, 2),
        "hbm_floor_ms": round(bytes_per_img / V5E_HBM_GBPS * 1e3, 2),
    }
    if args.img_per_s > 0:
        rec["img_per_s"] = args.img_per_s
        rec["mfu_pct"] = round(100 * flops_per_img * args.img_per_s / V5E_PEAK_BF16, 2)
        rec["hbm_util_pct"] = round(
            100 * bytes_per_img * args.img_per_s / V5E_HBM_GBPS, 1
        )
    print(json.dumps(rec))

    if not args.no_save:
        path = os.path.join(os.path.dirname(__file__), "..", "FLOPS.json")
        db = {}
        if os.path.exists(path):
            with open(path) as f:
                db = json.load(f)
        key = f"{args.model}-{args.mode}"
        db[key] = rec
        with open(path, "w") as f:
            json.dump(db, f, indent=1, sort_keys=True)
            f.write("\n")


if __name__ == "__main__":
    main()
