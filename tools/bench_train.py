#!/usr/bin/env python
"""Training throughput on the real chip (fwd + bwd + AdamW), img/s + vs_baseline.

Protocol: batch BENCH_BATCH (default 2, matching the reference's 2 img/GPU —
flagship config trains global batch 16 on 8 GPUs x iter_size 4) at
BENCH_IMG^2 (default 1024, the reference's LSJ resolution), full 5-scale
masked model, realistic ring-init sampling offsets (BENCH_REALISTIC=0
restores the tiny synthetic offsets the round-1..4 numbers used).

The A100 training estimate is derived in BASELINE.md ("Derivation of the
A100 estimates"): the full-model inference estimate at the standard ~3x
training/inference FLOP ratio. The reference repo publishes no
training-throughput number (BASELINE.md).

Records the result into RESULTS.json (key "ti-train") so bench.py can attach
it to the headline JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

IMG = int(os.environ.get("BENCH_IMG", 1024))
BATCH = int(os.environ.get("BENCH_BATCH", 2))
ITERS = int(os.environ.get("BENCH_ITERS", 3))
# Matmul/activation compute dtype. The reference trains fp16 AMP (COCO 12ep
# base config amp.enabled, train_net.py grad scaler); bf16 compute with f32
# params/optimizer is the TPU equivalent. float32 kept selectable for A/B.
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
# full-model A100 inference estimate / 3 per model (see BASELINE.md derivation)
A100_TRAIN_EST = {"ti": 1.4, "l_d": 0.19}
A100_TRAIN_EST_IMG_S = A100_TRAIN_EST[os.environ.get("BENCH_MODEL", "ti")]


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from ape_tpu.modeling.build import build_ape_l_d, build_ape_ti
    from ape_tpu.modeling.ape_deta.criterion import DeformableCriterion, default_weight_dict
    from ape_tpu.engine.train_step import create_train_state, make_train_step
    from ape_tpu.utils.bench_utils import rearm_offsets, synth_params

    model_name = os.environ.get("BENCH_MODEL", "ti")
    build = {"ti": build_ape_ti, "l_d": build_ape_l_d}[model_name]
    model = build(
        img_size=IMG, num_queries=300, window_radius=4,
        use_act_checkpoint=IMG >= 1024,  # 1024^2 training OOMs HBM without remat
        dtype=jnp.dtype(DTYPE),
    )
    rng = np.random.RandomState(0)
    # ti trains with the COCO-class 80-text vocabulary; the flagship trains
    # against the LVIS 1203-text bank through the VL-fusion encoder
    nt = int(os.environ.get("BENCH_TEXT", 1203 if model_name == "l_d" else 80))
    b = BATCH
    batch = {
        "images": jnp.asarray(rng.randn(b, IMG, IMG, 3), jnp.float32),
        "image_sizes": jnp.asarray([[IMG, IMG]] * b, jnp.int32),
        "text_features": jnp.asarray(rng.randn(b, nt, 1024), jnp.float32),
        "text_valid": jnp.ones((b, nt), bool),
        "targets": {
            "labels": jnp.asarray(rng.randint(0, nt, (b, 8)), jnp.int32),
            "boxes": jnp.asarray(rng.uniform(0.2, 0.6, (b, 8, 4)), jnp.float32),
            "valid": jnp.asarray(np.broadcast_to(np.arange(8)[None] < 4, (b, 8))),
            "masks": jnp.asarray((rng.rand(b, 8, IMG // 4, IMG // 4) > 0.7), jnp.float32),
        },
    }
    params = synth_params(
        model,
        (batch["images"], batch["image_sizes"], batch["text_features"], batch["text_valid"]),
    )
    realistic = os.environ.get("BENCH_REALISTIC", "1") != "0"
    if realistic:
        params = rearm_offsets(
            params, off_scale=float(os.environ.get("BENCH_OFF_SCALE", "1.0"))
        )
    crit = DeformableCriterion(num_classes=nt, weight_dict=default_weight_dict(),
                               num_queries=300, losses=("class", "boxes", "masks"))
    from ape_tpu.utils.bench_utils import aot_compile_with_cost, mfu_fields

    tx = optax.chain(optax.clip_by_global_norm(0.1), optax.adamw(2e-4))
    state = create_train_state(params, tx)
    key = jax.random.PRNGKey(0)
    # BENCH_ITER_SIZE>1 exercises the reference's grad-accumulation recipe
    # (flagship trains iter_size=4); the batch is replicated per microstep so
    # img/s counts BATCH * ITER_SIZE images per step
    iter_size = int(os.environ.get("BENCH_ITER_SIZE", 1))
    if iter_size > 1:
        # leading batch dim must be iter_size * micro (train_step.py contract)
        batch = jax.tree.map(
            lambda x: jnp.concatenate([x] * iter_size, axis=0), batch
        )
    step, cost = aot_compile_with_cost(
        make_train_step(model, crit, tx, iter_size=iter_size),
        state, batch, key, donate_argnums=(0,),
    )
    state, m = step(state, batch, key)
    print("first step loss:", float(m["total_loss"]), flush=True)
    t0 = time.perf_counter()
    for k in range(ITERS):
        batch["images"] = batch["images"] + 1e-4
        state, m = step(state, batch, key)
    _ = float(m["total_loss"])
    dt = (time.perf_counter() - t0) / ITERS
    img_s = BATCH * iter_size / dt
    line = {
        "metric": f"{'APE-L_D' if model_name == 'l_d' else 'APE-Ti'} training "
        f"images/sec/chip @ {IMG}x{IMG} batch {BATCH}"
        + (f" x iter_size {iter_size}" if iter_size > 1 else ""),
        "value": round(img_s, 3), "unit": "img/s",
        "s_per_step": round(dt, 3),
        "vs_baseline": round(img_s / A100_TRAIN_EST_IMG_S, 3),
        "protocol": "train-full-5scale+mask"
        + ("+realistic-offsets" if realistic else "+tiny-offsets")
        + f"+{DTYPE}",
    }
    line.update(mfu_fields(cost, img_s, batch=BATCH * iter_size))
    print(json.dumps(line))
    if IMG == 1024 and realistic and iter_size == 1:
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
            import bench

            bench._record(
                f"{model_name}-train" + ("" if BATCH == 2 else f"-b{BATCH}"),
                {
                    "img_per_s": round(img_s, 3),
                    "vs_baseline": round(img_s / A100_TRAIN_EST_IMG_S, 3),
                    "protocol": line["protocol"],
                    "baseline_img_per_s": A100_TRAIN_EST_IMG_S,
                    **mfu_fields(cost, img_s, batch=BATCH * iter_size),
                },
            )
        except Exception as e:
            print(f"(RESULTS.json record skipped: {e})", file=sys.stderr)


if __name__ == "__main__":
    main()
