"""Benchmark: APE-Ti inference images/sec/chip at 1024^2 on the real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is computed against an A100 reference estimate for APE-Ti
single-image 1024^2 inference (~8 img/s — derived from the reference's
eval_time.sh protocol class; the reference repo publishes no number, see
BASELINE.md). The north star is >= 2x (vs_baseline >= 2.0).
"""

import json
import os
import sys
import time

import numpy as np

A100_EST_IMG_PER_S = 8.0

# allow shrinking for smoke runs
IMG = int(os.environ.get("BENCH_IMG", 1024))
NUM_TEXT = int(os.environ.get("BENCH_TEXT", 80))
ITERS = int(os.environ.get("BENCH_ITERS", 8))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")  # matmul/activation dtype


def main():
    import jax
    import jax.numpy as jnp

    from ape_tpu.modeling.build import build_ape_ti

    # Protocol (default): the reference's own latency protocol
    # (scripts/eval_time.sh:36,76) — segmentation off and FPN scale_factors
    # reduced to (2.0, 1.0, 0.5) with the neck extending to 5 levels — the
    # protocol class the A100 estimate was derived from. BENCH_FULL=1 times
    # the full 5-scale masked model instead (the round-1..3 numbers).
    full = os.environ.get("BENCH_FULL", "0") != "0"
    model = build_ape_ti(
        img_size=IMG, num_queries=900, window_radius=4,
        mask_on=full,
        scale_factors=(4.0, 2.0, 1.0, 0.5) if full else (2.0, 1.0, 0.5),
        dtype=jnp.dtype(DTYPE),
    )
    rng = np.random.RandomState(0)
    # headline metric stays single-image (matches the A100 estimate's
    # protocol); BENCH_BATCH>1 measures batched throughput for PERF.md
    # (the reference's own eval_time.sh times at bs 8)
    bsz = int(os.environ.get("BENCH_BATCH", 1))
    images = jnp.asarray(rng.randn(bsz, IMG, IMG, 3), jnp.float32)
    image_sizes = jnp.asarray([[IMG, IMG]] * bsz, jnp.int32)
    text = jnp.asarray(rng.randn(bsz, NUM_TEXT, 1024), jnp.float32)
    text_valid = jnp.ones((bsz, NUM_TEXT), bool)

    # synthesize params from shapes only: model.init would compile the whole
    # forward a second time through the slow remote-compile tunnel
    shapes = jax.eval_shape(
        lambda r: model.init(r, images, image_sizes, text, text_valid),
        jax.random.PRNGKey(0),
    )["params"]
    prng = np.random.RandomState(0)

    def synth(s):
        return jnp.asarray(prng.normal(0, 0.02, s.shape).astype(s.dtype))

    params = jax.tree.map(synth, shapes)

    # Realistic offset magnitudes (default ON): N(0,0.02) synth makes every
    # sampling offset near-zero, which lets the kernels' inactive-tap skip
    # make MSDA look ~2x faster than it is under trained weights (PERF.md
    # "Realistic-offset pair costs"). Re-arm the sampling_offsets biases with
    # the reference's directional ring init (deformable_transformer init:
    # head h at angle 2*pi*h/H, point p at radius p+1 — multi-pixel taps),
    # scaled by BENCH_OFF_SCALE. BENCH_REALISTIC=0 restores the old behavior.
    if os.environ.get("BENCH_REALISTIC", "1") != "0":
        from ape_tpu.layers.msda_module import _offset_bias_init

        off_scale = float(os.environ.get("BENCH_OFF_SCALE", "1.0"))

        def rearm(path, leaf):
            keys = [getattr(p, "key", "") for p in path]
            if "sampling_offsets" in keys and keys[-1] == "bias":
                h_l_p = leaf.shape[0] // 2
                # layer dims vary (decoder L=5, encoder L=5); ring init only
                # needs H*L*P*2 == bias size with H=8, P=4
                levels = h_l_p // (8 * 4)
                return jnp.asarray(
                    _offset_bias_init(8, levels, 4) * off_scale, leaf.dtype
                )
            return leaf

        params = jax.tree_util.tree_map_with_path(rearm, params)

    @jax.jit
    def fwd(params, images, image_sizes, text, text_valid):
        out = model.apply({"params": params}, images, image_sizes, text, text_valid)
        return out["pred_logits"], out["pred_boxes"], out.get("pred_masks")

    # warm up / compile (incl. the eager perturbation add used in the loop)
    out = fwd(params, images, image_sizes, text, text_valid)
    jax.tree.map(lambda x: np.asarray(x[..., :1]), out)
    np.asarray((images + 0.5)[..., :1, :1])

    # timed: vary input each call (the remote-compile tunnel caches identical
    # dispatches), fetch a slice at the end to force completion
    t0 = time.perf_counter()
    for k in range(ITERS):
        out = fwd(params, images + float(k) * 1e-3, image_sizes, text, text_valid)
    np.asarray(out[0][..., :1])
    dt = (time.perf_counter() - t0) / ITERS
    img_per_s = bsz / dt

    tag = f" batch {bsz}" if bsz > 1 else ""
    tag += " (full 5-scale+mask)" if full else ""
    realistic = os.environ.get("BENCH_REALISTIC", "1") != "0"
    print(
        json.dumps(
            {
                "metric": f"APE-Ti inference images/sec/chip @ {IMG}x{IMG}{tag}",
                "value": round(img_per_s, 3),
                "unit": "img/s",
                "vs_baseline": round(img_per_s / A100_EST_IMG_PER_S, 3),
                # protocol provenance (round 4): default now matches the
                # reference's own latency protocol (eval_time.sh: segm off,
                # reduced FPN scales) at realistic multi-pixel offsets;
                # rounds 1-3 timed the full 5-scale masked model at tiny
                # synthetic offsets (5.1 img/s realistic / 9.5 tiny under
                # this round's kernels) — see PERF.md "Round-4 headline"
                "protocol": (
                    ("eval_time(segm-off,fpn-2_1_0.5)" if not full else "full-5scale+mask")
                    + ("+realistic-offsets" if realistic else "+tiny-offsets")
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
