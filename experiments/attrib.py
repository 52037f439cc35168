"""Forward-pass attribution at APE-Ti bench scale on the real TPU.

Times, as separate jits with synthesized params:
  * full model forward (bench protocol)
  * backbone + neck
  * encoder stack (6 layers, window MSDA + FFN at 87k tokens)
  * DETA first-stage select (tiled NMS)
remainder ~= decoder + per-layer heads + mask decoder.

    python experiments/attrib.py
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


def timed(fn, *args, chains=(1, 3), reps=3):
    """Chained-slope timing: fn applied n times inside ONE jit, scalar out.

    fn must accept (x, *rest) and the chain perturbs x by an in-graph scalar,
    so nothing re-ships through the tunnel between applications.
    """
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


def synth_params(model, init_fn):
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))["params"]
    prng = np.random.RandomState(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(prng.normal(0, 0.02, s.shape).astype(s.dtype)), shapes
    )
    if os.environ.get("ATTRIB_REALISTIC", "1") != "0":
        # bench.py's realistic-offset rearm (directional ring init biases)
        from ape_tpu.layers.msda_module import _offset_bias_init

        def rearm(path, leaf):
            keys = [getattr(p, "key", "") for p in path]
            if "sampling_offsets" in keys and keys[-1] == "bias":
                levels = leaf.shape[0] // 2 // (8 * 4)
                return jnp.asarray(_offset_bias_init(8, levels, 4), leaf.dtype)
            return leaf

        params = jax.tree_util.tree_map_with_path(rearm, params)
    return params


PARTS = set(os.environ.get("ATTRIB_PARTS", "full,bb,enc,sel").split(","))


def main():
    from ape_tpu.modeling.build import build_ape_ti

    proto = os.environ.get("ATTRIB_PROTOCOL", "0") != "0"
    model = build_ape_ti(
        img_size=IMG, num_queries=900, window_radius=4, dtype=DTYPE,
        mask_on=not proto,
        scale_factors=(2.0, 1.0, 0.5) if proto else (4.0, 2.0, 1.0, 0.5),
    )
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, IMG, IMG, 3), jnp.float32)
    sizes = jnp.asarray([[IMG, IMG]], jnp.int32)
    text = jnp.asarray(rng.randn(1, 80, 1024), jnp.float32)
    tvalid = jnp.ones((1, 80), bool)

    params = synth_params(
        model, lambda r: model.init(r, images, sizes, text, tvalid)
    )

    def full(images, params):
        out = model.apply({"params": params}, images, sizes, text, tvalid)
        return out["pred_logits"], out["pred_boxes"], out.get("pred_masks")

    def bb(images, params):
        f = model.backbone.apply({"params": params["backbone"]}, images, True)
        if model.neck is not None:
            f = model.neck.apply({"params": params["neck"]}, f)
        return f

    t_full = t_bb = t_enc = t_sel = float("nan")
    # full model: bench-style repeat with on-device perturbation (chaining the
    # whole model n times exceeds the remote-compile budget)
    jfull = jax.jit(full)
    if "full" not in PARTS:
        jfull = None
    out = jfull(images, params) if jfull else None
    if jfull:
        np.asarray(out[0][..., :1])
        np.asarray((images + 0.5)[..., :1, :1])  # pre-compile the eager perturb add
        t0 = time.perf_counter()
        for k in range(6):
            out = jfull(images + float(k) * 1e-4, params)
        np.asarray(out[0][..., :1])
        t_full = (time.perf_counter() - t0) / 6

    if "bb" in PARTS:
        t_bb = timed(bb, images, params, chains=(1, 4))

    # ---- encoder stack at production shapes ----
    feats = jax.jit(bb)(images, params)
    mlf = [feats[f] for f in model.in_features]
    level_shapes = tuple((f.shape[1], f.shape[2]) for f in mlf)
    S = sum(h * w for h, w in level_shapes)
    C = model.embed_dim
    enc = model.transformer.encoder

    from ape_tpu.modeling.ape_deta.transformer import (
        encoder_grid_corrections,
        encoder_reference_points,
    )

    x = jnp.asarray(rng.randn(1, S, C), DTYPE)
    pos = jnp.asarray(rng.randn(1, S, C), DTYPE)
    vmask = jnp.ones((1, S), bool)
    vr = jnp.ones((1, len(level_shapes), 2))
    refp = encoder_reference_points(level_shapes, vr)
    gcorr = encoder_grid_corrections(level_shapes, vr)

    # ONE layer, scaled by num_layers: chaining the 6-layer stack exceeds the
    # remote-compile budget (each layer instance compiles 25 pair kernels)
    n_enc_layers = enc.num_layers
    enc = enc.copy(num_layers=1)

    enc_params = synth_params(
        enc,
        lambda r: enc.init(
            r, x, pos, vmask, None, None, level_shapes, refp, gcorr
        ),
    )

    def enc_fwd(x, p):
        out, _ = enc.apply(
            {"params": p}, x, pos, vmask, None, None, level_shapes, refp, gcorr
        )
        return out

    if "enc" in PARTS:
        t_enc = timed(enc_fwd, x, enc_params, chains=(1, 3)) * n_enc_layers

    # ---- decoder stack at production shapes ----
    if "dec" in PARTS:
        dec = model.transformer.decoder
        K = model.num_queries
        q0 = jnp.asarray(rng.randn(1, K, C), DTYPE)
        qpos = jnp.asarray(rng.randn(1, K, C), DTYPE)
        mem = jnp.asarray(rng.randn(1, S, C), DTYPE)
        refs = jnp.asarray(rng.rand(1, K, 4), jnp.float32)
        dec_params = synth_params(
            dec,
            lambda r: dec.init(r, q0, qpos, mem, vmask, level_shapes, refs, vr),
        )

        def dec_fwd(mem, p):
            out = dec.apply(
                {"params": p}, q0, qpos, mem, vmask, level_shapes, refs, vr
            )
            return out[0]

        t_dec = timed(dec_fwd, mem, dec_params, chains=(1, 3))
        print(f"decoder (6 layers): {t_dec*1e3:8.1f} ms", flush=True)

    # ---- DETA first-stage select ----
    from ape_tpu.modeling.ape_deta.transformer import deta_first_stage_select

    logits = jnp.asarray(rng.randn(1, S), jnp.float32)
    boxes = jnp.asarray(rng.randn(1, S, 4) * 0.1, jnp.float32)
    valid = jnp.ones((1, S), bool)

    def select(logits, boxes):
        return deta_first_stage_select(
            logits, boxes, valid, level_shapes, topk=900
        )

    if "sel" in PARTS:
        t_sel = timed(select, logits, boxes)

    print(f"full forward      : {t_full*1e3:8.1f} ms   ({1.0/t_full:.2f} img/s)")
    print(f"backbone+neck     : {t_bb*1e3:8.1f} ms")
    print(f"encoder (6 layers): {t_enc*1e3:8.1f} ms")
    print(f"first-stage select: {t_sel*1e3:8.1f} ms")
    rem = t_full - t_bb - t_enc - t_sel
    print(f"remainder (decoder+heads+maskdec): {rem*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
