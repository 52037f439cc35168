"""Stage-by-stage diff driver for the full-model parity harness.

Run: JAX_PLATFORMS=cpu python tests/parity_debug.py [--fusion]
Prints per-stage max-abs-diff between the reference torch forward and ours.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def _enable_xla_cache():
    import jax

    # sitecustomize force-initializes the axon TPU backend; re-point at CPU
    # (same dance as tests/conftest.py) — strict fp32 parity needs CPU math
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    try:
        jax._src.xla_bridge._clear_backends()
    except Exception:
        pass
    assert jax.default_backend() == "cpu", jax.default_backend()

    d = os.path.expanduser("~/.cache/ape_tpu_xla")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main(vl_fusion=False, padded=False):
    import torch

    from tests.parity_harness import (
        DIMS,
        build_our_model,
        build_ref_model,
        convert_ref_to_ours,
        make_image,
    )

    model, text = build_ref_model(vl_fusion=vl_fusion)
    img, ours_img, sizes = make_image(w=192 if padded else None)

    # ---- torch side with hooks ----
    rec = {}

    def hook(name):
        def fn(mod, inp, out):
            rec[name] = out

        return fn

    model.backbone.register_forward_hook(hook("backbone"))
    model.neck.register_forward_hook(hook("neck"))
    model.transformer.encoder.register_forward_hook(hook("encoder"))
    model.transformer.register_forward_hook(hook("transformer"))
    with torch.no_grad():
        det, _, _ = model(
            [{"image": torch.from_numpy(img), "height": img.shape[1], "width": img.shape[2]}],
            do_postprocess=False,
        )
    st = model._rec_stacks

    # ---- our side with captured intermediates ----
    import jax
    import jax.numpy as jnp

    _enable_xla_cache()

    ours = build_our_model(vl_fusion=vl_fusion)
    tf = jnp.asarray(text)[None]
    tv = jnp.ones((1, text.shape[0]), bool)
    args = (jnp.asarray(ours_img), jnp.asarray(sizes), tf, tv)
    params = ours.init(jax.random.PRNGKey(0), *args)["params"]
    conv = convert_ref_to_ours(model, params)
    out, state = ours.apply(
        {"params": conv}, *args, align_on_fused=False,
        capture_intermediates=True, mutable=["intermediates"]
    )
    inter = state["intermediates"]

    def t2n(x):
        return x.detach().numpy()

    def diff(name, ref, got, nchw_to_nhwc=False):
        r = np.asarray(ref)
        g = np.asarray(got)
        if nchw_to_nhwc:
            r = np.transpose(r, (0, 2, 3, 1))
        if r.shape != g.shape:
            print(f"{name}: SHAPE ref{r.shape} vs ours{g.shape}")
            return
        d = np.abs(r - g)
        print(f"{name}: maxdiff {d.max():.3e}  scale {np.abs(r).max():.3e}")

    # backbone: ref dict p2..p6 NCHW
    ref_bb = rec["backbone"]
    our_bb = inter["backbone"]["__call__"][0]
    for k in ["p2", "p3", "p4", "p5", "p6"]:
        diff(f"backbone.{k}", t2n(ref_bb[k]), our_bb[k], nchw_to_nhwc=True)

    ref_neck = rec["neck"]  # list of 5 NCHW
    our_neck = inter["neck"]["__call__"][0]
    for i, k in enumerate(["p2", "p3", "p4", "p5", "p6"]):
        diff(f"neck.{k}", t2n(ref_neck[i]), our_neck[k], nchw_to_nhwc=True)

    # encoder memory: ref encoder returns (memory, query_l)
    ref_mem = t2n(rec["encoder"][0])
    our_tr = inter["transformer"]["__call__"][0]
    diff("encoder.memory", ref_mem, our_tr["memory"])

    # transformer tuple: (inter_states, init_reference, inter_references,
    #   enc_outputs_class, enc_outputs_coord_unact, anchors, memory, query_l)
    tr = rec["transformer"]
    diff("enc_logits", t2n(tr[3])[..., 0], our_tr["enc_logits"])
    diff("enc_coords", t2n(tr[4].sigmoid()), our_tr["enc_coords"])
    diff("init_reference", t2n(tr[1]), our_tr["init_reference"])
    diff("inter_states[-1]", t2n(tr[0][-1]), our_tr["inter_states"][-1])

    for i in range(len(st["logits"])):
        diff(f"pred_logits[{i}]", st["logits"][i],
             out["aux_outputs"][i]["pred_logits"] if i < len(st["logits"]) - 1
             else out["pred_logits"])
        diff(f"pred_boxes[{i}]", st["boxes"][i],
             out["aux_outputs"][i]["pred_boxes"] if i < len(st["boxes"]) - 1
             else out["pred_boxes"])
    diff("pred_masks", st["masks"][-1], out["pred_masks"])


if __name__ == "__main__":
    main(vl_fusion="--fusion" in sys.argv, padded="--padded" in sys.argv)
