"""END-TO-END model parity vs the reference torch stack (VERDICT round-2 #1).

The reference DeformableDETRSegmVL + DeformableDetrTransformerVL + EVA-02 SFP
backbone run on CPU with pytorch_attn=True (the reference's own numeric
fallback), at tiny-but-structurally-complete dims; its random-init state dict
flows through checkpoint/convert.py into our APEDeta, and the raw per-layer
head outputs are diffed through the WHOLE stack: backbone -> neck -> pos
embeds -> encoder (MSDA) -> two-stage DETA NMS select -> decoder (box
refinement) -> VisionLanguageAlign heads -> MaskDINO mask head.
"""

import numpy as np
import pytest

# heavy tier (round 5): torch-oracle RELEASE gate — runs in `-m heavy`
# alongside the e2e train loops. The slow tier keeps the pure-JAX
# kernel/model guards that protect day-to-day edits; these parity
# suites re-run whenever modeling code ships.
pytestmark = [pytest.mark.slow, pytest.mark.heavy]

from tests.parity_harness import (
    DIMS,
    build_our_model,
    build_ref_model,
    convert_ref_to_ours,
    make_image,
)


def _run_both(vl_fusion=False, offset_scale=1.0, h=None, w=None, proposal_ambiguous=0):
    import torch

    import jax
    import jax.numpy as jnp

    ref, text = build_ref_model(
        vl_fusion=vl_fusion,
        offset_scale=offset_scale,
        proposal_ambiguous=proposal_ambiguous,
    )
    img, ours_img, sizes = make_image(h=h, w=w)
    with torch.no_grad():
        det, _, _ = ref(
            [{"image": torch.from_numpy(img), "height": img.shape[1], "width": img.shape[2]}],
            do_postprocess=False,
        )
    stacks = ref._rec_stacks

    ours = build_our_model(vl_fusion=vl_fusion, proposal_ambiguous=proposal_ambiguous)
    tf = jnp.asarray(text)[None]
    tv = jnp.ones((1, text.shape[0]), bool)
    args = (jnp.asarray(ours_img), jnp.asarray(sizes), tf, tv)
    params = ours.init(jax.random.PRNGKey(0), *args)["params"]
    conv = convert_ref_to_ours(ref, params)
    # name prompts align on the ORIGINAL text features (segm_vl.py:445-448)
    out = ours.apply({"params": conv}, *args, align_on_fused=False)
    return stacks, det, out


def _assert_close(name, ref, got, tol=1e-4):
    r = np.asarray(ref)
    g = np.asarray(got)
    assert r.shape == g.shape, (name, r.shape, g.shape)
    scale = max(np.abs(r).max(), 1.0)
    d = np.abs(r - g).max()
    assert d <= tol * scale, f"{name}: maxdiff {d:.3e} vs scale {scale:.3e}"


@pytest.mark.parametrize("vl_fusion", [False, True])
def test_full_model_output_parity(vl_fusion):
    stacks, det, out = _run_both(vl_fusion=vl_fusion)
    layers = len(stacks["logits"])
    for i in range(layers):
        ours_l = out["pred_logits"] if i == layers - 1 else out["aux_outputs"][i]["pred_logits"]
        ours_b = out["pred_boxes"] if i == layers - 1 else out["aux_outputs"][i]["pred_boxes"]
        _assert_close(f"pred_logits[{i}]", stacks["logits"][i], ours_l)
        _assert_close(f"pred_boxes[{i}]", stacks["boxes"][i], ours_b)
    _assert_close("pred_masks", stacks["masks"][-1], out["pred_masks"], tol=2e-4)


def test_full_model_parity_proposal_ambiguous():
    """proposal_ambiguous=1 (set by every reference flagship config): the
    per-proposal argmax over duplicated enc-stage heads changes which class
    logit AND coords feed the first-stage select; the head copies are
    perturbed post-init so the argmax varies (deformable_detr.py:188-201,
    deformable_transformer_vl.py:508-534)."""
    stacks, det, out = _run_both(proposal_ambiguous=1)
    _assert_close("pred_logits", stacks["logits"][-1], out["pred_logits"])
    _assert_close("pred_boxes", stacks["boxes"][-1], out["pred_boxes"])


def test_full_model_parity_padded_image():
    """Non-square valid region: valid-ratio plumbing through reference points,
    proposals, and the window-MSDA grid corrections."""
    stacks, det, out = _run_both(h=DIMS["img"], w=192)
    layers = len(stacks["logits"])
    _assert_close("pred_logits", stacks["logits"][-1], out["pred_logits"])
    _assert_close("pred_boxes", stacks["boxes"][-1], out["pred_boxes"])


def test_realistic_offsets_and_window_clamp():
    """Scale the MSDA offset biases to realistic magnitudes (several cells) and
    quantify the window-clamp deviation (VERDICT round-2 weak #3): at
    window_radius=16 nothing clamps and outputs still match the reference's
    unbounded sampling; at the production radius 4 the clamp fraction and the
    resulting output delta are measured and reported."""
    import torch

    import jax
    import jax.numpy as jnp

    from ape_tpu.ops.msda_dispatch import window_clamp_fraction

    scale = 3.0
    ref, text = build_ref_model(offset_scale=scale)
    img, ours_img, sizes = make_image()
    with torch.no_grad():
        ref([
            {"image": torch.from_numpy(img), "height": img.shape[1], "width": img.shape[2]}
        ], do_postprocess=False)
    stacks = ref._rec_stacks

    tf = jnp.asarray(text)[None]
    tv = jnp.ones((1, text.shape[0]), bool)
    args = (jnp.asarray(ours_img), jnp.asarray(sizes), tf, tv)
    outs = {}
    for radius in (16, 4):
        ours = build_our_model(window_radius=radius)
        params = ours.init(jax.random.PRNGKey(0), *args)["params"]
        conv = convert_ref_to_ours(ref, params)
        outs[radius] = ours.apply({"params": conv}, *args, align_on_fused=False)

    # unclamped (radius 16) matches the reference at 3x offsets
    _assert_close("pred_logits@3x", stacks["logits"][-1], outs[16]["pred_logits"])
    _assert_close("pred_boxes@3x", stacks["boxes"][-1], outs[16]["pred_boxes"])

    # clamp-fraction of the actual scaled offset biases at production radius 4
    # (kernel offsets are bias + tiny random-init perturbations)
    biases = [
        np.asarray(v) for k, v in ref.state_dict().items()
        if "encoder" in k and "sampling_offsets.bias" in k
    ]
    frac = np.mean([window_clamp_fraction(b, radius=4) for b in biases])
    d_logits = float(
        np.abs(np.asarray(outs[4]["pred_logits"]) - np.asarray(outs[16]["pred_logits"])).max()
    )
    d_boxes = float(
        np.abs(np.asarray(outs[4]["pred_boxes"]) - np.asarray(outs[16]["pred_boxes"])).max()
    )
    print(
        f"\nwindow-clamp @3x offsets: bias clamp fraction {frac:.3f}, "
        f"output delta logits {d_logits:.4f} boxes {d_boxes:.4f}"
    )
    # the measurement is the deliverable; sanity-bound it so regressions show
    assert frac < 0.5
    assert np.isfinite(d_logits) and np.isfinite(d_boxes)
