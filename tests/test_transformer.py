"""Deformable transformer tests: shapes, finiteness, first-stage select semantics."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from ape_tpu.modeling.ape_deta.transformer import (
    DeformableDetrTransformer,
    DeformableTransformerDecoder,
    DeformableTransformerEncoder,
    deta_first_stage_select,
    encoder_reference_points,
    gen_output_proposals,
    valid_ratios_from_masks,
)
from ape_tpu.layers import StillClassifier
import flax.linen as nn


SS = ((8, 8), (4, 4), (2, 2))
S = sum(h * w for h, w in SS)
C = 32


class TinyModel(nn.Module):
    vl: bool = False

    @nn.compact
    def __call__(self, feats, masks, poss, text=None, text_valid=None):
        tr = DeformableDetrTransformer(
            encoder=DeformableTransformerEncoder(
                embed_dim=C,
                num_heads=2,
                feedforward_dim=64,
                num_layers=2,
                num_feature_levels=3,
                window_radius=2,
                vl_fusion=self.vl,
                vl_embed_dim=32,
                vl_num_heads=2,
                embed_dim_language=16,
            ),
            decoder=DeformableTransformerDecoder(
                embed_dim=C,
                num_heads=2,
                feedforward_dim=64,
                num_layers=2,
                num_feature_levels=3,
            ),
            num_feature_levels=3,
            two_stage_num_proposals=12,
            pre_nms_topk=20,
        )
        head = StillClassifier(name="enc_class_head")
        return tr(feats, masks, poss, text, text_valid, enc_class_head=head)


def make_inputs(rng, b=2, vl=False):
    feats = [jnp.asarray(rng.randn(b, h, w, C).astype(np.float32)) for h, w in SS]
    masks = []
    for h, w in SS:
        m = np.zeros((b, h, w), bool)
        m[0] = True
        m[1, : max(1, h // 2), : max(1, w * 3 // 4)] = True  # padded image
        masks.append(jnp.asarray(m))
    poss = [jnp.asarray(rng.randn(b, h, w, C).astype(np.float32)) for h, w in SS]
    text = jnp.asarray(rng.randn(b, 5, 16).astype(np.float32)) if vl else None
    text_valid = jnp.asarray(np.ones((b, 5), bool)) if vl else None
    return feats, masks, poss, text, text_valid


def test_transformer_forward_shapes(rng):
    model = TinyModel()
    feats, masks, poss, *_ = make_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), feats, masks, poss)
    out = model.apply(params, feats, masks, poss)
    assert out["inter_states"].shape == (2, 2, 12, C)
    assert out["output_coords"].shape == (2, 2, 12, 4)
    assert out["init_reference"].shape == (2, 12, 4)
    assert out["enc_logits"].shape == (2, S)
    assert out["memory"].shape == (2, S, C)
    coords = np.asarray(out["output_coords"])
    assert np.isfinite(coords).all() and (coords >= 0).all() and (coords <= 1).all()
    assert np.isfinite(np.asarray(out["memory"])).all()


def test_transformer_vl_fusion(rng):
    model = TinyModel(vl=True)
    feats, masks, poss, text, text_valid = make_inputs(rng, vl=True)
    params = model.init(jax.random.PRNGKey(0), feats, masks, poss, text, text_valid)
    out = model.apply(params, feats, masks, poss, text, text_valid)
    assert out["text"].shape == (2, 5, 16)
    assert np.isfinite(np.asarray(out["text"])).all()


@pytest.mark.heavy
def test_vl_fusion_remat_grads_match(rng):
    """use_act_checkpoint wraps the VL fusion block in nn.remat (round 5 —
    the flagship OOMed HBM with six layers of bi-attention temps live).
    Gradients through the remat encoder must equal the plain encoder's.
    Heavy tier alongside test_remat_policy_grads_match (same rationale:
    training-only remat path, trace-heavy)."""
    from ape_tpu.ops.msda import level_start_index

    def build(remat):
        return DeformableTransformerEncoder(
            embed_dim=C, num_heads=2, feedforward_dim=32, num_layers=2,
            num_feature_levels=3, window_radius=2, vl_fusion=True,
            vl_embed_dim=32, vl_num_heads=2, embed_dim_language=16,
            use_act_checkpoint=remat,
        )

    x = jnp.asarray(rng.randn(1, S, C).astype(np.float32))
    pos = jnp.asarray(rng.randn(1, S, C).astype(np.float32))
    valid = jnp.ones((1, S), bool)
    text = jnp.asarray(rng.randn(1, 5, 16).astype(np.float32))
    tvalid = jnp.ones((1, 5), bool)
    vr = jnp.ones((1, 3, 2))
    refp = encoder_reference_points(SS, vr)
    from ape_tpu.modeling.ape_deta.transformer import encoder_grid_corrections

    gcorr = encoder_grid_corrections(SS, vr)

    params = build(False).init(
        jax.random.PRNGKey(0), x, pos, valid, text, tvalid, SS, refp, gcorr
    )

    def loss(p, remat):
        out_x, out_t = build(remat).apply(p, x, pos, valid, text, tvalid, SS, refp, gcorr)
        return jnp.sum(out_x**2) + jnp.sum(out_t**2)

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_remat = jax.grad(lambda p: loss(p, True))(params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_plain),
        jax.tree_util.tree_leaves_with_path(g_remat),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg="/".join(str(getattr(k, "key", k)) for k in pa),
        )


def test_valid_ratios(rng):
    masks = [jnp.asarray(np.ones((1, h, w), bool)) for h, w in SS]
    vr = valid_ratios_from_masks(masks)
    np.testing.assert_allclose(np.asarray(vr), 1.0)
    refs = encoder_reference_points(SS, vr)
    assert refs.shape == (1, S, 3, 2)
    r = np.asarray(refs)
    assert (r > 0).all() and (r < 1).all()
    # level-0 query 0 center = 0.5/8
    np.testing.assert_allclose(r[0, 0, 0], [0.5 / 8, 0.5 / 8], rtol=1e-6)


def test_gen_output_proposals_masks_invalid(rng):
    mem = jnp.asarray(rng.randn(1, S, C).astype(np.float32))
    valid = np.ones((1, S), bool)
    valid[0, 3:10] = False
    vr = jnp.ones((1, 3, 2))
    out_mem, unact, ok = gen_output_proposals(mem, jnp.asarray(valid), SS, vr)
    ok = np.asarray(ok)
    assert not ok[0, 3:10].any()
    # border cells (center < 0.01 or > 0.99) also invalid: corner of level 0
    assert np.isinf(np.asarray(unact))[0, 3].all()
    assert np.asarray(out_mem)[0, 3].sum() == 0


def test_deta_first_stage_select_matches_flat_nms(rng):
    """The per-level vmapped NMS (round 5) must reproduce the flat
    class-offset batched NMS selection exactly (levels never suppress each
    other, so the two formulations are the same greedy problem)."""
    from ape_tpu.ops.box_ops import box_cxcywh_to_xyxy
    from ape_tpu.ops.nms import NEG_INF, batched_nms_mask
    from ape_tpu.ops.msda import level_start_index

    b, topk, pre_nms_topk, nms_thresh = 2, 6, 10, 0.9
    logits = jnp.asarray(rng.randn(b, S).astype(np.float32))
    unact = jnp.asarray(rng.randn(b, S, 4).astype(np.float32))
    ok = jnp.ones((b, S), bool)
    level_ids = np.concatenate([np.full(h * w, i) for i, (h, w) in enumerate(SS)])
    starts, _ = level_start_index(SS)

    def flat_reference(logit, bx_unact):
        score = jax.nn.sigmoid(logit)
        boxes = jnp.clip(box_cxcywh_to_xyxy(jax.nn.sigmoid(bx_unact)), 0.0, 1.0)
        cand_idx = []
        for lvl, (h, w) in enumerate(SS):
            k = min(pre_nms_topk, h * w)
            lvl_score = jax.lax.dynamic_slice_in_dim(score, starts[lvl], h * w)
            _, idx = jax.lax.top_k(lvl_score, k)
            cand_idx.append(idx + starts[lvl])
        cand_idx = jnp.concatenate(cand_idx)
        c_boxes, c_score = boxes[cand_idx], score[cand_idx]
        c_level = jnp.asarray(level_ids)[cand_idx]
        kept = batched_nms_mask(c_boxes, c_score, c_level, nms_thresh)
        order = jnp.argsort(-jnp.where(kept, c_score, NEG_INF))
        lvl_sorted, kept_sorted = c_level[order], kept[order]
        onehot = jax.nn.one_hot(lvl_sorted, len(SS), dtype=jnp.int32)
        rank = jnp.cumsum(onehot * kept_sorted[:, None].astype(jnp.int32), 0)
        my_rank = jnp.take_along_axis(rank, lvl_sorted[:, None], 1)[:, 0]
        balanced_sorted = kept_sorted & (my_rank <= topk // len(SS))
        balanced = jnp.zeros_like(kept).at[order].set(balanced_sorted)
        prio = balanced.astype(jnp.float32) * 4.0 + kept.astype(jnp.float32) * 2.0 + c_score
        _, sel_c = jax.lax.top_k(prio, topk)
        return cand_idx[sel_c]

    want = np.asarray(jax.vmap(flat_reference)(logits, unact))
    got = np.asarray(
        deta_first_stage_select(logits, unact, ok, SS, topk, pre_nms_topk, nms_thresh)
    )
    np.testing.assert_array_equal(np.sort(got, -1), np.sort(want, -1))


def test_deta_first_stage_select_level_balance(rng):
    # well-separated boxes so NMS keeps everything -> selection should be
    # level-balanced topk by score
    b, topk = 1, 6
    logits = jnp.asarray(rng.randn(b, S).astype(np.float32))
    # anchors from gen_output_proposals (valid everywhere)
    vr = jnp.ones((b, 3, 2))
    mem = jnp.zeros((b, S, C))
    _, unact, ok = gen_output_proposals(mem, jnp.ones((b, S), bool), SS, vr)
    unact = jnp.where(jnp.isinf(unact), 10.0, unact)
    sel = deta_first_stage_select(
        logits, unact, ok, SS, topk, pre_nms_topk=10, nms_thresh=0.9
    )
    sel = np.asarray(sel[0])
    assert len(set(sel.tolist())) == topk  # distinct
    # with q_per_l = 2, at most 2 from the valid region of each level unless filled
    lvl = np.concatenate([np.full(h * w, i) for i, (h, w) in enumerate(SS)])
    counts = np.bincount(lvl[sel], minlength=3)
    assert counts.max() <= topk  # sanity
