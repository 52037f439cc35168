"""DETA-style deformable-DETR transformer (encoder, decoder, two-stage select).

Capability match: /root/reference/ape/modeling/ape_deta/deformable_transformer_vl.py
  * Encoder: num_layers x [optional BiAttentionBlock VL fusion -> MSDA self-attn
    -> post-norm -> FFN -> post-norm] (:20-122)
  * Decoder: num_layers x [self-attn -> MSDA cross-attn -> FFN], per-layer box
    refinement with detached references, ``look_forward_twice`` (:124-255)
  * Two-stage: gen_encoder_output_proposals (:321-369), DETA first-stage
    per-level pre-NMS topk -> batched NMS -> level-balanced topk (:569-633),
    query init from pos_trans/pix_trans of topk proposals (:635-645)

TPU-first design:
  * All shapes static: S tokens, `num_queries` decoder slots, L levels; padding
    carried as validity masks; the first-stage select is a fully vectorized
    fixed-shape NMS + priority top-k (ops/nms.py) instead of per-image Python.
  * Encoder MSDA runs the gather-free window kernel (queries == grid); decoder
    MSDA runs the exact path (arbitrary box-scaled sampling).
  * Activation checkpointing is `nn.remat` on encoder/decoder layers.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _remat_policy():
    """Remat policy for the encoder/decoder layer checkpointing.

    Default saves the window-MSDA kernel outputs (tagged "msda_out" in
    layers/msda_module.py): the backward pass then reruns only the cheap
    projections instead of the Pallas forward sweep, at ~45 MB/layer of extra
    saved activations (87k tokens x 256 x bf16 at 1024²). APE_REMAT_POLICY=
    full restores everything-recomputed (the round-3 behavior).
    """
    if os.environ.get("APE_REMAT_POLICY", "msda") == "full":
        return None
    return jax.checkpoint_policies.save_only_these_names("msda_out")

from ape_tpu.layers import FFN, MLP, BiAttentionBlock, MultiheadAttention
from ape_tpu.layers.msda_module import MultiScaleDeformableAttention
from ape_tpu.ops.box_ops import box_cxcywh_to_xyxy
from ape_tpu.ops.misc import inverse_sigmoid
from ape_tpu.ops.msda import level_start_index
from ape_tpu.ops.nms import NEG_INF, batched_nms_mask, nms_mask


# ---------------------------------------------------------------------------
# grid helpers (static per spatial configuration)
# ---------------------------------------------------------------------------

def encoder_reference_points(
    spatial_shapes: Sequence[Tuple[int, int]],
    valid_ratios: jnp.ndarray,  # (B, L, 2) in (x, y)
) -> jnp.ndarray:
    """Normalized per-level reference points for encoder queries.

    Matches get_reference_points (deformable_transformer_vl.py:372-400):
    ref[b, q(of level lq), lv] = grid_center(q)/valid[lq] * valid[lv].
    Returns (B, S, L, 2).
    """
    pieces = []
    for hq, wq in spatial_shapes:
        yy, xx = np.meshgrid(
            (np.arange(hq) + 0.5) / hq, (np.arange(wq) + 0.5) / wq, indexing="ij"
        )
        pieces.append(np.stack([xx.reshape(-1), yy.reshape(-1)], -1))
    base = jnp.asarray(np.concatenate(pieces, 0), jnp.float32)  # (S, 2)
    lq_valid = []
    for lq, (hq, wq) in enumerate(spatial_shapes):
        lq_valid.append(jnp.broadcast_to(valid_ratios[:, lq : lq + 1, :], (valid_ratios.shape[0], hq * wq, 2)))
    lq_valid = jnp.concatenate(lq_valid, axis=1)  # (B, S, 2)
    ref = base[None, :, None, :] / lq_valid[:, :, None, :] * valid_ratios[:, None, :, :]
    return ref


def encoder_grid_corrections(
    spatial_shapes: Sequence[Tuple[int, int]],
    valid_ratios: jnp.ndarray,  # (B, L, 2)
) -> jnp.ndarray:
    """Pixel-space shift of the true sampling center vs. the static grid map used
    by the window MSDA kernel: (B, S, L, 2). Zero when there is no padding."""
    pieces = []
    for hq, wq in spatial_shapes:
        yy, xx = np.meshgrid(
            np.arange(hq) + 0.5, np.arange(wq) + 0.5, indexing="ij"
        )
        pieces.append(np.stack([xx.reshape(-1) / wq, yy.reshape(-1) / hq], -1))
    base = jnp.asarray(np.concatenate(pieces, 0), jnp.float32)  # (S, 2) normalized centers
    lq_valid = []
    for lq, (hq, wq) in enumerate(spatial_shapes):
        lq_valid.append(jnp.broadcast_to(valid_ratios[:, lq : lq + 1, :], (valid_ratios.shape[0], hq * wq, 2)))
    lq_valid = jnp.concatenate(lq_valid, axis=1)  # (B, S, 2)
    sizes = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)  # (L, 2)
    ratio = valid_ratios[:, None, :, :] / lq_valid[:, :, None, :]  # (B, S, L, 2)
    return base[None, :, None, :] * sizes[None, None, :, :] * (ratio - 1.0)


def valid_ratios_from_masks(masks: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """masks: per level (B, H, W) True = VALID. Returns (B, L, 2) in (x, y)."""
    ratios = []
    for m in masks:
        vh = jnp.sum(m[:, :, 0].astype(jnp.float32), axis=1) / m.shape[1]
        vw = jnp.sum(m[:, 0, :].astype(jnp.float32), axis=1) / m.shape[2]
        ratios.append(jnp.stack([vw, vh], -1))
    return jnp.stack(ratios, 1)


def level_ids_array(spatial_shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    ids = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ids.append(np.full(h * w, lvl, np.int32))
    return np.concatenate(ids)


# ---------------------------------------------------------------------------
# proposal generation + DETA first-stage selection (fixed shape)
# ---------------------------------------------------------------------------

def gen_output_proposals(
    memory: jnp.ndarray,  # (B, S, C)
    valid_mask: jnp.ndarray,  # (B, S) True = valid
    spatial_shapes: Sequence[Tuple[int, int]],
    valid_ratios: jnp.ndarray,  # (B, L, 2)
    mask_prompt: Optional[jnp.ndarray] = None,  # (B, S) True = allowed
):
    """Per-cell anchor proposals in logit space; invalid cells -> +inf.

    Matches gen_encoder_output_proposals (deformable_transformer_vl.py:321-369):
    anchor center = (grid + 0.5)/valid_size, wh = 0.05 * 2^lvl.
    Returns (masked_memory (B,S,C), proposals_unact (B,S,4), proposal_valid (B,S)).
    """
    b = memory.shape[0]
    props = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        yy, xx = np.meshgrid(
            np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij"
        )
        grid = jnp.asarray(
            np.stack([xx.reshape(-1), yy.reshape(-1)], -1), jnp.float32
        )  # (HW, 2)
        scale = valid_ratios[:, lvl, :] * jnp.asarray([w, h], jnp.float32)  # (B, 2)
        center = (grid[None] + 0.5) / scale[:, None, :]
        wh = jnp.full_like(center, 0.05 * (2.0**lvl))
        props.append(jnp.concatenate([center, wh], -1))
    proposals = jnp.concatenate(props, 1)  # (B, S, 4)
    in_range = jnp.all((proposals > 0.01) & (proposals < 0.99), -1)
    ok = in_range & valid_mask
    if mask_prompt is not None:
        ok = ok & mask_prompt
    unact = jnp.log(proposals / (1 - jnp.clip(proposals, None, 1 - 1e-7)))
    unact = jnp.where(ok[..., None], unact, jnp.inf)
    mem = jnp.where(ok[..., None], memory, 0.0)
    return mem, unact, ok


def deta_first_stage_select(
    logits: jnp.ndarray,  # (B, S) binary objectness
    boxes_unact: jnp.ndarray,  # (B, S, 4) cxcywh logit space
    proposal_valid: jnp.ndarray,  # (B, S)
    spatial_shapes: Sequence[Tuple[int, int]],
    topk: int,
    pre_nms_topk: int = 1000,
    nms_thresh: float = 0.9,
) -> jnp.ndarray:
    """Fixed-shape DETA first-stage proposal selection. Returns indices (B, topk).

    Semantics-equivalent rewrite of deformable_transformer_vl.py:581-633:
    per-level top-k -> level-classed NMS -> level-balanced pick of topk/L per
    level -> fill remaining slots by priority (kept-by-NMS first, then score).
    """
    num_levels = len(spatial_shapes)
    level_ids = jnp.asarray(level_ids_array(spatial_shapes))  # (S,)
    starts, s = level_start_index(spatial_shapes)
    q_per_l = topk // num_levels
    k_pad = min(pre_nms_topk, max(h * w for h, w in spatial_shapes))

    def one(logit, bx_unact, valid):
        # NO validity masking: the reference ranks by raw sigmoid scores
        # (deformable_transformer_vl.py:586-590), so invalid proposals (class
        # head on zeroed memory -> sigmoid(bias) ~= 0.01, box saturated at the
        # full-image corner) COMPETE with low-scoring valid ones — and fill
        # slots when a padded image leaves too few valid candidates
        score = jax.nn.sigmoid(logit)
        boxes = jnp.clip(box_cxcywh_to_xyxy(jax.nn.sigmoid(bx_unact)), 0.0, 1.0)

        # per-level pre-NMS top-k, COMPACTED: the greedy NMS must run over
        # <= min(pre_nms_topk, HW_l) candidates per level, never all S tokens.
        # Levels are padded to one fixed K (pad slots carry NEG_INF score and
        # a global index of 0 — they never win any downstream top_k as long as
        # there are >= topk real candidates, which every config guarantees).
        cand_idx = []
        cand_valid = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            k = min(pre_nms_topk, h * w)
            lvl_score = jax.lax.dynamic_slice_in_dim(score, starts[lvl], h * w)
            _, idx = jax.lax.top_k(lvl_score, k)
            cand_idx.append(jnp.pad(idx + starts[lvl], (0, k_pad - k)))
            cand_valid.append(
                jnp.pad(jnp.ones((k,), bool), (0, k_pad - k))
            )
        cand_idx_l = jnp.stack(cand_idx)  # (L, K) global indices
        cand_valid_l = jnp.stack(cand_valid)
        c_boxes_l = boxes[cand_idx_l]
        c_score_l = jnp.where(cand_valid_l, score[cand_idx_l], NEG_INF)

        # boxes of different levels never suppress each other (the reference's
        # batched_nms idxs=level): run the L level-NMS problems as one vmapped
        # batch — sequential tile depth K/tile instead of (L*K)/tile
        kept_l = jax.vmap(lambda bx, sc, va: nms_mask(bx, sc, nms_thresh, va))(
            c_boxes_l, c_score_l, cand_valid_l
        )

        cand_idx = cand_idx_l.reshape(-1)
        kept = kept_l.reshape(-1)
        c_score = c_score_l.reshape(-1)
        c_level = level_ids[cand_idx]

        # level-balanced selection among kept, by score order
        order = jnp.argsort(-jnp.where(kept, c_score, NEG_INF))
        lvl_sorted = c_level[order]
        kept_sorted = kept[order]
        onehot = jax.nn.one_hot(lvl_sorted, num_levels, dtype=jnp.int32)
        rank_in_level = jnp.cumsum(onehot * kept_sorted[:, None].astype(jnp.int32), 0)
        my_rank = jnp.take_along_axis(rank_in_level, lvl_sorted[:, None], 1)[:, 0]
        balanced_sorted = kept_sorted & (my_rank <= q_per_l)
        balanced = jnp.zeros_like(kept).at[order].set(balanced_sorted)

        # priority fill: balanced > kept > rest, by score within each class
        prio = (
            balanced.astype(jnp.float32) * 4.0
            + kept.astype(jnp.float32) * 2.0
            + c_score
        )
        _, sel_c = jax.lax.top_k(prio, topk)
        return cand_idx[sel_c]

    return jax.vmap(one)(logits, boxes_unact, proposal_valid)


def proposal_pos_embed(
    proposals_unact: jnp.ndarray, num_pos_feats: int = 128, temperature: float = 10000.0
) -> jnp.ndarray:
    """Sine embedding of sigmoid(proposals): (B, K, 4) -> (B, K, 4*num_pos_feats).

    Matches get_proposal_pos_embed (deformable_transformer_vl.py:412-420):
    interleaved (sin, cos) pairs over the dim_t schedule.
    """
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos = jax.nn.sigmoid(proposals_unact) * scale
    pos = pos[..., None] / dim_t  # (B, K, 4, F)
    emb = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], -1)
    return emb.reshape(*proposals_unact.shape[:-1], -1)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

class EncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    feedforward_dim: int
    num_feature_levels: int
    num_points: int = 4
    window_radius: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, pos, valid_mask, spatial_shapes, reference_points, grid_corrections
    ):
        x = MultiScaleDeformableAttention(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            num_levels=self.num_feature_levels,
            num_points=self.num_points,
            window_radius=self.window_radius,
            dtype=self.dtype,
            name="attn",
        )(
            query=x,
            value=x,
            spatial_shapes=spatial_shapes,
            reference_points=reference_points,
            query_pos=pos,
            key_padding_mask=~valid_mask,
            mode="window",
            grid_corrections=grid_corrections,
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = FFN(self.embed_dim, self.feedforward_dim, dtype=self.dtype, name="ffn")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        return x


class DeformableTransformerEncoder(nn.Module):
    """Encoder with optional per-layer vision-language fusion."""

    embed_dim: int = 256
    num_heads: int = 8
    feedforward_dim: int = 2048
    num_layers: int = 6
    num_feature_levels: int = 5
    num_points: int = 4
    window_radius: int = 4
    vl_fusion: bool = False
    vl_embed_dim: int = 2048
    vl_num_heads: int = 8
    vl_init_values: float = 1e-4
    embed_dim_language: int = 1024
    use_act_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,  # (B, S, C)
        pos,  # (B, S, C)
        valid_mask,  # (B, S)
        text,  # (B, T, Cl) or None
        text_valid,  # (B, T) or None
        spatial_shapes,
        reference_points,
        grid_corrections,
    ):
        layer_cls = EncoderLayer
        vl_cls = BiAttentionBlock
        if self.use_act_checkpoint:
            layer_cls = nn.remat(
                EncoderLayer, static_argnums=(4,), policy=_remat_policy()
            )
            # the reference checkpoints the VL fusion too
            # (vision_language_fusion.py:7-53 checkpoint_wrapper): without it,
            # six layers of (S x T x heads) bi-attention temps at 87k tokens
            # stay live for the backward — flagship training OOMs HBM
            vl_cls = nn.remat(BiAttentionBlock)
        for i in range(self.num_layers):
            if self.vl_fusion and text is not None:
                x, text = vl_cls(
                    v_dim=self.embed_dim,
                    l_dim=self.embed_dim_language,
                    embed_dim=self.vl_embed_dim,
                    num_heads=self.vl_num_heads,
                    init_values=self.vl_init_values,
                    dtype=self.dtype,
                    name=f"vl_layers_{i}",
                )(x, text, valid_mask, text_valid)
            x = layer_cls(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                feedforward_dim=self.feedforward_dim,
                num_feature_levels=self.num_feature_levels,
                num_points=self.num_points,
                window_radius=self.window_radius,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, pos, valid_mask, spatial_shapes, reference_points, grid_corrections)
        return x, text


class DecoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    feedforward_dim: int
    num_feature_levels: int
    num_points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, query_pos, memory, valid_mask, spatial_shapes, reference_points
    ):
        x = MultiheadAttention(
            self.embed_dim, self.num_heads, dtype=self.dtype, name="self_attn"
        )(x, query_pos=query_pos, key_pos=query_pos)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = MultiScaleDeformableAttention(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            num_levels=self.num_feature_levels,
            num_points=self.num_points,
            dtype=self.dtype,
            name="cross_attn",
        )(
            query=x,
            value=memory,
            spatial_shapes=spatial_shapes,
            reference_points=reference_points,
            query_pos=query_pos,
            key_padding_mask=~valid_mask,
            mode="exact",
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = FFN(self.embed_dim, self.feedforward_dim, dtype=self.dtype, name="ffn")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        return x


class DeformableTransformerDecoder(nn.Module):
    """Decoder with iterative box refinement; owns the per-layer bbox MLPs
    (num_layers + 1: the extra one scores encoder proposals in two-stage)."""

    embed_dim: int = 256
    num_heads: int = 8
    feedforward_dim: int = 2048
    num_layers: int = 6
    num_feature_levels: int = 5
    num_points: int = 4
    look_forward_twice: bool = True
    # False = plain deformable DETR: references are never updated between
    # layers (legacy deformable_detr_r50_50ep recipe); True = iterative box
    # refinement (every ape_deta / deformable_deta config)
    with_box_refine: bool = True
    use_act_checkpoint: bool = False
    # extra copies of the enc-stage class/bbox heads whose per-proposal argmax
    # wins the first stage (deformable_detr.py:188-201, used by the reference
    # flagship *_mdl configs via transformer.proposal_ambiguous = 1)
    proposal_ambiguous: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.bbox_embed = [
            MLP(self.embed_dim, 4, 3, dtype=self.dtype)
            for _ in range(self.num_layers + 1)
        ]
        if self.proposal_ambiguous:
            # reference: deepcopies of bbox_embed[-1] / class_embed[-1]
            # (the Linear(embed, 1) objectness head with the focal prior bias)
            self.bbox_embed_ambiguous = [
                MLP(self.embed_dim, 4, 3, dtype=self.dtype)
                for _ in range(self.proposal_ambiguous)
            ]
            self.class_embed_ambiguous = [
                nn.Dense(
                    1,
                    bias_init=nn.initializers.constant(
                        -math.log((1 - 0.01) / 0.01)
                    ),
                    dtype=self.dtype,
                )
                for _ in range(self.proposal_ambiguous)
            ]

    def enc_bbox_head(self, x):
        """The extra bbox head applied to encoder proposals (two-stage)."""
        return self.bbox_embed[self.num_layers](x)

    def enc_ambiguous_heads(self, x):
        """Ambiguous enc-stage head outputs: ([(B,S,1)...], [(B,S,4)...])."""
        return (
            [h(x) for h in self.class_embed_ambiguous],
            [h(x) for h in self.bbox_embed_ambiguous],
        )

    @nn.compact
    def __call__(
        self,
        query,  # (B, K, C)
        query_pos,  # (B, K, C)
        memory,  # (B, S, C)
        valid_mask,  # (B, S)
        spatial_shapes,
        reference_points,  # (B, K, 4) sigmoid space
        valid_ratios,  # (B, L, 2)
    ):
        layer_cls = DecoderLayer
        if self.use_act_checkpoint:
            layer_cls = nn.remat(DecoderLayer, static_argnums=(5,))
        x = query
        inter_states = []
        output_coords = []
        refs = reference_points
        prev_live = reference_points
        for i in range(self.num_layers):
            if refs.shape[-1] == 4:
                ref_input = refs[:, :, None, :] * jnp.concatenate(
                    [valid_ratios, valid_ratios], -1
                )[:, None, :, :]
            else:
                ref_input = refs[:, :, None, :] * valid_ratios[:, None, :, :]
            x = layer_cls(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                feedforward_dim=self.feedforward_dim,
                num_feature_levels=self.num_feature_levels,
                num_points=self.num_points,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, query_pos, memory, valid_mask, spatial_shapes, ref_input)

            delta = self.bbox_embed[i](x)
            if refs.shape[-1] == 4:
                new_refs = jax.nn.sigmoid(delta + inverse_sigmoid(refs))
            else:
                # single-stage 2-coord reference points (the legacy
                # deformable_detr family): xy refines against the reference,
                # wh comes straight from the head (deformable DETR box head
                # semantics for 2-dim refs); refs become 4-dim from here on
                new_refs = jax.nn.sigmoid(
                    jnp.concatenate(
                        [delta[..., :2] + inverse_sigmoid(refs), delta[..., 2:]],
                        axis=-1,
                    )
                )
            inter_states.append(x)
            # look_forward_twice (reference deformable_transformer_vl.py:245-251
            # + deformable_detr.py box head): the layer-i box is predicted on
            # top of the PREVIOUS layer's un-detached refinement, so gradient
            # flows through delta_i AND delta_{i-1} ("twice"). Forward values
            # are identical in both arms (the bases differ only by detachment).
            if self.look_forward_twice and prev_live.shape[-1] == 4:
                output_coords.append(jax.nn.sigmoid(delta + inverse_sigmoid(prev_live)))
            else:
                output_coords.append(new_refs)
            prev_live = new_refs
            if self.with_box_refine:
                refs = jax.lax.stop_gradient(new_refs)

        return (
            jnp.stack(inter_states),  # (num_layers, B, K, C)
            jnp.stack(output_coords),  # (num_layers, B, K, 4)
        )


class DeformableDetrTransformer(nn.Module):
    """Full two-stage transformer; flattening, level embeds, proposals, select."""

    encoder: DeformableTransformerEncoder
    decoder: DeformableTransformerDecoder
    num_feature_levels: int = 5
    two_stage_num_proposals: int = 900
    # False = single-stage deformable DETR: learned query embeddings and
    # Linear(query_pos)->2 sigmoid reference points instead of encoder
    # proposals (the legacy deformable_detr_r50 recipes; reference
    # deformable_transformer.py as_two_stage=False branch)
    as_two_stage: bool = True
    assign_first_stage: bool = True
    pre_nms_topk: int = 1000
    nms_thresh_enc: float = 0.9
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        multi_level_feats: Sequence[jnp.ndarray],  # per level (B, H, W, C)
        multi_level_masks: Sequence[jnp.ndarray],  # per level (B, H, W) True=valid
        multi_level_pos: Sequence[jnp.ndarray],  # per level (B, H, W, C)
        text: Optional[jnp.ndarray] = None,  # (B, T, Cl)
        text_valid: Optional[jnp.ndarray] = None,  # (B, T)
        mask_prompt: Optional[jnp.ndarray] = None,  # (B, S) True = allowed
        enc_class_head=None,  # callable (B,S,C)->(B,S,1): binary objectness
    ):
        b = multi_level_feats[0].shape[0]
        c = multi_level_feats[0].shape[-1]
        spatial_shapes = tuple(
            (int(f.shape[1]), int(f.shape[2])) for f in multi_level_feats
        )
        level_embeds = self.param(
            "level_embeds",
            nn.initializers.normal(1.0),
            (self.num_feature_levels, c),
        )

        feat = jnp.concatenate(
            [f.reshape(b, -1, c) for f in multi_level_feats], axis=1
        )
        valid = jnp.concatenate(
            [m.reshape(b, -1) for m in multi_level_masks], axis=1
        )
        pos = jnp.concatenate(
            [
                p.reshape(b, -1, c) + level_embeds[i][None, None, :].astype(p.dtype)
                for i, p in enumerate(multi_level_pos)
            ],
            axis=1,
        )
        valid_ratios = valid_ratios_from_masks(multi_level_masks)
        enc_refs = encoder_reference_points(spatial_shapes, valid_ratios)
        grid_corr = encoder_grid_corrections(spatial_shapes, valid_ratios)

        memory, text = self.encoder(
            feat, pos, valid, text, text_valid, spatial_shapes, enc_refs, grid_corr
        )

        if not self.as_two_stage:
            k = self.two_stage_num_proposals
            qe = self.param(
                "query_embed", nn.initializers.normal(1.0), (k, 2 * c)
            ).astype(feat.dtype)
            query_pos, query = jnp.split(qe[None].repeat(b, axis=0), 2, axis=-1)
            init_reference = jax.nn.sigmoid(
                nn.Dense(2, dtype=self.dtype, name="reference_points")(query_pos)
            )
            inter_states, output_coords = self.decoder(
                query, query_pos, memory, valid, spatial_shapes,
                init_reference, valid_ratios,
            )
            s = feat.shape[1]
            return {
                "inter_states": inter_states,
                "output_coords": output_coords,
                "init_reference": init_reference,
                # no encoder stage: placeholders with proposal_valid=False so
                # the stage-1 loss contributes nothing
                "enc_logits": jnp.zeros((b, s), feat.dtype),
                "enc_coords": jnp.full((b, s, 4), 0.5, feat.dtype),
                "proposals": jnp.full((b, s, 4), 0.5, feat.dtype),
                "proposal_valid": jnp.zeros((b, s), bool),
                "memory": memory,
                "text": text,
                "valid_mask": valid,
                "spatial_shapes": spatial_shapes,
            }

        out_memory, proposals_unact, proposal_valid = gen_output_proposals(
            memory, valid, spatial_shapes, valid_ratios, mask_prompt
        )
        out_memory = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="enc_output_norm")(
            nn.Dense(c, dtype=self.dtype, name="enc_output")(out_memory)
        )

        assert enc_class_head is not None, "two-stage requires the binary head"
        # UNMASKED, like the reference: invalid proposals get the class head of
        # zeroed memory (= its bias, sigmoid ~0.01) and participate in the
        # first-stage select; validity flows separately to the criterion
        enc_logits = enc_class_head(out_memory)[..., 0]  # (B, S)
        masked_props = jnp.where(proposal_valid[..., None], proposals_unact, 0.0)
        enc_coords_unact = self.decoder.enc_bbox_head(out_memory) + masked_props
        if self.decoder.proposal_ambiguous:
            # per-proposal argmax over 1+N head copies on the objectness logit
            # picks which head's class AND coords survive
            # (deformable_transformer_vl.py:508-534)
            amb_cls, amb_box = self.decoder.enc_ambiguous_heads(out_memory)
            cls_stack = jnp.stack(
                [enc_logits] + [c[..., 0] for c in amb_cls], axis=1
            )  # (B, 1+N, S)
            coord_stack = jnp.stack(
                [enc_coords_unact] + [bx + masked_props for bx in amb_box],
                axis=1,
            )  # (B, 1+N, S, 4)
            head_idx = jnp.argmax(cls_stack, axis=1)  # (B, S)
            enc_logits = jnp.take_along_axis(
                cls_stack, head_idx[:, None, :], axis=1
            )[:, 0]
            enc_coords_unact = jnp.take_along_axis(
                coord_stack, head_idx[:, None, :, None], axis=1
            )[:, 0]
        # invalid proposals: the reference's +inf anchor saturates the sigmoid
        # to exactly 1.0 — 30.0 does the same in fp32 without inf arithmetic
        enc_coords_unact = jnp.where(
            proposal_valid[..., None], enc_coords_unact, 30.0
        )

        topk = self.two_stage_num_proposals
        if self.assign_first_stage:
            sel = deta_first_stage_select(
                enc_logits,
                enc_coords_unact,
                proposal_valid,
                spatial_shapes,
                topk,
                self.pre_nms_topk,
                self.nms_thresh_enc,
            )  # (B, topk)
        else:
            _, sel = jax.lax.top_k(enc_logits, topk)

        topk_coords_unact = jnp.take_along_axis(
            enc_coords_unact, sel[..., None], axis=1
        )
        topk_coords_unact = jax.lax.stop_gradient(topk_coords_unact)
        init_reference = jax.nn.sigmoid(topk_coords_unact)

        # num_pos_feats scales with the embed dim (4 coords * c/2 = 2c, the
        # pos_trans fan-in; the reference hardcodes 128 for embed_dim 256)
        pos_trans = nn.Dense(2 * c, dtype=self.dtype, name="pos_trans")(
            proposal_pos_embed(topk_coords_unact, num_pos_feats=c // 2)
        )
        pos_trans = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pos_trans_norm")(pos_trans)
        query_pos, query = jnp.split(pos_trans, 2, axis=-1)
        topk_feats = jax.lax.stop_gradient(
            jnp.take_along_axis(out_memory, sel[..., None], axis=1)
        )
        query = query + nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pix_trans_norm")(
            nn.Dense(c, dtype=self.dtype, name="pix_trans")(topk_feats)
        )

        inter_states, output_coords = self.decoder(
            query,
            query_pos,
            memory,
            valid,
            spatial_shapes,
            init_reference,
            valid_ratios,
        )

        return {
            "inter_states": inter_states,  # (layers, B, K, C)
            "output_coords": output_coords,  # (layers, B, K, 4) sigmoid space
            "init_reference": init_reference,  # (B, K, 4)
            "enc_logits": enc_logits,  # (B, S)
            "enc_coords": jax.nn.sigmoid(enc_coords_unact),  # (B, S, 4)
            "proposals": jax.nn.sigmoid(proposals_unact),  # (B, S, 4) anchors
            "proposal_valid": proposal_valid,  # (B, S)
            "memory": memory,  # (B, S, C)
            "text": text,
            "valid_mask": valid,
            "spatial_shapes": spatial_shapes,
        }
