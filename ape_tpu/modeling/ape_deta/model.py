"""APE core vision model — open-vocabulary detection + segmentation transformer.

Capability match: DeformableDETRSegmVL (/root/reference/ape/modeling/ape_deta/
deformable_detr_segm_vl.py) and its base DeformableDETR (deformable_detr.py):
  * backbone -> neck (ChannelMapper, GN32) -> 5-level tokens + sine pos embeds
    + per-level validity masks (:305-343, :372-392)
  * two-stage DETA transformer (transformer.py here)
  * per-decoder-layer heads: VisionLanguageAlign class logits against text
    features, box refinement (look-forward-twice), MaskDINO-style mask head:
    pixel decoder from encoder memory level-0 + lateral p2 (:728-750), mask
    logits = einsum("bqc,bchw->bqhw") (:507-517)
  * two-stage binary objectness head on encoder proposals (deformable_detr.py:167-186)

TPU-first: one pure function of (params, images, image_sizes, text) with fully
static shapes; dataset routing/prompt handling is host-side (ape_tpu/engine);
inference postprocessing lives in postprocess.py. Feature maps NHWC.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ape_tpu.layers import MLP, StillClassifier, VisionLanguageAlign
from ape_tpu.modeling.ape_deta.transformer import DeformableDetrTransformer
from ape_tpu.ops.posemb import position_embedding_sine


class ChannelMapper(nn.Module):
    """Per-level 1x1 conv + GroupNorm(32) to a common channel count
    (capability match: detrex ChannelMapper as configured in the reference
    configs — kernel_size=1, GN32). ViT configs use num_outs == num inputs;
    the r50 family maps in_features=["res3","res4","res5"] and extends to
    num_outs=5 with 3x3 stride-2 extra convs — the first on the raw last
    input feature, the rest chained (detrex ChannelMapper semantics,
    reference models/ape_deta_r50.py:41-52)."""

    out_channels: int = 256
    num_groups: int = 32
    in_features: Optional[Sequence[str]] = None  # default: all, sorted
    num_outs: Optional[int] = None  # default: len(in_features)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        names = list(self.in_features) if self.in_features else sorted(feats.keys())
        out = {}
        for name in names:
            x = nn.Conv(
                self.out_channels,
                kernel_size=(1, 1),
                use_bias=True,
                dtype=self.dtype,
                name=f"conv_{name}",
            )(feats[name])
            x = nn.GroupNorm(epsilon=1e-5,
                num_groups=self.num_groups, dtype=self.dtype, name=f"gn_{name}"
            )(x)
            out[name] = x
        prev = feats[names[-1]]
        for i in range((self.num_outs or len(names)) - len(names)):
            x = nn.Conv(
                self.out_channels,
                kernel_size=(3, 3),
                strides=(2, 2),
                padding=((1, 1), (1, 1)),
                use_bias=True,
                dtype=self.dtype,
                name=f"extra_conv_{i}",
            )(prev)
            x = nn.GroupNorm(
                epsilon=1e-5, num_groups=self.num_groups, dtype=self.dtype,
                name=f"extra_gn_{i}",
            )(x)
            out[f"extra{i}"] = x
            prev = x
        return out


def level_valid_masks(
    image_sizes: jnp.ndarray,  # (B, 2) valid (h, w) in pixels
    image_hw: Tuple[int, int],
    level_shapes: Sequence[Tuple[int, int]],
) -> list:
    """Analytic nearest-downsample of the top-left-rectangle validity mask:
    feature cell (y, x) at level of size (H_l, W_l) is valid iff
    y < ceil(h * H_l / H). Matches F.interpolate(nearest) of the pixel mask."""
    hh, ww = image_hw
    masks = []
    for hl, wl in level_shapes:
        vh = jnp.ceil(image_sizes[:, 0].astype(jnp.float32) * hl / hh).astype(jnp.int32)
        vw = jnp.ceil(image_sizes[:, 1].astype(jnp.float32) * wl / ww).astype(jnp.int32)
        ys = jnp.arange(hl)[None, :, None]
        xs = jnp.arange(wl)[None, None, :]
        masks.append((ys < vh[:, None, None]) & (xs < vw[:, None, None]))
    return masks


class APEDeta(nn.Module):
    """The flagship vision model. Returns raw heads; no postprocessing."""

    backbone: nn.Module  # SimpleFeaturePyramid
    transformer: DeformableDetrTransformer
    neck: Optional[nn.Module] = None
    embed_dim: int = 256
    embed_dim_language: int = 1024
    num_queries: int = 900
    in_features: Sequence[str] = ("p2", "p3", "p4", "p5", "p6")
    mask_on: bool = True
    mask_in_feature: str = "p2"
    mask_encode_level: int = 0
    aux_mask: bool = False
    # closed-vocabulary mode (legacy `deta`, reference ape/modeling/deta/
    # deformable_detr.py fixed-category head / zero_shot_fc.py zs_weight='rand'):
    # a LEARNED class-embedding bank replaces the text-encoder features, so the
    # same VisionLanguageAlign head becomes a fixed N-way classifier.
    num_learned_classes: int = 0
    # recorded class budget from the reference recipe (model_vision.num_classes
    # sizes the reference's classification head; here the open-vocab align head
    # is prompt-sized, so the value is carried as metadata — it feeds the
    # text-tile padding choice and the config-fidelity audit, not a weight shape)
    num_classes: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, H, W, 3) normalized, padded square
        image_sizes: jnp.ndarray,  # (B, 2) valid (h, w) pixels
        text_features: jnp.ndarray,  # (B, T, Cl)
        text_valid: jnp.ndarray,  # (B, T) bool
        mask_prompt: Optional[jnp.ndarray] = None,  # (B, H, W) bool
        deterministic: bool = True,
        align_on_fused: bool = True,
        fusion_text_mode: str = "text",  # "text" | "zero" | "learnable"
    ) -> Dict[str, Any]:
        # align_on_fused: which text features the class-align heads see. The
        # reference keeps the ORIGINAL text for "name" prompts (fusion only
        # updates vision tokens: deformable_detr_segm_vl.py:445-448
        # `features_l = 1.0 * features_l + 0.0 * features_l_fusion`) and the
        # FUSED text for phrase/expression prompts (:447). Callers pass
        # align_on_fused=False for name prompts when vl_fusion is on.
        #
        # fusion_text_mode: which features the encoder's VL-FUSION layers see
        # (orthogonal to the align side). Reference semantics for "name"
        # prompts (segm_vl.py:342-360): datasets flagged in
        # name_prompt_fusion_text fuse against the real text ("text"); others
        # fuse against the model's name_prompt_fusion_feature — a frozen zero
        # token ("zero", name_prompt_fusion_type="zero", segm_vl.py:160-163)
        # or a trained token ("learnable", :155-158). Phrase/expression
        # prompts always use "text".
        num_layers = self.transformer.decoder.num_layers

        if self.num_learned_classes:
            bank = self.param(
                "class_embedding",
                nn.initializers.normal(0.02),
                (self.num_learned_classes, self.embed_dim_language),
            )
            bsz = images.shape[0]
            text_features = jnp.broadcast_to(
                bank[None], (bsz,) + bank.shape
            ).astype(self.dtype)
            text_valid = jnp.ones((bsz, self.num_learned_classes), bool)

        # ---- backbone + neck ----
        backbone_feats = self.backbone(images, deterministic)
        feats = backbone_feats
        if self.neck is not None:
            feats = self.neck(feats)
        multi_level_feats = [feats[f] for f in self.in_features]
        level_shapes = [(f.shape[1], f.shape[2]) for f in multi_level_feats]
        multi_level_masks = level_valid_masks(
            image_sizes, images.shape[1:3], level_shapes
        )
        multi_level_pos = [
            position_embedding_sine(m, num_pos_feats=self.embed_dim // 2).astype(
                self.dtype
            )
            for m in multi_level_masks
        ]

        mask_prompt_flat = None
        if mask_prompt is not None:
            pieces = []
            for hl, wl in level_shapes:
                sy = images.shape[1] // hl
                sx = images.shape[2] // wl
                pieces.append(mask_prompt[:, ::sy, ::sx].reshape(images.shape[0], -1))
            mask_prompt_flat = jnp.concatenate(pieces, axis=1)

        # ---- transformer (two-stage binary objectness head passed in) ----
        # reference uses Linear(embed,1) with focal prior bias
        # (deformable_detr.py:167-186); the MLP variant is config-gated there.
        enc_head_linear = nn.Dense(
            1,
            bias_init=nn.initializers.constant(-math.log((1 - 0.01) / 0.01)),
            dtype=self.dtype,
            name="enc_class_head_linear",
        )
        if fusion_text_mode == "text":
            fusion_text, fusion_valid = text_features, text_valid
        elif fusion_text_mode == "none":
            # reference name_prompt_fusion_type="none": features_l_fusion is
            # None and the encoder skips its VL-fusion layers entirely
            fusion_text, fusion_valid = None, None
        else:
            bsz = images.shape[0]
            if fusion_text_mode == "learnable":
                tok = self.param(
                    "name_prompt_fusion_feature",
                    nn.initializers.normal(1.0),
                    (1, 1, self.embed_dim_language),
                )
            else:  # "zero"
                tok = jnp.zeros((1, 1, self.embed_dim_language))
            fusion_text = jnp.broadcast_to(
                tok, (bsz, 1, self.embed_dim_language)
            ).astype(self.dtype)
            fusion_valid = jnp.ones((bsz, 1), bool)
        tr_out = self.transformer(
            multi_level_feats,
            multi_level_masks,
            multi_level_pos,
            text=fusion_text,
            text_valid=fusion_valid,
            mask_prompt=mask_prompt_flat,
            enc_class_head=enc_head_linear,
        )

        inter_states = tr_out["inter_states"]  # (layers, B, K, C)
        output_coords = tr_out["output_coords"]  # (layers, B, K, 4)
        fused_text = tr_out["text"] if tr_out["text"] is not None else text_features
        if not align_on_fused or fusion_text_mode != "text":
            fused_text = text_features

        # ---- mask pixel decoder (MaskDINO style) ----
        mask_features = None
        if self.mask_on:
            lvl = self.mask_encode_level
            start = sum(h * w for h, w in level_shapes[:lvl])
            hl, wl = level_shapes[lvl]
            enc_feats = jax.lax.dynamic_slice_in_dim(
                tr_out["memory"], start, hl * wl, axis=1
            ).reshape(-1, hl, wl, self.embed_dim)
            lat = nn.Conv(
                self.embed_dim, (1, 1), use_bias=False, dtype=self.dtype, name="lateral_conv"
            )(backbone_feats[self.mask_in_feature])
            lat = nn.GroupNorm(epsilon=1e-5, num_groups=32, dtype=self.dtype, name="lateral_norm")(lat)
            if lat.shape[1] != hl:  # bilinear upsample of encoder feats to p2 size
                enc_feats = jax.image.resize(
                    enc_feats,
                    (enc_feats.shape[0], lat.shape[1], lat.shape[2], self.embed_dim),
                    method="bilinear",
                )
            x = lat + enc_feats
            x = nn.Conv(
                self.embed_dim, (3, 3), padding="SAME", use_bias=False,
                dtype=self.dtype, name="output_conv",
            )(x)
            x = nn.GroupNorm(epsilon=1e-5, num_groups=32, dtype=self.dtype, name="output_norm")(x)
            x = nn.relu(x)
            mask_features = nn.Conv(
                self.embed_dim, (1, 1), use_bias=False, dtype=self.dtype, name="mask_conv"
            )(x)  # (B, Hm, Wm, C)

        # ---- per-layer heads ----
        outputs_classes = []
        outputs_masks = []
        shared_mask_embed = (
            MLP(self.embed_dim, self.embed_dim, 3, dtype=self.dtype, name="mask_embed")
            if self.mask_on and not self.aux_mask
            else None
        )
        for lyr in range(num_layers):
            logits = VisionLanguageAlign(
                self.embed_dim,
                self.embed_dim_language,
                dtype=self.dtype,
                name=f"class_embed_{lyr}",
            )(inter_states[lyr], fused_text)
            logits = jnp.where(text_valid[:, None, :], logits, -1e4)
            outputs_classes.append(logits)
            if self.mask_on:
                if self.aux_mask:
                    membed = MLP(
                        self.embed_dim, self.embed_dim, 3, dtype=self.dtype,
                        name=f"mask_embed_{lyr}",
                    )(inter_states[lyr])
                else:
                    membed = shared_mask_embed(inter_states[lyr])
                outputs_masks.append(
                    jnp.einsum("bqc,bhwc->bqhw", membed, mask_features)
                )

        out = {
            "pred_logits": outputs_classes[-1],  # (B, K, T)
            "pred_boxes": output_coords[-1],  # (B, K, 4) cxcywh [0,1]
            "inter_states": inter_states,
            "aux_outputs": [
                {
                    "pred_logits": outputs_classes[i],
                    "pred_boxes": output_coords[i],
                    **(
                        {"pred_masks": outputs_masks[i]}
                        if self.mask_on and self.aux_mask
                        else {}
                    ),
                }
                for i in range(num_layers - 1)
            ],
            "init_reference": tr_out["init_reference"],
            "enc_outputs": {
                "pred_logits": tr_out["enc_logits"][..., None],  # (B, S, 1)
                "pred_boxes": tr_out["enc_coords"],  # (B, S, 4)
                "anchors": tr_out["proposals"],  # (B, S, 4)
                "valid": tr_out["proposal_valid"],  # (B, S)
            },
            "text_features": fused_text,
        }
        if self.mask_on:
            out["pred_masks"] = outputs_masks[-1]  # (B, K, Hm, Wm)
            out["mask_features"] = mask_features
        return out
