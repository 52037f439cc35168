"""DETA criterion: focal class loss (+federated), L1+GIoU boxes, mask losses,
two-stage assignment dispatch.

Capability match: /root/reference/ape/modeling/ape_deta/deformable_criterion.py
  * loss_labels with focal loss and federated class sampling (:100-276)
  * loss_boxes / loss_boxes_panoptic L1+GIoU (:315-373)
  * mask losses (:375-490) — computed densely at the mask-feature resolution
    with host-downsampled GT masks instead of the reference's 12544-point
    uncertainty sampling (point sampling is a GPU-memory optimization that
    relies on random gathers; dense at 1/4 resolution is the TPU-native
    equivalent with the same objective)
  * forward dispatch (:505-589): Stage2 assignment reused for final AND aux
    decoder layers, Stage1 assignment on binary-labeled encoder proposals,
    num_boxes all-reduced by the caller (train step psum)

Targets are fixed-shape padded arrays:
  labels (B, G) int32, boxes (B, G, 4) cxcywh in [0,1], valid (B, G) bool,
  optional masks (B, G, Hm, Wm) float in [0,1], is_thing (B, G) bool.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ape_tpu.ops.box_ops import (
    box_cxcywh_to_xyxy,
    elementwise_box_iou,
    elementwise_generalized_box_iou,
)
from ape_tpu.ops.misc import sigmoid_focal_loss
from ape_tpu.modeling.ape_deta.matchers import (
    hungarian_match,
    stage1_assign,
    stage2_assign,
)


def _gather_gt(arr: jnp.ndarray, assign: jnp.ndarray) -> jnp.ndarray:
    """arr (B, G, ...) gathered by assign (B, K) -> (B, K, ...); assign<0 -> slot 0."""
    idx = jnp.clip(assign, 0, arr.shape[1] - 1)
    return jnp.take_along_axis(
        arr, idx.reshape(*assign.shape, *([1] * (arr.ndim - 2))), axis=1
    )


def _point_sample_bilinear(masks: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Bilinear point sampling matching F.grid_sample(align_corners=False,
    padding_mode='zeros') on [0,1]^2 coords (detrex point_sample semantics).

    masks (B, M, H, W), pts (B, M, N, 2) as (x, y) -> (B, M, N)."""
    b, m, h, w = masks.shape
    x = pts[..., 0] * w - 0.5
    y = pts[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    flat = masks.reshape(b, m, h * w)

    def corner(yi, xi, wgt):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w + jnp.clip(
            xi, 0, w - 1
        ).astype(jnp.int32)
        v = jnp.take_along_axis(flat, idx, axis=-1)
        return v * wgt * inside.astype(masks.dtype)

    return (
        corner(y0, x0, (1 - fy) * (1 - fx))
        + corner(y0, x0 + 1, (1 - fy) * fx)
        + corner(y0 + 1, x0, fy * (1 - fx))
        + corner(y0 + 1, x0 + 1, fy * fx)
    )


def _sigmoid_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element binary cross-entropy with logits (detrex sigmoid_ce_loss)."""
    return jnp.clip(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


@dataclasses.dataclass
class DeformableCriterion:
    num_classes: int
    weight_dict: Dict[str, float]
    losses: Sequence[str] = ("class", "boxes", "masks")
    alpha: float = 0.25
    gamma: float = 2.0
    num_queries: int = 900
    # stage2 assigner
    use_stage2: bool = True
    stage2_iou_thresh: float = 0.6
    stage2_max_k: int = 4
    # stage1 assigner
    use_stage1: bool = True
    stage1_t_low: float = 0.3
    stage1_t_high: float = 0.7
    stage1_max_k: int = 4
    # hungarian costs (fallback when stage2 disabled)
    cost_class: float = 2.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    # federated loss
    use_fed_loss: bool = False
    fed_loss_num_classes: int = 50
    fed_loss_cls_weights: Optional[jnp.ndarray] = None  # (num_classes,)
    # how to extend a count-table shorter than num_classes
    # (deformable_criterion.py:107-139): max/max1000/mean/median pad with a
    # scalar weight; "cat" pads weight 0 and ALWAYS includes the padded class
    # range in the federated subset (:236-238 fed_loss_pad_classes).
    fed_loss_pad_type: Optional[str] = None
    # point-sampled "masks_maskdino" loss (deformable_criterion.py:424-490):
    # uncertainty-importance point sampling instead of the dense 1/4-res loss.
    # Off by default — dense is the TPU-native equivalent (no gathers); flip
    # for reference-exact loss values (A/B: same objective, pointwise CE+dice
    # over 12544 sampled points vs dense over all 1/4-res points).
    mask_point_sample: bool = False
    mask_num_points: int = 12544
    mask_oversample_ratio: float = 3.0
    mask_importance_sample_ratio: float = 0.75
    mask_max_masks: int = 128  # fixed-shape cap (reference caps at 128*B, :386)

    def __post_init__(self):
        self._fed_pad_start = None  # classes >= this are always kept ("cat")
        w = self.fed_loss_cls_weights
        if self.use_fed_loss and w is None:
            logging.getLogger(__name__).warning(
                "use_fed_loss=True but fed_loss_cls_weights is None: the "
                "federated class mask is DISABLED and loss_labels degrades to "
                "plain focal loss. Supply metadata.fed_loss_cls_weights(...)."
            )
            return
        if w is None:
            return
        w = jnp.asarray(w, jnp.float32)
        n = int(w.shape[0])
        if n < self.num_classes:
            pt = self.fed_loss_pad_type
            if pt == "max":
                pad = jnp.max(w)
            elif pt == "max1000":
                pad = jnp.max(w) * 1000.0
            elif pt == "mean":
                pad = jnp.mean(w)
            elif pt == "median":
                # torch.median = lower median, not the interpolated one
                pad = jnp.sort(w)[(n - 1) // 2]
            elif pt == "cat":
                pad = jnp.asarray(0.0, jnp.float32)
                self._fed_pad_start = n
            else:
                # reference default: kthvalue(num_classes * 7/10), 1-indexed
                k = min(max(int(self.num_classes * 7.0 / 10), 1), n)
                pad = jnp.sort(w)[k - 1]
            w = jnp.concatenate(
                [w, jnp.full((self.num_classes - n,), pad, jnp.float32)]
            )
        elif n > self.num_classes:
            raise ValueError(
                f"fed_loss_cls_weights has {n} entries > num_classes="
                f"{self.num_classes}"
            )
        self.fed_loss_cls_weights = w

    # ------------------------------------------------------------------
    def loss_labels(self, outputs, targets, assign, num_boxes, class_valid, rng):
        logits = outputs["pred_logits"]  # (B, K, C)
        b, k, c = logits.shape
        matched = assign >= 0
        cls = jnp.where(matched, _gather_gt(targets["labels"], assign), c)  # bg = c
        onehot = jax.nn.one_hot(cls, c, dtype=logits.dtype)  # bg row -> zeros

        col_mask = class_valid  # (B, C) or scalar True
        if self.use_fed_loss and self.fed_loss_cls_weights is not None:
            col_mask = col_mask & self._fed_class_mask(rng, cls, matched, c)[None, :]

        loss = sigmoid_focal_loss(logits, onehot, self.alpha, self.gamma)
        loss = jnp.where(col_mask[:, None, :], loss, 0.0)
        return {"loss_class": jnp.sum(loss) / num_boxes}

    def _fed_class_mask(self, rng, cls, matched, c):
        """Federated loss class subset: all gt classes + weighted negatives
        (deformable_criterion.py:161-187 via the Gumbel top-k trick)."""
        gt_classes = jnp.where(matched, cls, c)
        is_gt = jnp.zeros((c + 1,), bool).at[gt_classes.reshape(-1)].set(True)[:-1]
        w = jnp.clip(self.fed_loss_cls_weights.astype(jnp.float32), 1e-12)
        if w.shape[0] < c:
            # logits are a padded text tile wider than the vocabulary; padded
            # columns are invalid slots (masked by class_valid) — give them
            # negligible sampling weight
            w = jnp.concatenate([w, jnp.full((c - w.shape[0],), 1e-12, jnp.float32)])
        gumbel = -jnp.log(-jnp.log(jax.random.uniform(rng, (c,), minval=1e-9, maxval=1.0)))
        score = jnp.where(is_gt, jnp.inf, jnp.log(w) + gumbel)
        kth = jax.lax.top_k(score, min(self.fed_loss_num_classes, c))[0][-1]
        mask = is_gt | (score >= kth)
        if self._fed_pad_start is not None:
            # "cat" pad: the appended class range (e.g. stuff classes after the
            # LVIS vocabulary) is always part of the federated subset
            mask = mask | (jnp.arange(c) >= self._fed_pad_start)
        return mask

    def loss_boxes(self, outputs, targets, assign, num_boxes, panoptic=False):
        pred = outputs["pred_boxes"]  # (B, K, 4)
        matched = assign >= 0
        if panoptic and "is_thing" in targets:
            matched = matched & _gather_gt(targets["is_thing"], assign)
        gt = _gather_gt(targets["boxes"], assign)
        l1 = jnp.sum(jnp.abs(pred - gt), -1)
        # elementwise, NOT diagonal(pairwise): the pairwise intermediate is
        # O(K^2) and the encoder aux loss has K = all tokens (87k at 1024^2)
        giou = 1.0 - elementwise_generalized_box_iou(
            box_cxcywh_to_xyxy(pred), box_cxcywh_to_xyxy(gt)
        )
        m = matched.astype(pred.dtype)
        return {
            "loss_bbox": jnp.sum(l1 * m) / num_boxes,
            "loss_giou": jnp.sum(giou * m) / num_boxes,
        }

    def loss_pred_ious(self, outputs, targets, assign):
        """MSE between the (single-class) raw logit and the pred-box-vs-gt IoU
        over matched queries (deformable_criterion.py:293-313). Enc-only in the
        dispatch, like the reference (:539-541, :579-586 skip it for final/aux
        outputs and compute it on enc_outputs)."""
        matched = assign >= 0
        gt = _gather_gt(targets["boxes"], assign)
        iou, _ = elementwise_box_iou(
            box_cxcywh_to_xyxy(gt), box_cxcywh_to_xyxy(outputs["pred_boxes"])
        )
        logit = outputs["pred_logits"][..., 0]
        m = matched.astype(logit.dtype)
        err = (logit - iou) ** 2
        return {"loss_iou": jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)}

    def loss_anchor_ious(self, outputs, targets, assign):
        """MSE between the logit and the ANCHOR-vs-gt IoU
        (deformable_criterion.py:278-291). The reference reads the
        matcher_stage1 cost matrix (t["ious"][J, I], :569-573); recomputed
        elementwise here from enc_outputs["anchors"] — identical values."""
        matched = assign >= 0
        gt = _gather_gt(targets["boxes"], assign)
        iou, _ = elementwise_box_iou(
            box_cxcywh_to_xyxy(gt), box_cxcywh_to_xyxy(outputs["anchors"])
        )
        logit = outputs["pred_logits"][..., 0]
        m = matched.astype(logit.dtype)
        err = (logit - iou) ** 2
        return {"loss_iou": jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)}

    def loss_masks(self, outputs, targets, assign, num_boxes):
        if "pred_masks" not in outputs or "masks" not in targets:
            return {}
        pred = outputs["pred_masks"]  # (B, K, Hm, Wm) logits
        b, k, hm, wm = pred.shape
        gt = targets["masks"]
        if gt.shape[-2:] != (hm, wm):
            gt = jax.image.resize(gt, (*gt.shape[:-2], hm, wm), method="nearest")
        gt = _gather_gt(gt, assign)  # (B, K, Hm, Wm)
        matched = (assign >= 0).astype(pred.dtype)

        pf = pred.reshape(b, k, -1)
        gf = gt.reshape(b, k, -1).astype(pred.dtype)
        focal = sigmoid_focal_loss(pf, gf, self.alpha, self.gamma).mean(-1)  # (B, K)
        prob = jax.nn.sigmoid(pf)
        inter = jnp.sum(prob * gf, -1)
        dice = 1.0 - (2 * inter + 1.0) / (jnp.sum(prob, -1) + jnp.sum(gf, -1) + 1.0)
        return {
            "loss_mask": jnp.sum(focal * matched) / num_boxes,
            "loss_dice": jnp.sum(dice * matched) / num_boxes,
        }

    def loss_masks_maskdino(self, outputs, targets, assign, num_boxes, rng):
        """Point-sampled mask loss (deformable_criterion.py:424-490): sample
        ``mask_num_points`` per matched mask — 3x-oversampled random points,
        keep the 75% most UNCERTAIN (|logit| smallest, detrex
        calculate_uncertainty) plus 25% fresh random — then sigmoid CE + dice
        over the sampled points. Fixed shapes: up to ``mask_max_masks`` matched
        queries are compacted per image; invalid slots are masked out."""
        if "pred_masks" not in outputs or "masks" not in targets:
            return {}
        pred = outputs["pred_masks"]  # (B, K, Hm, Wm) logits
        b, k, hm, wm = pred.shape
        m = min(self.mask_max_masks, k)
        n = self.mask_num_points
        n_over = int(n * self.mask_oversample_ratio)
        n_imp = int(n * self.mask_importance_sample_ratio)
        n_rand = n - n_imp

        # compact matched query slots to M fixed slots (score = matched flag,
        # stable ties by index so selection is deterministic)
        matched = assign >= 0
        score = matched.astype(jnp.float32) - jnp.arange(k, dtype=jnp.float32)[None] * 1e-9
        _, sel = jax.lax.top_k(score, m)  # (B, M) query indices
        sel_valid = jnp.take_along_axis(matched, sel, axis=1)  # (B, M)
        pred_sel = jnp.take_along_axis(pred.reshape(b, k, -1), sel[..., None], axis=1)
        pred_sel = pred_sel.reshape(b, m, hm, wm)
        gt = _gather_gt(targets["masks"], assign)  # (B, K, Hg, Wg)
        gt_sel = jnp.take_along_axis(gt.reshape(b, k, -1), sel[..., None], axis=1)
        gt_sel = gt_sel.reshape(b, m, *gt.shape[-2:]).astype(pred.dtype)

        r1, r2 = jax.random.split(rng)
        pts = jax.random.uniform(r1, (b, m, n_over, 2))
        logits_o = _point_sample_bilinear(pred_sel, pts)  # (B, M, N_over)
        # uncertainty = -|logit| (calculate_uncertainty); top-k most uncertain
        _, imp_idx = jax.lax.top_k(-jnp.abs(logits_o), n_imp)
        imp_pts = jnp.take_along_axis(pts, imp_idx[..., None], axis=2)
        rand_pts = jax.random.uniform(r2, (b, m, n_rand, 2))
        coords = jnp.concatenate([imp_pts, rand_pts], axis=2)  # (B, M, N, 2)

        point_logits = _point_sample_bilinear(pred_sel, coords)  # (B, M, N)
        point_labels = _point_sample_bilinear(gt_sel, coords)
        point_labels = jax.lax.stop_gradient(point_labels)

        ce = _sigmoid_ce(point_logits, point_labels).mean(-1)  # (B, M)
        prob = jax.nn.sigmoid(point_logits)
        inter = jnp.sum(prob * point_labels, -1)
        dice = 1.0 - (2 * inter + 1.0) / (
            jnp.sum(prob, -1) + jnp.sum(point_labels, -1) + 1.0
        )
        mval = sel_valid.astype(pred.dtype)
        return {
            "loss_mask_maskdino": jnp.sum(ce * mval) / num_boxes,
            "loss_dice_maskdino": jnp.sum(dice * mval) / num_boxes,
        }

    # ------------------------------------------------------------------
    def match(self, rng, outputs, targets):
        """Final-layer assignment (B, K)."""
        if self.use_stage2:
            rngs = jax.random.split(rng, targets["boxes"].shape[0])
            return jax.vmap(
                lambda r, gb, gv, ref: stage2_assign(
                    r, gb, gv, ref, self.num_queries,
                    iou_thresh=self.stage2_iou_thresh, max_k=self.stage2_max_k,
                )
            )(rngs, targets["boxes"], targets["valid"], outputs["init_reference"])
        return jax.vmap(
            lambda lo, bx, gl, gb, gv: hungarian_match(
                lo, bx, gl, gb, gv, self.cost_class, self.cost_bbox, self.cost_giou
            )
        )(
            outputs["pred_logits"],
            outputs["pred_boxes"],
            targets["labels"],
            targets["boxes"],
            targets["valid"],
        )

    def __call__(
        self,
        rng: jax.Array,
        outputs: Dict,
        targets: Dict,
        num_boxes: jnp.ndarray,  # scalar, already all-reduced & clamped >= 1
        class_valid: Optional[jnp.ndarray] = None,  # (B, C) text/vocab validity
    ) -> Dict[str, jnp.ndarray]:
        r_match, r_fed, r_s1, r_mask = jax.random.split(rng, 4)
        # losses always compute in f32 even when the model runs bf16 compute
        # (AMP discipline — the reference's fp16 AMP likewise keeps the loss
        # in f32 through GradScaler; focal/GIoU in bf16 lose mantissa)
        outputs = jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.bfloat16
            else x,
            outputs,
        )
        if class_valid is None:
            class_valid = jnp.ones(outputs["pred_logits"].shape[::2], bool)

        assign = self.match(r_match, outputs, targets)
        losses = {}
        if "class" in self.losses:
            losses.update(
                self.loss_labels(outputs, targets, assign, num_boxes, class_valid, r_fed)
            )
        if "boxes" in self.losses:
            losses.update(self.loss_boxes(outputs, targets, assign, num_boxes))
        if "boxes_panoptic" in self.losses:
            losses.update(
                self.loss_boxes(outputs, targets, assign, num_boxes, panoptic=True)
            )
        if "masks_maskdino" in self.losses and self.mask_point_sample:
            losses.update(
                self.loss_masks_maskdino(outputs, targets, assign, num_boxes, r_mask)
            )
        elif "masks" in self.losses or "masks_maskdino" in self.losses:
            losses.update(self.loss_masks(outputs, targets, assign, num_boxes))

        for i, aux in enumerate(outputs.get("aux_outputs", [])):
            if not self.use_stage2:
                assign = self.match(r_match, aux, targets)
            if "class" in self.losses:
                l = self.loss_labels(aux, targets, assign, num_boxes, class_valid, r_fed)
                losses[f"loss_class_{i}"] = l["loss_class"]
            if "boxes" in self.losses or "boxes_panoptic" in self.losses:
                l = self.loss_boxes(
                    aux, targets, assign, num_boxes,
                    panoptic="boxes_panoptic" in self.losses,
                )
                losses[f"loss_bbox_{i}"] = l["loss_bbox"]
                losses[f"loss_giou_{i}"] = l["loss_giou"]
            if "masks_maskdino" in self.losses and self.mask_point_sample and "pred_masks" in aux:
                # reference aux loop skips "masks" but keeps masks_maskdino (:552-557)
                l = self.loss_masks_maskdino(aux, targets, assign, num_boxes, r_mask)
                losses[f"loss_mask_maskdino_{i}"] = l["loss_mask_maskdino"]
                losses[f"loss_dice_maskdino_{i}"] = l["loss_dice_maskdino"]
            elif ("masks" in self.losses or "masks_maskdino" in self.losses) and "pred_masks" in aux:
                l = self.loss_masks(aux, targets, assign, num_boxes)
                losses[f"loss_mask_{i}"] = l["loss_mask"]
                losses[f"loss_dice_{i}"] = l["loss_dice"]

        if "enc_outputs" in outputs:
            enc = outputs["enc_outputs"]
            bin_targets = dict(targets, labels=jnp.zeros_like(targets["labels"]))
            bin_targets.pop("is_thing", None)
            if self.use_stage1:
                rngs = jax.random.split(r_s1, targets["boxes"].shape[0])
                enc_assign = jax.vmap(
                    lambda r, gb, gv, an, av: stage1_assign(
                        r, gb, gv, an, av,
                        t_low=self.stage1_t_low, t_high=self.stage1_t_high,
                        max_k=self.stage1_max_k,
                    )
                )(rngs, targets["boxes"], targets["valid"], enc["anchors"], enc["valid"])
            else:
                enc_assign = self.match(r_match, enc, bin_targets)
            enc_class_valid = jnp.ones(enc["pred_logits"].shape[::2], bool)
            l = self.loss_labels(
                enc, bin_targets, enc_assign, num_boxes, enc_class_valid, r_fed
            )
            losses["loss_class_enc"] = l["loss_class"]
            l = self.loss_boxes(enc, bin_targets, enc_assign, num_boxes)
            losses["loss_bbox_enc"] = l["loss_bbox"]
            losses["loss_giou_enc"] = l["loss_giou"]
            # iou regression losses are enc-only (reference skips them for
            # final/aux outputs, :539-541, and runs them here, :579-586)
            if "pred_iou" in self.losses:
                losses["loss_iou_enc"] = self.loss_pred_ious(
                    enc, bin_targets, enc_assign
                )["loss_iou"]
            elif "anchor_iou" in self.losses:
                losses["loss_iou_enc"] = self.loss_anchor_ious(
                    enc, bin_targets, enc_assign
                )["loss_iou"]

        return losses

    def total(self, losses: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Weighted sum using weight_dict with _{i}/_enc fan-out."""
        total = 0.0
        for k, v in losses.items():
            base = k
            for suffix in ("_enc",) + tuple(f"_{i}" for i in range(20)):
                if k.endswith(suffix):
                    base = k[: -len(suffix)]
                    break
            w = self.weight_dict.get(base, self.weight_dict.get(k, 1.0))
            total = total + w * v
        return total


def default_weight_dict(
    class_weight=1.0, bbox_weight=5.0, giou_weight=2.0, mask_weight=5.0, dice_weight=5.0
):
    """Criterion weights as configured in ape_deta_r50.py:139-147."""
    return {
        "loss_class": class_weight,
        "loss_bbox": bbox_weight,
        "loss_giou": giou_weight,
        "loss_mask": mask_weight,
        "loss_dice": dice_weight,
    }
