"""Fixed-shape matchers/assigners for DETA training.

Capability match: /root/reference/ape/modeling/ape_deta/assigner.py
  * Matcher (threshold-stratified, allow_low_quality_matches) :23-130
  * subsample_labels :132-174, sample_topk_per_gt :177-186
  * Stage2Assigner (IoU>=0.6 vs init_reference, 25% positive cap, k<=4/gt) :189-284
  * Stage1Assigner (IoU [t_low, t_high] vs anchors, 256/img, 50% pos) :287-364
and detrex HungarianMatcher (focal class cost + L1 + GIoU).

TPU-first: assignments are dense arrays ``assign_gt: (K,) int32`` (gt index or
-1) over padded GT slots with validity masks — no ragged index lists. The
Hungarian matcher is an on-device auction algorithm (eps-scaled, near-optimal)
running under `lax.while_loop`; random subsampling uses explicit PRNG keys.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ape_tpu.ops.box_ops import box_cxcywh_to_xyxy, box_iou, generalized_box_iou

NEG = -1e9


def threshold_match(
    iou: jnp.ndarray,  # (G, K) with invalid gt rows = -1
    gt_valid: jnp.ndarray,  # (G,)
    thresholds: Tuple[float, ...],
    labels: Tuple[int, ...],
    allow_low_quality: bool = True,
):
    """detectron2-style Matcher. Returns (matched_idx (K,), label (K,) in {-1,0,1})."""
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_idx = jnp.argmax(iou, axis=0)  # (K,)
    matched_val = jnp.max(iou, axis=0)

    label = jnp.full(iou.shape[1], labels[0], jnp.int32)
    lo = -jnp.inf
    for t, lab in zip(thresholds + (jnp.inf,), labels):
        label = jnp.where((matched_val >= lo) & (matched_val < t), lab, label)
        lo = t
    # last bucket
    label = jnp.where(matched_val >= lo, labels[-1], label) if False else label
    # (loop above already covers all buckets: len(labels) == len(thresholds)+1)

    if allow_low_quality:
        gt_best = jnp.max(iou, axis=1, keepdims=True)  # (G, 1)
        lq = jnp.any((iou == gt_best) & gt_valid[:, None] & (gt_best > 0), axis=0)
        label = jnp.where(lq, 1, label)
    no_gt = ~jnp.any(gt_valid)
    label = jnp.where(no_gt, 0, label)
    return matched_idx, label


def _threshold_labels(matched_val, thresholds, labels):
    label = jnp.full(matched_val.shape, labels[0], jnp.int32)
    bounds = (-jnp.inf,) + tuple(thresholds) + (jnp.inf,)
    for i, lab in enumerate(labels):
        label = jnp.where(
            (matched_val >= bounds[i]) & (matched_val < bounds[i + 1]), lab, label
        )
    return label


def subsample_positives(
    rng: jax.Array, pos_mask: jnp.ndarray, max_pos: int
) -> jnp.ndarray:
    """Randomly keep at most max_pos True entries (subsample_labels semantics)."""
    k = pos_mask.shape[0]
    noise = jax.random.uniform(rng, (k,))
    score = jnp.where(pos_mask, noise, -1.0)
    thresh_idx = jnp.minimum(max_pos, jnp.sum(pos_mask.astype(jnp.int32)))
    order = jnp.argsort(-score)
    rank = jnp.zeros(k, jnp.int32).at[order].set(jnp.arange(k, dtype=jnp.int32))
    return pos_mask & (rank < thresh_idx)


def topk_per_gt(
    assign_gt: jnp.ndarray,  # (K,) gt index or -1
    iou: jnp.ndarray,  # (G, K)
    k: int,
) -> jnp.ndarray:
    """Keep at most k proposals per gt, highest IoU first (sample_topk_per_gt)."""
    g = iou.shape[0]
    k = min(k, iou.shape[1])
    mine = jax.nn.one_hot(assign_gt, g, dtype=bool, axis=0)  # (G, K); -1 -> all False
    scores = jnp.where(mine, iou, NEG)  # (G, K)
    kth = jax.lax.top_k(scores, k)[0][:, -1:]  # (G, 1) k-th best per gt
    keep = mine & (scores >= kth) & (scores > NEG / 2)
    return jnp.where(jnp.any(keep, axis=0), assign_gt, -1)


def stage2_assign(
    rng: jax.Array,
    gt_boxes: jnp.ndarray,  # (G, 4) cxcywh
    gt_valid: jnp.ndarray,  # (G,)
    init_reference: jnp.ndarray,  # (K, 4) cxcywh (detached)
    num_queries: int,
    positive_fraction: float = 0.25,
    iou_thresh: float = 0.6,
    max_k: int = 4,
) -> jnp.ndarray:
    """Stage2Assigner for one image -> assign_gt (K,) int32 (gt idx or -1)."""
    iou, _ = box_iou(box_cxcywh_to_xyxy(gt_boxes), box_cxcywh_to_xyxy(init_reference))
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_idx, label = threshold_match(
        iou, gt_valid, thresholds=(iou_thresh,), labels=(0, 1), allow_low_quality=True
    )
    pos = label == 1
    pos = subsample_positives(rng, pos, int(num_queries * positive_fraction))
    assign = jnp.where(pos, matched_idx, -1)
    return topk_per_gt(assign, iou, max_k)


def stage1_assign(
    rng: jax.Array,
    gt_boxes: jnp.ndarray,  # (G, 4) cxcywh
    gt_valid: jnp.ndarray,  # (G,)
    anchors: jnp.ndarray,  # (S, 4) cxcywh
    anchor_valid: jnp.ndarray,  # (S,)
    t_low: float = 0.3,
    t_high: float = 0.7,
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
    max_k: int = 4,
) -> jnp.ndarray:
    """Stage1Assigner for one image -> assign_gt (S,) int32."""
    iou, _ = box_iou(box_cxcywh_to_xyxy(gt_boxes), box_cxcywh_to_xyxy(anchors))
    iou = jnp.where(gt_valid[:, None] & anchor_valid[None, :], iou, -1.0)
    matched_idx = jnp.argmax(iou, axis=0)
    matched_val = jnp.max(iou, axis=0)
    label = _threshold_labels(matched_val, (t_low, t_high), (0, -1, 1))
    gt_best = jnp.max(iou, axis=1, keepdims=True)
    lq = jnp.any((iou == gt_best) & gt_valid[:, None] & (gt_best > 0), axis=0)
    label = jnp.where(lq & anchor_valid, 1, label)
    pos = (label == 1) & anchor_valid
    pos = subsample_positives(
        rng, pos, int(batch_size_per_image * positive_fraction)
    )
    assign = jnp.where(pos, matched_idx, -1)
    assign = topk_per_gt(assign, iou, max_k)
    return jnp.where(jnp.any(gt_valid), assign, -1)


# ---------------------------------------------------------------------------
# Hungarian matcher (auction algorithm, on device)
# ---------------------------------------------------------------------------

def focal_class_cost(
    logits: jnp.ndarray, gt_labels: jnp.ndarray, alpha: float = 0.25, gamma: float = 2.0
) -> jnp.ndarray:
    """detrex focal_loss_cost: (K, C) logits x (G,) labels -> (K, G)."""
    p = jax.nn.sigmoid(logits)
    neg = (1 - alpha) * p**gamma * (-jnp.log(jnp.clip(1 - p, 1e-8)))
    pos = alpha * (1 - p) ** gamma * (-jnp.log(jnp.clip(p, 1e-8)))
    cost = pos - neg  # (K, C)
    return cost[:, gt_labels]  # (K, G)


def hungarian_cost_matrix(
    pred_logits: jnp.ndarray,  # (K, C)
    pred_boxes: jnp.ndarray,  # (K, 4) cxcywh
    gt_labels: jnp.ndarray,  # (G,)
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_valid: jnp.ndarray,  # (G,)
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
) -> jnp.ndarray:
    cc = focal_class_cost(pred_logits, gt_labels)
    cb = jnp.sum(jnp.abs(pred_boxes[:, None, :] - gt_boxes[None, :, :]), -1)
    cg = -generalized_box_iou(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(gt_boxes)
    )
    cost = cost_class * cc + cost_bbox * cb + cost_giou * cg
    return jnp.where(gt_valid[None, :], cost, 1e6)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def auction_assign(
    cost: jnp.ndarray,  # (K, G) lower = better; K >= G
    gt_valid: jnp.ndarray,  # (G,)
    eps: float = 1e-3,
    num_iters: int = 2000,
) -> jnp.ndarray:
    """Near-optimal linear assignment via the auction algorithm.

    Each valid gt (bidder) wants the proposal minimizing cost - price. Returns
    assign_gt (K,) int32 (gt index or -1). Within G*eps of the optimum.
    """
    k, g = cost.shape
    benefit = -cost.T  # (G, K) higher = better

    def body(state):
        prices, owner, _ = state  # (K,), (K,) int32 owner gt or -1
        # who is unassigned? a gt with no owned proposal
        owned = jax.nn.one_hot(owner, g, dtype=jnp.float32)  # (K, G)
        has = jnp.sum(owned, axis=0) > 0  # (G,)
        unassigned = gt_valid & ~has
        bidder = jnp.argmax(unassigned)  # first unassigned gt
        any_unassigned = jnp.any(unassigned)

        values = benefit[bidder] - prices  # (K,)
        best = jnp.argmax(values)
        v1 = values[best]
        values2 = values.at[best].set(-jnp.inf)
        v2 = jnp.max(values2)
        bid = prices[best] + (v1 - v2) + eps

        prices = jnp.where(any_unassigned, prices.at[best].set(bid), prices)
        owner = jnp.where(any_unassigned, owner.at[best].set(bidder), owner)
        return prices, owner, any_unassigned

    def cond(state):
        return state[2]

    prices0 = jnp.zeros((k,))
    owner0 = jnp.full((k,), -1, jnp.int32)
    # bounded while loop: auction converges in O(G * max_benefit/eps) worst case;
    # cap iterations for compile-time safety
    def scan_body(state, _):
        new_state = jax.lax.cond(state[2], body, lambda s: s, state)
        return new_state, None

    state = (prices0, owner0, jnp.array(True))
    state, _ = jax.lax.scan(scan_body, state, None, length=num_iters)
    return state[1]


def hungarian_match(
    pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid,
    cost_class=2.0, cost_bbox=5.0, cost_giou=2.0,
):
    """One image -> assign_gt (K,) int32."""
    cost = hungarian_cost_matrix(
        pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid,
        cost_class, cost_bbox, cost_giou,
    )
    return auction_assign(cost, gt_valid)
