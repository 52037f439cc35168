"""Fixed-shape greedy NMS on device.

Capability match: ``torchvision.ops.batched_nms`` as used by the reference for
DETA first-stage proposal selection (ape/modeling/ape_deta/deformable_transformer_vl.py:569-633),
eval-time box selection (deformable_detr.py:552-606) and fast_rcnn_inference.

TPU-first design: everything is static-shape. Invalid entries carry -inf scores.
Greedy NMS is computed exactly with a sequential `lax.fori_loop` whose body is a
vectorized O(N) suppression update (no N×N materialized matrix), so memory is
O(N) and the loop compiles to a tight on-device program. Class-aware NMS uses
the coordinate-offset trick so one kernel serves both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def _iou_one_vs_all(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one xyxy box (4,) against (N, 4)."""
    area1 = jnp.clip(box[2] - box[0], 0) * jnp.clip(box[3] - box[1], 0)
    areas = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[:, 0] * wh[:, 1]
    return inter / jnp.maximum(area1 + areas - inter, 1e-9)


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Exact greedy NMS. boxes (N,4) xyxy, scores (N,). Returns bool keep mask (N,).

    Entries with ``valid == False`` (or score == NEG_INF) are never kept.
    """
    n = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)  # descending
    boxes_s = boxes[order]
    scores_s = scores[order]
    alive0 = scores_s > NEG_INF / 2

    def body(i, state):
        alive, kept = state
        is_kept = alive[i]
        kept = kept.at[i].set(is_kept)
        iou = _iou_one_vs_all(boxes_s[i], boxes_s)
        idx = jnp.arange(n)
        suppress = is_kept & (iou > iou_threshold) & (idx > i)
        alive = alive & ~suppress
        return alive, kept

    _, kept_sorted = jax.lax.fori_loop(
        0, n, body, (alive0, jnp.zeros((n,), dtype=bool))
    )
    # scatter back to original order
    keep = jnp.zeros((n,), dtype=bool).at[order].set(kept_sorted)
    return keep


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Class-aware NMS via the coordinate-offset trick (torchvision-compatible)."""
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool)
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = idxs.astype(boxes.dtype) * (2.0 * max_coord)
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold, valid)


def nms_topk(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    k: int,
    idxs: jnp.ndarray | None = None,
    valid: jnp.ndarray | None = None,
):
    """NMS then fixed-size top-k. Returns (indices (k,), scores (k,), valid (k,)).

    Suppressed/invalid slots get NEG_INF scores and valid=False.
    """
    if idxs is None:
        keep = nms_mask(boxes, scores, iou_threshold, valid)
    else:
        keep = batched_nms_mask(boxes, scores, idxs, iou_threshold, valid)
    masked = jnp.where(keep, scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(masked, k)
    return top_idx, top_scores, top_scores > NEG_INF / 2
