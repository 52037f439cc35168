"""Box utilities (reference capability: ape/utils/box_ops.py:18-71, detrex box ops).

All functions are pure jnp, shape-polymorphic over leading dims, and safe under jit.
Boxes are either ``cxcywh`` (normalized center format used inside the DETR decoder)
or ``xyxy`` (absolute corners used by the data pipeline / evaluators).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; shape (..., 4) -> (...)."""
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0) * jnp.clip(
        boxes[..., 3] - boxes[..., 1], 0
    )


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU of xyxy boxes: (..., N, 4) x (..., M, 4) -> (..., N, M).

    Returns (iou, union) like the reference so GIoU can reuse the union.
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU of xyxy boxes (Rezatofighi et al.)."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-9)


def elementwise_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise IoU of aligned xyxy boxes: (..., 4) x (..., 4) -> (...)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / jnp.maximum(union, 1e-9), union


def elementwise_generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise GIoU of aligned xyxy boxes: (..., 4) x (..., 4) -> (...).

    Same math as diagonal(generalized_box_iou(...)) without the O(N^2)
    pairwise intermediate — the pairwise+diagonal form materializes an (N, N)
    matrix in the VJP (measured: a 21824-token aux-loss backward allocated
    2x 3.56 GB at 512^2 and OOM'd HBM)."""
    iou, union = elementwise_box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-9)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Tight xyxy boxes around binary masks (reference: box_ops.masks_to_boxes).

    masks: (..., H, W) bool/float -> (..., 4). Empty masks give zeros.
    """
    h, w = masks.shape[-2:]
    m = masks > 0.5
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    any_x = jnp.any(m, axis=-2)  # (..., W)
    any_y = jnp.any(m, axis=-1)  # (..., H)
    big = 1e8
    x0 = jnp.min(jnp.where(any_x, xs, big), axis=-1)
    x1 = jnp.max(jnp.where(any_x, xs + 1, -big), axis=-1)
    y0 = jnp.min(jnp.where(any_y, ys, big), axis=-1)
    y1 = jnp.max(jnp.where(any_y, ys + 1, -big), axis=-1)
    empty = ~jnp.any(any_x, axis=-1)
    boxes = jnp.stack([x0, y0, x1, y1], axis=-1)
    return jnp.where(empty[..., None], 0.0, boxes)
