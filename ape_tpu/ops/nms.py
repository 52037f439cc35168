"""Fixed-shape greedy NMS on device — tiled parallel formulation.

Capability match: ``torchvision.ops.batched_nms`` as used by the reference for
DETA first-stage proposal selection (ape/modeling/ape_deta/deformable_transformer_vl.py:569-633),
eval-time box selection (deformable_detr.py:552-606) and fast_rcnn_inference.

TPU-first design: everything is static-shape, and the greedy recurrence is
restructured so the sequential depth is N/tile instead of N (the round-1
one-box-per-step loop cost ~0.05 s at the 4k-proposal scale):

  * boxes are sorted by score once; tiles of T boxes are finalized in order;
  * within a tile, exact greedy is reached by a confirmed-set fixpoint: a box
    with no surviving potential suppressor is definitely kept, boxes
    suppressed by definitely-kept boxes are definitely eliminated — each
    iteration decides at least the earliest undecided box, so it terminates in
    <= T iterations (typically ~3) and provably equals sequential greedy;
  * each finalized tile suppresses all later boxes with one vectorized
    (T x N) IoU pass.

Class-aware NMS uses the coordinate-offset trick so one kernel serves both.
The one-box-per-step loop is kept as ``nms_mask_sequential`` — the oracle the
parallel version is tested against.
"""

from __future__ import annotations

import functools

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


def _iou_tile_vs_all(tile_boxes: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of (T, 4) against (N, 4) -> (T, N)."""
    a_t = jnp.clip(tile_boxes[:, 2] - tile_boxes[:, 0], 0) * jnp.clip(
        tile_boxes[:, 3] - tile_boxes[:, 1], 0
    )
    a_n = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lt = jnp.maximum(tile_boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(tile_boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(a_t[:, None] + a_n[None, :] - inter, 1e-9)


def _greedy_fixpoint(alive: jnp.ndarray, sup: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy keep-mask within one tile.

    ``sup[j, k]`` True iff earlier box j would suppress later box k (strict
    upper-triangular by construction). Confirmed-set iteration: kept grows,
    eliminated grows, at least one box is decided per iteration.
    """
    t = alive.shape[0]

    def cond(state):
        kept, elim, it = state
        return jnp.any(alive & ~kept & ~elim) & (it < t)

    def body(state):
        kept, elim, it = state
        undecided = alive & ~kept & ~elim
        potential = kept | undecided
        has_pot_sup = jnp.any(sup & potential[:, None], axis=0)
        kept = kept | (undecided & ~has_pot_sup)
        sup_by_kept = jnp.any(sup & kept[:, None], axis=0)
        elim = elim | (alive & sup_by_kept)
        return kept, elim, it + 1

    kept, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((t,), bool), ~alive, jnp.int32(0))
    )
    return kept


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
    tile: int = 256,
) -> jnp.ndarray:
    """Exact greedy NMS. boxes (N,4) xyxy, scores (N,). Returns bool keep mask (N,).

    Entries with ``valid == False`` (or score == NEG_INF) are never kept.
    """
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=bool)
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores, stable=True)  # descending, ties by index
    t = min(tile, max(8, n))
    pad = (-n) % t
    boxes_s = jnp.pad(boxes[order], ((0, pad), (0, 0)))
    alive0 = jnp.pad(scores[order] > NEG_INF / 2, (0, pad))
    np_ = n + pad
    num_tiles = np_ // t
    idx_all = jnp.arange(np_)

    def tile_body(i, state):
        alive, kept = state
        start = i * t
        tb = jax.lax.dynamic_slice(boxes_s, (start, 0), (t, 4))
        iou = _iou_tile_vs_all(tb, boxes_s)  # (T, Np)
        m = jax.lax.dynamic_slice(iou, (0, start), (t, t))
        tri = jnp.triu(jnp.ones((t, t), bool), k=1)
        alive_t = jax.lax.dynamic_slice(alive, (start,), (t,))
        kept_t = _greedy_fixpoint(alive_t, tri & (m > iou_threshold))
        kept = jax.lax.dynamic_update_slice(kept, kept_t, (start,))
        # vectorized suppression of everything after this tile
        sup_later = jnp.any(kept_t[:, None] & (iou > iou_threshold), axis=0)
        alive = alive & ~(sup_later & (idx_all >= start + t))
        return alive, kept

    _, kept_sorted = jax.lax.fori_loop(
        0, num_tiles, tile_body, (alive0, jnp.zeros((np_,), bool))
    )
    keep = jnp.zeros((n,), dtype=bool).at[order].set(kept_sorted[:n])
    return keep


def nms_mask_sequential(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One-box-per-step greedy NMS — the oracle for ``nms_mask``."""
    n = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores, stable=True)
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
