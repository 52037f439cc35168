"""Inference postprocessing — device-side, fixed shape.

Capability match:
  * instance: fast_rcnn_inference (ape/modeling/ape_deta/fast_rcnn.py:40-160) —
    score threshold -> per-class NMS -> top-k, preceded by the thing-class
    slice/mask routing of deformable_detr_segm_vl.py:574-626
  * semantic: get_stuff_score + softmax(sigmoid/T) transform + einsum qc,qhw->chw
    (segm_vl.py:874-918)
  * panoptic scoring (segm_vl.py:920-998) — the argmax/merge loop itself is
    host-side (ape_tpu/evaluation), this module provides the device tensors.

TPU-first: the (K x T) score matrix is pre-top-k'd to a fixed candidate count
before the exact greedy NMS, everything stays masked fixed-shape; mask ROI
cropping (BitMasks.crop_and_resize) happens on host at eval time.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ape_tpu.ops.box_ops import box_cxcywh_to_xyxy
from ape_tpu.ops.nms import NEG_INF, batched_nms_mask


def instance_inference(
    logits: jnp.ndarray,  # (K, T)
    boxes: jnp.ndarray,  # (K, 4) cxcywh normalized
    image_size: jnp.ndarray,  # (2,) valid (h, w) in input pixels
    class_valid: jnp.ndarray,  # (T,)
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    topk: int = 300,
    pre_nms: int = 2000,
    use_sigmoid: bool = True,
):
    """Returns dict of fixed-shape arrays:
    boxes (topk, 4) xyxy in input pixels, scores/classes/query_idx (topk,), valid (topk,).
    """
    k, t = logits.shape
    scores = jax.nn.sigmoid(logits) if use_sigmoid else logits
    scores = jnp.where(class_valid[None, :], scores, 0.0)

    h = image_size[0].astype(jnp.float32)
    w = image_size[1].astype(jnp.float32)
    bx = box_cxcywh_to_xyxy(boxes) * jnp.stack([w, h, w, h])
    bx = jnp.clip(bx, 0.0, jnp.stack([w, h, w, h]))

    flat = scores.reshape(-1)  # (K*T,)
    keep0 = flat > score_thresh
    cand_scores, cand_idx = jax.lax.top_k(jnp.where(keep0, flat, NEG_INF), min(pre_nms, k * t))
    cand_valid = cand_scores > NEG_INF / 2
    cand_q = cand_idx // t
    cand_c = cand_idx % t
    cand_boxes = bx[cand_q]

    sel, sel_scores, sel_valid = _nms_topk(
        cand_boxes, cand_scores, cand_c, cand_valid, nms_thresh, topk
    )
    return {
        "boxes": cand_boxes[sel],
        "scores": jnp.where(sel_valid, sel_scores, 0.0),
        "classes": cand_c[sel],
        "query_idx": cand_q[sel],
        "valid": sel_valid,
    }


def _nms_topk(boxes, scores, classes, valid, thresh, topk):
    keep = batched_nms_mask(boxes, scores, classes, thresh, valid=valid)
    masked = jnp.where(keep, scores, NEG_INF)
    k = min(topk, masked.shape[0])  # fewer candidates than slots: pad below
    top_scores, top_idx = jax.lax.top_k(masked, k)
    if k < topk:
        top_scores = jnp.concatenate([top_scores, jnp.full(topk - k, NEG_INF)])
        top_idx = jnp.concatenate([top_idx, jnp.zeros(topk - k, top_idx.dtype)])
    return top_idx, top_scores, top_scores > NEG_INF / 2


def semantic_inference(
    logits: jnp.ndarray,  # (K, T)
    mask_logits: jnp.ndarray,  # (K, Hm, Wm)
    class_valid: jnp.ndarray,  # (T,)
    pano_temp: float = 0.06,
    transform_eval: bool = True,
) -> jnp.ndarray:
    """Per-class semantic probability maps (T, Hm, Wm) at mask-feature resolution."""
    cls = jax.nn.sigmoid(logits)
    cls = jnp.where(class_valid[None, :], cls, 0.0)
    if transform_eval:
        cls = jax.nn.softmax(
            jnp.where(class_valid[None, :], cls / pano_temp, -jnp.inf), axis=-1
        )
    masks = jax.nn.sigmoid(mask_logits)
    return jnp.einsum("qc,qhw->chw", cls, masks)


def panoptic_scores(
    logits: jnp.ndarray,  # (K, T)
    class_valid: jnp.ndarray,  # (T,)
    pano_temp: float = 0.06,
    transform_eval: bool = True,
):
    """Device half of panoptic inference: per-query (score, label) under the
    softmax(sigmoid/T) transform, plus the raw sigmoid max for thresholding."""
    sig = jax.nn.sigmoid(logits)
    sig = jnp.where(class_valid[None, :], sig, 0.0)
    raw_scores = jnp.max(sig, axis=-1)
    if transform_eval:
        tr = jax.nn.softmax(
            jnp.where(class_valid[None, :], sig / pano_temp, -jnp.inf), axis=-1
        )
        scores = jnp.max(tr, axis=-1)
        labels = jnp.argmax(tr, axis=-1)
    else:
        scores = raw_scores
        labels = jnp.argmax(sig, axis=-1)
    return scores, labels, raw_scores


def get_stuff_score(
    logits: jnp.ndarray,  # (K, T)
    thing_mask: jnp.ndarray,  # (T,) True where class is a "thing"
    stuff_prob_thing: float = -1.0,
):
    """Stuff-score routing (segm_vl.py:1243-1270): things collapse to one
    'things' channel when the metadata marks an explicit thing/stuff split."""
    sig = jax.nn.sigmoid(logits)
    thing_scores = jnp.where(thing_mask[None, :], sig, 0.0)
    stuff_scores = jnp.where(~thing_mask[None, :], sig, 0.0)
    if stuff_prob_thing > 0:
        thing_collapsed = jnp.full_like(sig[:, :1], stuff_prob_thing)
    else:
        thing_collapsed = jnp.max(thing_scores, axis=-1, keepdims=True)
    return jnp.concatenate([thing_collapsed, stuff_scores], axis=-1)
