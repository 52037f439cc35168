"""Tests for box ops and fixed-shape NMS against simple numpy oracles."""

import numpy as np

import jax.numpy as jnp

from ape_tpu.ops import (
    batched_nms_mask,
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    generalized_box_iou,
    masks_to_boxes,
    nms_mask,
    nms_topk,
)
from ape_tpu.ops.misc import inverse_sigmoid, sigmoid_focal_loss


def rand_boxes(rng, n):
    xy = rng.rand(n, 2) * 50
    wh = rng.rand(n, 2) * 30 + 1
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def np_iou(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None] - inter
    return inter / union, union


def np_giou(a, b):
    iou, union = np_iou(a, b)
    lt = np.minimum(a[:, None, :2], b[None, :, :2])
    rb = np.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def np_greedy_nms(boxes, scores, thresh):
    """Straightforward O(N^2) greedy NMS oracle (torchvision semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep, suppressed = [], np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        iou, _ = np_iou(boxes[i : i + 1], boxes)
        suppressed |= iou[0] > thresh
    return np.array(keep)


def test_box_conversions_roundtrip(rng):
    b = rand_boxes(rng, 17)
    out = np.asarray(box_cxcywh_to_xyxy(box_xyxy_to_cxcywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, rtol=1e-5, atol=1e-5)


def test_iou_giou_vs_numpy(rng):
    a, b = rand_boxes(rng, 9), rand_boxes(rng, 7)
    iou, _ = box_iou(jnp.asarray(a), jnp.asarray(b))
    ref, _ = np_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou), ref, rtol=1e-5, atol=1e-6)
    giou = generalized_box_iou(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(giou), np_giou(a, b), rtol=1e-4, atol=1e-5)


def test_nms_vs_numpy(rng):
    boxes = rand_boxes(rng, 64)
    scores = rng.rand(64).astype(np.float32)
    keep_ref = np_greedy_nms(boxes, scores, 0.5)
    mask = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert set(np.nonzero(mask)[0]) == set(keep_ref)


def test_batched_nms_vs_numpy(rng):
    boxes = rand_boxes(rng, 48)
    scores = rng.rand(48).astype(np.float32)
    idxs = rng.randint(0, 4, size=48)
    # oracle: run per-class independently
    keep_ref = set()
    for c in range(4):
        sel = np.nonzero(idxs == c)[0]
        if len(sel):
            keep_ref |= set(sel[np_greedy_nms(boxes[sel], scores[sel], 0.4)])
    mask = np.asarray(
        batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), 0.4)
    )
    assert set(np.nonzero(mask)[0]) == keep_ref


def test_nms_respects_validity(rng):
    boxes = rand_boxes(rng, 16)
    scores = rng.rand(16).astype(np.float32)
    valid = np.zeros(16, dtype=bool)
    valid[:4] = True
    idx, sc, ok = nms_topk(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 8, valid=jnp.asarray(valid)
    )
    ok = np.asarray(ok)
    assert ok.sum() <= 4
    assert set(np.asarray(idx)[ok]).issubset(set(range(4)))


def test_masks_to_boxes():
    m = np.zeros((2, 10, 12), dtype=np.float32)
    m[0, 2:5, 3:9] = 1
    out = np.asarray(masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_allclose(out[0], [3, 2, 9, 5])
    np.testing.assert_allclose(out[1], [0, 0, 0, 0])


def test_inverse_sigmoid_roundtrip():
    x = jnp.asarray(np.linspace(0.01, 0.99, 13, dtype=np.float32))
    y = 1 / (1 + np.exp(-np.asarray(inverse_sigmoid(x))))
    np.testing.assert_allclose(y, np.asarray(x), rtol=1e-4)


def test_focal_loss_vs_torch(rng):
    import torch
    import torch.nn.functional as F

    logits = rng.randn(5, 7).astype(np.float32)
    targets = (rng.rand(5, 7) > 0.5).astype(np.float32)
    lt, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    p = torch.sigmoid(lt)
    ce = F.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p_t = p * tt + (1 - p) * (1 - tt)
    ref = (0.25 * tt + 0.75 * (1 - tt)) * ce * (1 - p_t) ** 2
    out = np.asarray(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(out, ref.numpy(), rtol=1e-4, atol=1e-6)


def test_parallel_nms_matches_sequential(rng):
    """Tiled parallel NMS is exact greedy (fuzz vs the one-box-per-step oracle)."""
    import jax.numpy as jnp

    from ape_tpu.ops.nms import nms_mask, nms_mask_sequential

    for trial in range(8):
        n = int(rng.choice([1, 5, 37, 200, 513]))
        centers = rng.randn(n, 2) * rng.choice([0.5, 2.0, 10.0])
        wh = np.abs(rng.randn(n, 2)) * 3 + 0.5
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(
            np.float32
        )
        scores = rng.rand(n).astype(np.float32)
        valid = rng.rand(n) > 0.1
        for thr in (0.3, 0.9):
            a = np.asarray(
                nms_mask(
                    jnp.asarray(boxes),
                    jnp.asarray(scores),
                    thr,
                    valid=jnp.asarray(valid),
                    tile=64,
                )
            )
            b = np.asarray(
                nms_mask_sequential(
                    jnp.asarray(boxes), jnp.asarray(scores), thr, valid=jnp.asarray(valid)
                )
            )
            assert (a == b).all(), (trial, thr, n)
