"""pred_iou / anchor_iou enc-stage regression losses.

Reference: /root/reference/ape/modeling/ape_deta/deformable_criterion.py
  * loss_anchor_ious (:278-291) — MSE(logit, IoU(anchor, gt)) over matched
  * loss_pred_ious (:293-313) — MSE(logit, IoU(pred_box, gt)) over matched
  * both skipped for final/aux outputs, computed on enc_outputs (:539-586)
"""

import jax
import jax.numpy as jnp
import numpy as np

from ape_tpu.modeling.ape_deta.criterion import (
    DeformableCriterion,
    default_weight_dict,
)


def _crit(losses):
    wd = default_weight_dict()
    wd["loss_iou"] = 1.0
    return DeformableCriterion(
        num_classes=1, weight_dict=wd, losses=losses, num_queries=4,
        use_stage2=True, use_stage1=True,
    )


def _outputs_targets():
    k = 4
    boxes = jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]]])  # (1,2,4)
    targets = {
        "labels": jnp.zeros((1, 2), jnp.int32),
        "boxes": boxes,
        "valid": jnp.ones((1, 2), bool),
    }
    pred_boxes = jnp.asarray(
        [[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.25, 0.25], [0.1, 0.1, 0.1, 0.1],
          [0.9, 0.9, 0.1, 0.1]]]
    )
    outputs = {
        "pred_logits": jnp.full((1, k, 1), 0.5),
        "pred_boxes": pred_boxes,
        "init_reference": pred_boxes,
    }
    enc = {
        "pred_logits": jnp.full((1, k, 1), 0.25),
        "pred_boxes": pred_boxes,
        "anchors": jnp.asarray(
            [[[0.3, 0.3, 0.4, 0.4], [0.7, 0.7, 0.2, 0.2], [0.1, 0.1, 0.1, 0.1],
              [0.9, 0.9, 0.1, 0.1]]]
        ),
        "valid": jnp.ones((1, k), bool),
    }
    return dict(outputs, enc_outputs=enc), targets


def _manual_mse(logit, ious, matched):
    err = (logit - ious) ** 2
    return float(np.sum(err * matched) / max(matched.sum(), 1))


def test_pred_iou_matches_manual():
    c = _crit(("class", "boxes", "pred_iou"))
    outputs, targets = _outputs_targets()
    assign = jnp.asarray([[0, 1, -1, -1]], jnp.int32)
    got = c.loss_pred_ious(outputs["enc_outputs"], targets, assign)["loss_iou"]
    # manual: q0 exact match -> iou 1; q1 0.2x0.2 gt vs 0.25x0.25 pred, same
    # center -> inter 0.04, union 0.0625 -> 0.64
    want = _manual_mse(0.25, np.asarray([1.0, 0.64]), np.ones(2))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_anchor_iou_uses_anchors():
    c = _crit(("class", "boxes", "anchor_iou"))
    outputs, targets = _outputs_targets()
    assign = jnp.asarray([[0, 1, -1, -1]], jnp.int32)
    got = c.loss_anchor_ious(outputs["enc_outputs"], targets, assign)["loss_iou"]
    # anchor0 0.4^2 centered on gt0 0.2^2: inter 0.04, union 0.16 -> 0.25
    # anchor1 == gt1 -> 1.0
    want = _manual_mse(0.25, np.asarray([0.25, 1.0]), np.ones(2))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_enc_dispatch_emits_loss_iou_enc():
    outputs, targets = _outputs_targets()
    rng = jax.random.PRNGKey(0)
    for name in ("pred_iou", "anchor_iou"):
        c = _crit(("class", "boxes", name))
        losses = c(rng, outputs, targets, jnp.float32(2.0))
        assert "loss_iou_enc" in losses, name
        assert np.isfinite(float(losses["loss_iou_enc"]))
        # weighted into the total via the _enc suffix strip
        assert np.isfinite(float(c.total(losses)))
    # without the loss name, no iou key appears
    c = _crit(("class", "boxes"))
    losses = c(rng, outputs, targets, jnp.float32(2.0))
    assert not any("loss_iou" in k for k in losses)
