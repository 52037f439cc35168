"""Point-sampled masks_maskdino loss (deformable_criterion.py:424-490).

_point_sample_bilinear must match detrex's point_sample, i.e.
F.grid_sample(input, 2*coords - 1, align_corners=False) on [0,1]^2 coords.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ape_tpu.modeling.ape_deta.criterion import (
    DeformableCriterion,
    _point_sample_bilinear,
    default_weight_dict,
)


def test_point_sample_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    masks = rng.randn(2, 3, 16, 24).astype(np.float32)
    pts = rng.rand(2, 3, 50, 2).astype(np.float32)

    got = np.asarray(_point_sample_bilinear(jnp.asarray(masks), jnp.asarray(pts)))

    t_masks = torch.from_numpy(masks).reshape(6, 1, 16, 24)
    t_pts = torch.from_numpy(pts).reshape(6, 50, 1, 2)
    want = torch.nn.functional.grid_sample(
        t_masks, 2.0 * t_pts - 1.0, align_corners=False
    )
    want = want.reshape(2, 3, 50).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def _setup():
    k, g, hm = 8, 3, 16
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.randn(1, k, hm, hm) * 3, jnp.float32)
    gt = jnp.asarray((rng.rand(1, g, hm, hm) > 0.5).astype(np.float32))
    targets = {
        "labels": jnp.zeros((1, g), jnp.int32),
        "boxes": jnp.tile(jnp.asarray([[[0.5, 0.5, 0.4, 0.4]]]), (1, g, 1)),
        "valid": jnp.ones((1, g), bool),
        "masks": gt,
    }
    outputs = {
        "pred_logits": jnp.zeros((1, k, 4)),
        "pred_boxes": jnp.tile(jnp.asarray([[[0.5, 0.5, 0.4, 0.4]]]), (1, k, 1)),
        "pred_masks": pred,
    }
    return outputs, targets


def test_maskdino_point_loss_finite_and_masked():
    outputs, targets = _setup()
    c = DeformableCriterion(
        num_classes=4, weight_dict=default_weight_dict(), num_queries=8,
        losses=("masks_maskdino",), mask_point_sample=True,
        mask_num_points=64, mask_max_masks=4,
    )
    assign = jnp.asarray([[0, 1, 2, -1, -1, -1, -1, -1]], jnp.int32)
    l = c.loss_masks_maskdino(outputs, targets, assign, jnp.float32(3.0),
                              jax.random.PRNGKey(0))
    assert np.isfinite(float(l["loss_mask_maskdino"]))
    assert np.isfinite(float(l["loss_dice_maskdino"]))

    # no matches -> exactly zero (all slots masked out)
    l0 = c.loss_masks_maskdino(outputs, targets, jnp.full((1, 8), -1, jnp.int32),
                               jnp.float32(1.0), jax.random.PRNGKey(0))
    assert float(l0["loss_mask_maskdino"]) == 0.0
    assert float(l0["loss_dice_maskdino"]) == 0.0


def test_maskdino_perfect_prediction_low_ce():
    # pred logits strongly agree with gt -> pointwise CE ~ 0
    k, hm = 4, 16
    gt = (np.indices((hm, hm)).sum(0) % 2).astype(np.float32)[None, None]
    gt = np.tile(gt, (1, 2, 1, 1))
    pred = (gt * 2 - 1) * 20.0  # +-20 logits
    targets = {
        "labels": jnp.zeros((1, 2), jnp.int32),
        "boxes": jnp.tile(jnp.asarray([[[0.5, 0.5, 0.4, 0.4]]]), (1, 2, 1)),
        "valid": jnp.ones((1, 2), bool),
        "masks": jnp.asarray(gt),
    }
    outputs = {"pred_masks": jnp.asarray(np.tile(pred, (1, 2, 1, 1)))[:, :k]}
    c = DeformableCriterion(
        num_classes=4, weight_dict=default_weight_dict(), num_queries=k,
        losses=("masks_maskdino",), mask_point_sample=True,
        mask_num_points=64, mask_max_masks=2,
    )
    assign = jnp.asarray([[0, 1]], jnp.int32)
    outputs["pred_masks"] = outputs["pred_masks"][:, :2]
    l = c.loss_masks_maskdino(outputs, targets, assign, jnp.float32(2.0),
                              jax.random.PRNGKey(0))
    # bilinear interpolation across the checkerboard creates mid values at
    # sampled points, so not exactly 0 — but confidently small
    assert float(l["loss_mask_maskdino"]) < 1.0


def test_dispatch_emits_maskdino_keys():
    outputs, targets = _setup()
    outputs["init_reference"] = outputs["pred_boxes"]
    c = DeformableCriterion(
        num_classes=4, weight_dict=default_weight_dict(), num_queries=8,
        losses=("class", "boxes", "masks_maskdino"), mask_point_sample=True,
        mask_num_points=64, mask_max_masks=4,
    )
    losses = c(jax.random.PRNGKey(0), outputs, targets, jnp.float32(3.0))
    assert "loss_mask_maskdino" in losses and "loss_dice_maskdino" in losses
    assert "loss_mask" not in losses
    # flag off -> dense path keys
    c2 = DeformableCriterion(
        num_classes=4, weight_dict=default_weight_dict(), num_queries=8,
        losses=("class", "boxes", "masks_maskdino"), mask_point_sample=False,
    )
    losses2 = c2(jax.random.PRNGKey(0), outputs, targets, jnp.float32(3.0))
    assert "loss_mask" in losses2 and "loss_mask_maskdino" not in losses2
