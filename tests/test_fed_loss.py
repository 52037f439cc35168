"""Federated class loss: pad types, mask semantics, and loss effect.

Reference: /root/reference/ape/modeling/ape_deta/deformable_criterion.py
  * weight-table padding max/max1000/mean/median/cat/kthvalue (:107-139)
  * get_fed_loss_classes — gt classes + weighted negative sampling (:160-186)
  * "cat" pad classes always included in the federated subset (:236-238)
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ape_tpu.modeling.ape_deta.criterion import (
    DeformableCriterion,
    default_weight_dict,
)


def make_crit(num_classes=16, **kw):
    kw.setdefault("weight_dict", default_weight_dict())
    kw.setdefault("num_queries", 8)
    return DeformableCriterion(num_classes=num_classes, **kw)


def test_pad_scalar_types():
    w = np.asarray([1.0, 2.0, 3.0, 4.0, 100.0], np.float32)
    for pt, expect in [
        ("max", 100.0),
        ("max1000", 100000.0),
        ("mean", 22.0),
        ("median", 3.0),  # torch lower median
    ]:
        c = make_crit(8, use_fed_loss=True, fed_loss_cls_weights=w, fed_loss_pad_type=pt)
        got = np.asarray(c.fed_loss_cls_weights)
        assert got.shape == (8,)
        np.testing.assert_allclose(got[:5], w)
        np.testing.assert_allclose(got[5:], expect, rtol=1e-6), pt


def test_pad_default_kthvalue():
    # reference else-branch: kthvalue(num_classes * 7/10) of the table, 1-indexed
    w = np.arange(1, 11, dtype=np.float32)  # 10 entries
    c = make_crit(12, use_fed_loss=True, fed_loss_cls_weights=w)
    k = min(max(int(12 * 7.0 / 10), 1), 10)  # = 8
    got = np.asarray(c.fed_loss_cls_weights)
    np.testing.assert_allclose(got[10:], float(k))


def test_pad_cat_always_included():
    w = np.ones((6,), np.float32)
    c = make_crit(
        10, use_fed_loss=True, fed_loss_cls_weights=w, fed_loss_pad_type="cat",
        fed_loss_num_classes=2,
    )
    assert c._fed_pad_start == 6
    cls = jnp.asarray([[0, 3]], jnp.int32)
    matched = jnp.ones((1, 2), bool)
    mask = c._fed_class_mask(jax.random.PRNGKey(0), cls, matched, 10)
    mask = np.asarray(mask)
    # gt classes in
    assert mask[0] and mask[3]
    # "cat" pad classes (6..9) always in
    assert mask[6:].all()


def test_gt_classes_always_in_mask_and_subset_size():
    rng = np.random.RandomState(0)
    w = rng.rand(64).astype(np.float32) + 0.1
    c = make_crit(64, use_fed_loss=True, fed_loss_cls_weights=w, fed_loss_num_classes=8)
    cls = jnp.asarray([[5, 17, 33, 64]], jnp.int32)  # 64 = padded/background slot
    matched = jnp.asarray([[True, True, True, False]])
    for seed in range(5):
        mask = np.asarray(
            c._fed_class_mask(jax.random.PRNGKey(seed), cls, matched, 64)
        )
        assert mask[5] and mask[17] and mask[33]
        # gt classes + sampled negatives = fed_loss_num_classes kept columns
        assert mask.sum() == 8


def test_fed_mask_changes_loss():
    rng = np.random.RandomState(1)
    b, k, cdim = 2, 8, 64
    outputs = {
        "pred_logits": jnp.asarray(rng.randn(b, k, cdim), jnp.float32),
        "pred_boxes": jnp.asarray(rng.rand(b, k, 4), jnp.float32),
    }
    targets = {
        "labels": jnp.asarray(rng.randint(0, cdim, (b, 4)), jnp.int32),
        "boxes": jnp.asarray(rng.rand(b, 4, 4) * 0.4 + 0.2, jnp.float32),
        "valid": jnp.ones((b, 4), bool),
    }
    assign = jnp.asarray([[0, 1, -1, -1, 2, -1, -1, 3]] * b, jnp.int32)
    class_valid = jnp.ones((b, cdim), bool)
    nb = jnp.asarray(8.0)
    w = rng.rand(cdim).astype(np.float32) + 0.1

    base = make_crit(cdim)
    fed = make_crit(
        cdim, use_fed_loss=True, fed_loss_cls_weights=w, fed_loss_num_classes=8
    )
    r = jax.random.PRNGKey(3)
    l_base = base.loss_labels(outputs, targets, assign, nb, class_valid, r)
    l_fed = fed.loss_labels(outputs, targets, assign, nb, class_valid, r)
    # masking out most negative columns must strictly reduce the focal sum
    assert float(l_fed["loss_class"]) < float(l_base["loss_class"])
    assert float(l_fed["loss_class"]) > 0.0


def test_warns_without_weights(caplog):
    with caplog.at_level(logging.WARNING):
        make_crit(8, use_fed_loss=True)
    assert any("fed_loss_cls_weights is None" in r.message for r in caplog.records)


def test_rejects_oversized_table():
    with pytest.raises(ValueError):
        make_crit(4, use_fed_loss=True, fed_loss_cls_weights=np.ones(8, np.float32))


def test_bf16_outputs_lose_nothing():
    """Round 5: models may run bf16 compute (the train bench's AMP-equivalent
    default); the criterion casts bf16 outputs to f32 before any loss math,
    so losses are f32 and match the f32-input values bit-for-bit."""
    rng = np.random.RandomState(0)
    crit = make_crit(4, use_stage2=False, losses=("class", "boxes"))
    out32 = {
        "pred_logits": jnp.asarray(rng.randn(1, 8, 4), jnp.float32),
        "pred_boxes": jnp.asarray(rng.uniform(0.2, 0.7, (1, 8, 4)), jnp.float32),
    }
    out16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), out32)
    targets = {
        "labels": jnp.asarray([[0, 1, 2, 3]], jnp.int32),
        "boxes": jnp.asarray(rng.uniform(0.3, 0.6, (1, 4, 4)), jnp.float32),
        "valid": jnp.asarray([[True, True, True, False]]),
    }
    l32 = crit(
        jax.random.PRNGKey(0),
        jax.tree.map(lambda x: x.astype(jnp.bfloat16).astype(jnp.float32), out32),
        targets,
        jnp.asarray(3.0),
    )
    l16 = crit(jax.random.PRNGKey(0), out16, targets, jnp.asarray(3.0))
    for k in l32:
        assert l16[k].dtype == jnp.float32, k
        np.testing.assert_array_equal(np.asarray(l32[k]), np.asarray(l16[k]), err_msg=k)
