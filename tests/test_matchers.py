"""Matcher/assigner tests: Hungarian vs scipy, stage1/stage2 semantics."""

import numpy as np
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from ape_tpu.modeling.ape_deta.matchers import (
    auction_assign,
    hungarian_cost_matrix,
    stage1_assign,
    stage2_assign,
    subsample_positives,
    threshold_match,
    topk_per_gt,
)


def test_auction_matches_scipy(rng):
    for trial in range(5):
        k, g = 20, 7
        cost = rng.randn(k, g).astype(np.float32) * 3
        assign = np.asarray(auction_assign(jnp.asarray(cost), jnp.ones(g, bool), eps=1e-4))
        rows, cols = linear_sum_assignment(cost)
        scipy_cost = cost[rows, cols].sum()
        # reconstruct our assignment cost
        ours = [(p, a) for p, a in enumerate(assign) if a >= 0]
        assert len(ours) == g  # every gt matched
        assert len({a for _, a in ours}) == g  # distinct gts
        our_cost = sum(cost[p, a] for p, a in ours)
        assert our_cost <= scipy_cost + g * 1e-3 + 1e-4, (our_cost, scipy_cost)


def test_auction_respects_validity(rng):
    cost = rng.randn(10, 4).astype(np.float32)
    valid = np.asarray([True, False, True, False])
    assign = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(valid)))
    matched = {a for a in assign if a >= 0}
    assert matched == {0, 2}


def test_threshold_match_low_quality(rng):
    # gt 0 has max IoU 0.4 (below 0.6): low-quality match still labels it 1
    iou = np.asarray([[0.4, 0.1, 0.2], [0.1, 0.7, 0.1]], np.float32)
    idx, lab = threshold_match(
        jnp.asarray(iou), jnp.ones(2, bool), thresholds=(0.6,), labels=(0, 1)
    )
    lab = np.asarray(lab)
    assert lab[0] == 1  # gt0's best proposal promoted
    assert lab[1] == 1  # above threshold
    assert lab[2] == 0


def test_subsample_positives(rng):
    mask = jnp.asarray(np.ones(50, bool))
    out = np.asarray(subsample_positives(jax.random.PRNGKey(0), mask, 10))
    assert out.sum() == 10


def test_topk_per_gt():
    iou = jnp.asarray([[0.9, 0.8, 0.7, 0.6, 0.5]])
    assign = jnp.asarray([0, 0, 0, 0, 0])
    out = np.asarray(topk_per_gt(assign, iou, k=2))
    assert (out >= 0).sum() == 2
    assert out[0] == 0 and out[1] == 0 and out[4] == -1


def test_stage2_assign_basic(rng):
    gt = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.2, 0.2, 0.1, 0.1]], jnp.float32)
    refs = jnp.asarray(
        [[0.5, 0.5, 0.2, 0.2], [0.2, 0.2, 0.1, 0.1], [0.8, 0.8, 0.05, 0.05]],
        jnp.float32,
    )
    assign = np.asarray(
        stage2_assign(
            jax.random.PRNGKey(0), gt, jnp.ones(2, bool), refs, num_queries=16
        )
    )
    assert assign[0] == 0 and assign[1] == 1 and assign[2] == -1


def test_stage1_assign_no_gt(rng):
    anchors = jnp.asarray(rng.rand(10, 4).astype(np.float32) * 0.5 + 0.25)
    assign = np.asarray(
        stage1_assign(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 4)),
            jnp.zeros(2, bool),
            anchors,
            jnp.ones(10, bool),
        )
    )
    assert (assign == -1).all()
