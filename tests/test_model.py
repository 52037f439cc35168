"""Full APEDeta model forward: shapes, finiteness, train step smoke."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from ape_tpu.modeling.build import build_ape_ti


def tiny_model():
    return build_ape_ti(img_size=64, num_queries=16, window_radius=2)


def make_inputs(rng, b=1, t=4):
    return (
        jnp.asarray(rng.randn(b, 64, 64, 3).astype(np.float32)),
        jnp.asarray([[64, 48]] * b, jnp.int32),
        jnp.asarray(rng.randn(b, t, 1024).astype(np.float32)),
        jnp.ones((b, t), bool),
    )


@pytest.fixture(scope="module")
def tiny_forward():
    """One forward of the tiny model shared by the forward-shape and
    criterion tests (each full trace costs ~20 s of CPU interpret time;
    the inputs replicate the function-scoped rng fixture's seed-0 stream).
    (Measured: shape-synthesized params via eval_shape cost the same as a
    real init — tracing dominates on the CPU interpret path — so the real
    init stays for its initializer coverage.)"""
    rng = np.random.RandomState(0)
    model = tiny_model()
    inputs = make_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), *inputs)
    out = model.apply(params, *inputs)
    return model, inputs, params, out


def test_ape_deta_forward(tiny_forward):
    _, _, _, out = tiny_forward
    assert out["pred_logits"].shape == (1, 16, 4)
    assert out["pred_boxes"].shape == (1, 16, 4)
    assert out["pred_masks"].shape == (1, 16, 16, 16)
    assert len(out["aux_outputs"]) == 5
    assert out["enc_outputs"]["pred_logits"].shape[-1] == 1
    for k in ("pred_logits", "pred_boxes", "pred_masks"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_closed_vocab_learned_bank(rng):
    """num_learned_classes: the class head classifies against a learned bank
    and ignores the provided text features (legacy-deta closed vocabulary)."""
    model = build_ape_ti(
        img_size=64, num_queries=16, window_radius=2, num_learned_classes=7
    )
    images, sizes, text, tvalid = make_inputs(rng, t=4)
    params = model.init(jax.random.PRNGKey(0), images, sizes, text, tvalid)
    assert "class_embedding" in params["params"]
    out = model.apply(params, images, sizes, text, tvalid)
    assert out["pred_logits"].shape == (1, 16, 7)  # 7 classes, not 4 text tokens
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
    # text input is ignored entirely
    out2 = model.apply(params, images, sizes, text + 1.0, tvalid)
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]), np.asarray(out2["pred_logits"]), rtol=1e-6
    )


def test_criterion_on_model_outputs(rng, tiny_forward):
    from ape_tpu.modeling.ape_deta.criterion import (
        DeformableCriterion,
        default_weight_dict,
    )

    _, _, _, out = tiny_forward
    targets = {
        "labels": jnp.asarray([[0, 1, 2, 0]], jnp.int32),
        "boxes": jnp.asarray(
            [[[0.3, 0.3, 0.2, 0.2], [0.6, 0.6, 0.3, 0.3], [0.5, 0.2, 0.1, 0.1], [0, 0, 0, 0]]]
        ),
        "valid": jnp.asarray([[True, True, True, False]]),
        "masks": jnp.asarray((rng.rand(1, 4, 16, 16) > 0.5).astype(np.float32)),
    }
    crit = DeformableCriterion(
        num_classes=4, weight_dict=default_weight_dict(), num_queries=16
    )
    losses = crit(jax.random.PRNGKey(1), out, targets, jnp.asarray(3.0))
    total = crit.total(losses)
    assert np.isfinite(float(total)), losses
    assert "loss_class" in losses and "loss_class_enc" in losses
    assert "loss_class_0" in losses  # aux layers


def test_single_stage_detr_forward(rng):
    """as_two_stage=False: learned query embeddings + 2-coord reference
    points (legacy deformable_detr_r50 family), with and without box
    refinement; criterion with use_stage2=False computes a finite loss."""
    from ape_tpu.config import ConfigDict, LazyConfig, instantiate

    for refine in (False, True):
        cfg = LazyConfig.load("configs/tests/ape_deta_tiny.py")
        cfg.model.num_queries = 16
        cfg.model.num_learned_classes = 8
        cfg.model.mask_on = False
        cfg.model.transformer.two_stage_num_proposals = 16
        cfg.model.transformer.as_two_stage = False
        cfg.model.transformer.decoder.with_box_refine = refine
        cfg.criterion.use_stage2 = False
        cfg.criterion.losses = ["class", "boxes"]
        cfg.criterion.weight_dict = {"loss_class": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0}
        objs = instantiate(ConfigDict(model=cfg.model, criterion=cfg.criterion))
        model, criterion = objs["model"], objs["criterion"]

        images, sizes, text, tvalid = make_inputs(rng)
        if not refine:
            # shapes-only for the no-refine leg (eval_shape: no execution) —
            # the refine=True leg below runs the numeric/finite checks
            shapes = jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0), images, sizes, text, tvalid)
            )
            names = {
                "/".join(map(str, path))
                for path, _ in jax.tree_util.tree_leaves_with_path(shapes)
            }
            assert any("query_embed" in n for n in names)
            continue
        params = model.init(jax.random.PRNGKey(0), images, sizes, text, tvalid)
        out = model.apply(params, images, sizes, text, tvalid)
        assert out["pred_logits"].shape == (1, 16, 8)
        assert out["pred_boxes"].shape == (1, 16, 4)
        assert out["init_reference"].shape == (1, 16, 2)
        assert not bool(np.asarray(out["enc_outputs"]["valid"]).any())
        # single-stage query path has learned query embeddings
        flat = jax.tree_util.tree_leaves_with_path(params)
        names = {"/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat}
        assert any("query_embed" in n for n in names)

        targets = {
            "labels": jnp.zeros((1, 4), jnp.int32),
            "boxes": jnp.asarray([[[0.5, 0.5, 0.2, 0.2]] * 4], jnp.float32),
            "valid": jnp.asarray([[True, True, False, False]]),
        }
        losses = criterion(jax.random.PRNGKey(1), out, targets, jnp.asarray(2.0))
        total = criterion.total(losses)
        assert np.isfinite(float(total)), losses


def test_reduced_scale_latency_protocol_forward(rng):
    """The reference latency protocol (scripts/eval_time.sh:36,76): mask off,
    FPN scale_factors (2.0, 1.0, 0.5), neck extends to 5 levels via stride-2
    extra convs. bench.py's default protocol — pin that it builds and runs."""
    model = build_ape_ti(
        img_size=64, num_queries=16, window_radius=2,
        mask_on=False, scale_factors=(2.0, 1.0, 0.5),
    )
    images, sizes, text, tvalid = make_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), images, sizes, text, tvalid)
    out = model.apply(params, images, sizes, text, tvalid)
    assert out["pred_logits"].shape == (1, 16, 4)
    assert "pred_masks" not in out or out.get("pred_masks") is None
    for k in ("pred_logits", "pred_boxes"):
        assert np.isfinite(np.asarray(out[k])).all(), k


@pytest.mark.heavy
def test_remat_policy_grads_match(rng):
    """use_act_checkpoint + the save-msda_out remat policy must not change
    gradients vs no remat (policy only affects what is saved vs recomputed)."""
    images, sizes, text, tvalid = make_inputs(rng)

    def loss_fn(model, params):
        out = model.apply(params, images, sizes, text, tvalid)
        return jnp.sum(out["pred_logits"].astype(jnp.float32) ** 2) + jnp.sum(
            out["pred_boxes"].astype(jnp.float32)
        )

    def depth2(m):
        # 2 encoder + 2 decoder layers: the policy applies per layer, extra
        # depth only multiplies trace/compile time
        return m.copy(
            transformer=m.transformer.copy(
                encoder=m.transformer.encoder.copy(num_layers=2),
                decoder=m.transformer.decoder.copy(num_layers=2),
            )
        )

    plain = depth2(build_ape_ti(img_size=64, num_queries=16, window_radius=2))
    remat = depth2(
        build_ape_ti(
            img_size=64, num_queries=16, window_radius=2, use_act_checkpoint=True
        )
    )
    params = plain.init(jax.random.PRNGKey(0), images, sizes, text, tvalid)
    g_plain = jax.grad(lambda p: loss_fn(plain, p))(params)
    g_remat = jax.grad(lambda p: loss_fn(remat, p))(params)
    flat_p = jax.tree_util.tree_leaves(g_plain)
    flat_r = jax.tree_util.tree_leaves(g_remat)
    assert len(flat_p) == len(flat_r)
    for a, b in zip(flat_p, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
