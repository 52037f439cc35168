"""The jitted training step: forward + criterion + optimizer update.

Capability match: SimpleTrainer/AMPTrainer.run_step (/root/reference/ape/engine/
train_loop.py:21-416, tools/train_net.py:112-383): loss dict -> weighted sum ->
backward -> grad clip -> optimizer step; gradient accumulation (iter_size) via a
`lax.scan` over microbatches; the DDP all-reduce is XLA's psum inserted by jit
over the data-sharded batch; num_boxes normalization is a global sum exactly
like the reference's all_reduce (deformable_criterion.py:515-521).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ape_tpu.modeling.ape_deta.criterion import DeformableCriterion


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def create_train_state(params, tx, ema: bool = False) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def make_train_step(
    model,
    criterion: DeformableCriterion,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.0,
    iter_size: int = 1,
    prompt: str = "name",
):
    """Returns step_fn(state, batch, rng) -> (state, metrics).

    batch: images (B,H,W,3), image_sizes (B,2), text_features (B,T,Cl),
           text_valid (B,T), targets dict, optional class_valid (B,T).
    With iter_size > 1, the leading batch dim must be B = iter_size * micro.
    prompt: this loader group's prompt type — "name" aligns class logits on the
    original text features, phrase/expression on the VL-fused ones
    (segm_vl.py:445-448); static per group, so per-group jitted steps differ.
    """

    def loss_fn(params, batch, rng):
        outputs = model.apply(
            {"params": params},
            batch["images"],
            batch["image_sizes"],
            batch["text_features"],
            batch["text_valid"],
            deterministic=False,
            align_on_fused=prompt != "name",
            rngs={"dropout": rng},
        )
        targets = batch["targets"]
        num_boxes = jnp.clip(jnp.sum(targets["valid"].astype(jnp.float32)), 1.0)
        losses = criterion(
            rng, outputs, targets, num_boxes, batch.get("class_valid")
        )
        total = criterion.total(losses)
        return total, losses

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def one_micro(params, micro, rng):
        (total, losses), grads = grad_fn(params, micro, rng)
        return total, losses, grads

    def step_fn(state: TrainState, batch, rng):
        if iter_size == 1:
            total, losses, grads = one_micro(state.params, batch, rng)
        else:
            def split_micro(x):
                return x.reshape(iter_size, x.shape[0] // iter_size, *x.shape[1:])

            micros = jax.tree.map(split_micro, batch)
            rngs = jax.random.split(rng, iter_size)

            def scan_body(carry, inp):
                acc_grads, acc_total = carry
                micro, r = inp
                total, _, grads = one_micro(state.params, micro, r)
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                return (acc_grads, acc_total + total), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, total), _ = jax.lax.scan(
                scan_body, (zero_grads, 0.0), (micros, rngs)
            )
            grads = jax.tree.map(lambda g: g / iter_size, grads)
            total = total / iter_size
            losses = {}

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_params is not None and ema_decay > 0:
            ema_params = jax.tree.map(
                lambda e, p: ema_decay * e + (1 - ema_decay) * p, ema_params, params
            )
        metrics = {"total_loss": total, **losses}
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                ema_params=ema_params,
            ),
            metrics,
        )

    return step_fn
