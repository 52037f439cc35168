"""Small numeric helpers shared across the model stack."""

from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Numerically-stable logit; the DETR box-refinement workhorse
    (reference capability: detrex utils.inverse_sigmoid, DINO-style
    eps=1e-3 — the eps is load-bearing for parity on saturated references:
    the full-model harness caught 1e-3-scale box drift from eps=1e-5 when
    padded images put degenerate proposals among the selected queries)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1) - jnp.log(x2)


def stable_softmax(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """max-subtracted softmax; mirrors the fp16-safe softmax the reference uses in
    vision-language fusion (ape/layers/fuse_helper.py `stable_softmax_2d`)."""
    logits = logits - jnp.max(logits, axis=axis, keepdims=True)
    return jnp.exp(logits) / jnp.sum(jnp.exp(logits), axis=axis, keepdims=True)


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Elementwise sigmoid focal loss (RetinaNet); no reduction."""
    p = jnp.clip(jnp.exp(-jnp.logaddexp(0.0, -logits)), 1e-8, 1 - 1e-8)  # sigmoid
    ce = jnp.logaddexp(0.0, logits) - logits * targets  # BCE-with-logits
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss
