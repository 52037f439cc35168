"""Sine position embeddings for multi-level feature maps.

Capability match: detrex ``PositionEmbeddingSine(num_pos_feats=128, temperature=10000,
normalize=True, offset=-0.5)`` as configured by the reference
(/root/reference/configs/COCO_InstanceSegmentation/ape_deta/models/ape_deta_r50.py:35-40).

TPU-first notes: the embedding is a pure function of the validity mask, computed once
per level inside jit; cumulative sums are cheap VPU work and fuse with the consumer.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def position_embedding_sine(
    mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    offset: float = -0.5,
    eps: float = 1e-6,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """mask: (B, H, W) bool, True = VALID pixel. Returns (B, H, W, 2*num_pos_feats).

    (Note: the torch convention passes a padding mask where True = padding; here we
    take a validity mask — callers hold validity masks throughout this codebase.)
    """
    not_mask = mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t  # (B, H, W, F)
    pos_y = y_embed[..., None] / dim_t
    # interleave sin/cos over pairs, matching torch's stack(sin,cos,dim=4).flatten(3)
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


def get_sine_pos_embed(
    pos: jnp.ndarray, num_pos_feats: int = 128, temperature: float = 10000.0
) -> jnp.ndarray:
    """Sine embedding of continuous coordinates in [0,1] (detrex get_sine_pos_embed).

    pos: (..., K) -> (..., K*num_pos_feats); used for query pos from proposals.
    """
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    x = pos[..., None] * scale / dim_t  # (..., K, F)
    emb = jnp.stack([jnp.sin(x[..., 0::2]), jnp.cos(x[..., 1::2])], axis=-1)
    emb = emb.reshape(*x.shape[:-1], -1)
    return emb.reshape(*pos.shape[:-1], -1)
