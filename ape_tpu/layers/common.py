"""Transformer building blocks: MultiheadAttention, FFN, MLP.

Capability match: the detrex layers the reference composes its DETR stack from
(detrex.layers BaseTransformerLayer/MultiheadAttention/FFN — see SURVEY.md L1/L3).
Post-norm residual discipline matches detrex: residual is added *inside* the
attention/FFN call, LayerNorm applied after.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


class MultiheadAttention(nn.Module):
    """Standard MHA with residual add inside (detrex MultiheadAttention semantics)."""

    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        key: Optional[jnp.ndarray] = None,
        value: Optional[jnp.ndarray] = None,
        identity: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        key_pos: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, K) True = PAD
    ) -> jnp.ndarray:
        if key is None:
            key = query
        if value is None:
            value = key
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos
        if key_pos is not None:
            key = key + key_pos

        b, q, _ = query.shape
        k = key.shape[1]
        h = self.num_heads
        hd = self.embed_dim // h

        qp = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(query)
        kp = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(key)
        vp = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(value)
        qp = qp.reshape(b, q, h, hd).transpose(0, 2, 1, 3)
        kp = kp.reshape(b, k, h, hd).transpose(0, 2, 1, 3)
        vp = vp.reshape(b, k, h, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", qp * (hd**-0.5), kp)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, logits)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vp.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vp)
        out = out.transpose(0, 2, 1, 3).reshape(b, q, self.embed_dim)
        out = nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)
        return identity + out


class FFN(nn.Module):
    """Two-layer feedforward with residual add inside (detrex FFN semantics)."""

    embed_dim: int
    feedforward_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, identity: Optional[jnp.ndarray] = None):
        if identity is None:
            identity = x
        y = nn.Dense(self.feedforward_dim, dtype=self.dtype, name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")(y)
        return identity + y


class MLP(nn.Module):
    """DETR head MLP: n layers with ReLU between (bbox_embed etc.)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"layer{i}")(x))
        return nn.Dense(self.output_dim, dtype=self.dtype, name=f"layer{self.num_layers - 1}")(x)
