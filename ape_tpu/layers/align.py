"""Region-text alignment heads.

Capability match: VisionLanguageAlign / StillClassifier
(/root/reference/ape/layers/vision_language_align.py:8-61) and the Detic-style
ZeroShotFC (ape/layers/zero_shot_fc.py:12-159).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

CLAMP = 50000.0


class VisionLanguageAlign(nn.Module):
    """Open-vocabulary classification logits = scaled query·token dot products.

    logits[b,q,t] = (x[b,q] · proj(normalize(emb)[b,t] / 2)) / exp(log_scale)
                    + (normalize(emb)[b,t] · bias_lang + bias0)
    """

    embed_dim: int
    embed_dim_language: int
    prior_prob: float = 0.01
    log_scale_init: float = 0.0
    clamp_dot_product: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, embedding: jnp.ndarray) -> jnp.ndarray:
        """x: (B, Q, embed_dim); embedding: (B, T, embed_dim_language) -> (B, Q, T)."""
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        log_scale = self.param(
            "log_scale", nn.initializers.constant(self.log_scale_init), (1,)
        )
        bias_lang = self.param(
            "bias_lang", nn.initializers.zeros, (self.embed_dim_language,)
        )
        bias0 = self.param("bias0", nn.initializers.constant(bias_value), (1,))

        emb = embedding.astype(x.dtype)
        emb = emb / jnp.clip(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12, None
        )
        tokens = nn.Dense(self.embed_dim, dtype=self.dtype, name="dot_product_projection_text")(
            emb / 2.0
        )  # (B, T, embed_dim)
        token_bias = emb @ bias_lang.astype(emb.dtype) + bias0.astype(emb.dtype)  # (B, T)

        logits = (
            jnp.einsum("bqc,btc->bqt", x, tokens) / jnp.exp(log_scale.astype(x.dtype))
            + token_bias[:, None, :]
        )
        if self.clamp_dot_product:
            logits = jnp.clip(logits, -CLAMP, CLAMP)
        return logits


class StillClassifier(nn.Module):
    """Binary objectness head (vision_language_align.py:55-61)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lang_feat=None) -> jnp.ndarray:
        return nn.Dense(1, dtype=self.dtype, name="body")(x)


class ZeroShotFC(nn.Module):
    """Detic-style zero-shot classifier against a (fixed or provided) class
    embedding bank (zero_shot_fc.py:12-159).

    The embedding bank is passed at call time (loaded .npy / online text encoder
    output) — functional style replaces the reference's buffer + set_predictor.
    """

    input_dim: int
    proj_dim: int = 512
    temperature: float = 50.0
    use_bias: float = 0.0  # additive bias value; 0 disables
    norm_weight: bool = True
    norm_temperature: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, zs_weight: jnp.ndarray) -> jnp.ndarray:
        """x: (..., input_dim); zs_weight: (num_classes, proj_dim) -> (..., num_classes)."""
        x = nn.Dense(self.proj_dim, dtype=self.dtype, name="linear")(x)
        if self.norm_weight:
            t = self.norm_temperature or self.temperature
            x = t * x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12, None)
            zs = zs_weight / jnp.clip(
                jnp.linalg.norm(zs_weight, axis=-1, keepdims=True), 1e-12, None
            )
        else:
            zs = zs_weight
        logits = x @ zs.T.astype(x.dtype)
        if self.use_bias:
            bias = self.param("cls_bias", nn.initializers.constant(self.use_bias), (1,))
            logits = logits + bias.astype(logits.dtype)
        return logits
