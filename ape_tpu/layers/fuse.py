"""GLIP-style bidirectional vision-language fusion.

Capability match: BiMultiHeadAttention / BiAttentionBlock / VisionLanguageFusion
(/root/reference/ape/layers/fuse_helper.py:8-232, vision_language_fusion.py:7-53):
one shared v<->l logit matrix, per-direction masked softmax, +-50000 clamps kept
for mixed-precision checkpoint parity, layer-scale gammas, pre-LN.

TPU-first: masks are validity masks (True = valid); the 87k x K logit matrix is
one einsum and both directions reuse it, so XLA materializes it once.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

CLAMP = 50000.0


class BiMultiHeadAttention(nn.Module):
    v_dim: int
    l_dim: int
    embed_dim: int
    num_heads: int
    stable_softmax_2d: bool = False
    use_attention_mask_v: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        v: jnp.ndarray,  # (B, Nv, v_dim)
        l: jnp.ndarray,  # (B, Nl, l_dim)
        valid_v: Optional[jnp.ndarray] = None,  # (B, Nv) True = valid
        valid_l: Optional[jnp.ndarray] = None,  # (B, Nl) True = valid
    ):
        b, nv, _ = v.shape
        nl = l.shape[1]
        h = self.num_heads
        hd = self.embed_dim // h
        scale = hd**-0.5

        def heads(x, n):
            return x.reshape(b, n, h, hd).transpose(0, 2, 1, 3)  # (B, H, N, hd)

        q_v = heads(nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(v) * scale, nv)
        k_l = heads(nn.Dense(self.embed_dim, dtype=self.dtype, name="l_proj")(l), nl)
        val_v = heads(nn.Dense(self.embed_dim, dtype=self.dtype, name="values_v_proj")(v), nv)
        val_l = heads(nn.Dense(self.embed_dim, dtype=self.dtype, name="values_l_proj")(l), nl)

        logits = jnp.einsum("bhvd,bhld->bhvl", q_v, k_l)  # (B, H, Nv, Nl)
        if self.stable_softmax_2d:
            logits = logits - jnp.max(logits)
        logits = jnp.clip(logits, -CLAMP, CLAMP)

        # language -> attends over vision tokens
        logits_l = logits.transpose(0, 1, 3, 2)  # (B, H, Nl, Nv)
        logits_l = logits_l - jnp.max(logits_l, axis=-1, keepdims=True)
        logits_l = jnp.clip(logits_l, -CLAMP, CLAMP)
        if valid_v is not None and self.use_attention_mask_v:
            logits_l = jnp.where(valid_v[:, None, None, :], logits_l, -jnp.inf)
        attn_l = jax.nn.softmax(logits_l.astype(jnp.float32), axis=-1).astype(v.dtype)

        # vision -> attends over language tokens
        logits_v = logits
        if valid_l is not None:
            logits_v = jnp.where(valid_l[:, None, None, :], logits_v, -jnp.inf)
        attn_v = jax.nn.softmax(logits_v.astype(jnp.float32), axis=-1).astype(v.dtype)

        out_v = jnp.einsum("bhvl,bhld->bhvd", attn_v, val_l)
        out_l = jnp.einsum("bhlv,bhvd->bhld", attn_l, val_v)
        out_v = out_v.transpose(0, 2, 1, 3).reshape(b, nv, self.embed_dim)
        out_l = out_l.transpose(0, 2, 1, 3).reshape(b, nl, self.embed_dim)
        out_v = nn.Dense(self.v_dim, dtype=self.dtype, name="out_v_proj")(out_v)
        out_l = nn.Dense(self.l_dim, dtype=self.dtype, name="out_l_proj")(out_l)
        return out_v, out_l


class BiAttentionBlock(nn.Module):
    """Pre-LN bi-attention with layer-scale (fuse_helper.py:178-232)."""

    v_dim: int
    l_dim: int
    embed_dim: int
    num_heads: int
    init_values: float = 1e-4
    stable_softmax_2d: bool = False
    use_attention_mask_v: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v, l, valid_v=None, valid_l=None):
        gamma_v = self.param(
            "gamma_v", nn.initializers.constant(self.init_values), (self.v_dim,)
        )
        gamma_l = self.param(
            "gamma_l", nn.initializers.constant(self.init_values), (self.l_dim,)
        )
        vn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_v")(v)
        ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_l")(l)
        dv, dl = BiMultiHeadAttention(
            v_dim=self.v_dim,
            l_dim=self.l_dim,
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            stable_softmax_2d=self.stable_softmax_2d,
            use_attention_mask_v=self.use_attention_mask_v,
            dtype=self.dtype,
            name="attn",
        )(vn, ln, valid_v, valid_l)
        # reference quirk (fuse_helper.py:223-230): `v` is REBOUND to the
        # normed value before the residual add, so the residual base is
        # layer_norm(v), not the block input
        v = vn + gamma_v.astype(dv.dtype) * dv
        l = ln + gamma_l.astype(dl.dtype) * dl
        return v, l


# VisionLanguageFusion in the reference is a checkpointing wrapper around
# BiAttentionBlock; rematerialization here is a jax.checkpoint policy applied by
# the caller, so the block itself is the full equivalent.
VisionLanguageFusion = BiAttentionBlock
