"""CLIP text transformer in flax.

Capability match: the vendored EVA-CLIP text tower used by
EVA02CLIP.custom_encode_text (/root/reference/ape/modeling/text/
clip_wrapper_eva02.py:135-155 and eva02_clip/transformer.py): token embedding +
positional embedding -> pre-LN residual blocks with causal attention ->
ln_final -> text_projection; returns per-token projected states and the
EOT-pooled embedding.

The tower is frozen in APE; on TPU it runs as a jitted function over fixed
(batch, 77) token arrays, chunked by the wrapper.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class TextBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    # OpenAI CLIP towers (clip_wrapper.py:24-26 QuickGELU) use
    # x * sigmoid(1.702 x); the EVA-CLIP vendored tower uses exact gelu
    quick_gelu: bool = False

    @nn.compact
    def __call__(self, x, causal_mask):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        b, n, c = y.shape
        hd = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * (hd**-0.5), k)
        logits = logits + causal_mask[None, None, :, :].astype(logits.dtype)
        attn = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
        y = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, c)
        y = nn.Dense(self.width, dtype=self.dtype, name="out_proj")(y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_fc")(y)
        if self.quick_gelu:
            y = y * jax.nn.sigmoid(1.702 * y)
        else:
            y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(y)
        return x + y


class CLIPTextTransformer(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 1024
    heads: int = 16
    layers: int = 24
    output_dim: int = 1024
    dtype: jnp.dtype = jnp.float32
    quick_gelu: bool = False

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """tokens: (B, ctx) int32 -> (eot_embed (B, out), token_embeds (B, ctx, out))."""
        x = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype, name="token_embedding"
        )(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos[None].astype(x.dtype)
        n = self.context_length
        causal = jnp.triu(jnp.full((n, n), -1e9), k=1)
        for i in range(self.layers):
            x = TextBlock(
                self.width,
                self.heads,
                dtype=self.dtype,
                quick_gelu=self.quick_gelu,
                name=f"resblocks_{i}",
            )(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.output_dim),
        )
        xx = x @ proj.astype(x.dtype)  # (B, ctx, out) per-token
        eot_idx = jnp.argmax(tokens, axis=-1)  # EOT has the highest token id
        eot = jnp.take_along_axis(xx, eot_idx[:, None, None], axis=1)[:, 0]
        return eot, xx
