"""MultiScaleDeformableAttention flax module.

Capability match: ape/layers/multi_scale_deform_attn.py:131-413 — the projections
(sampling_offsets, attention_weights, value_proj, output_proj), the directional
ring initialization of offset biases (:190-213), the 2-point and 4-point
reference math (:298-317), residual + identity semantics.

TPU-first dispatch:
  * mode="window" (encoder): queries are the pyramid grid; uses the gather-free
    window-clamped kernel (ops/msda_window.py). ``grid_corrections`` carries the
    per-batch valid-ratio shift so padded batches stay exact within the window.
  * mode="exact" (decoder): 900 queries; exact-gather forward with the dense
    separable-bilinear matmul backward (ops/msda_decoder.py) — each side of
    the hybrid measured faster on v5e.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np

from ape_tpu.ops.msda_decoder import ms_deform_attn_decoder
from ape_tpu.ops.msda_dispatch import ms_deform_attn_window_dispatch


def _offset_bias_init(num_heads: int, num_levels: int, num_points: int) -> np.ndarray:
    """Directional ring init: head h points at angle 2*pi*h/H, point p at radius p+1."""
    thetas = np.arange(num_heads, dtype=np.float64) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    for p in range(num_points):
        grid[:, :, p, :] *= p + 1
    return grid.reshape(-1).astype(np.float32)


class MultiScaleDeformableAttention(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    window_radius: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        value: jnp.ndarray,  # (B, S, C)
        spatial_shapes: Sequence[Tuple[int, int]],
        reference_points: jnp.ndarray,  # (B, Q, L, 2) or (B, Q, L, 4), normalized
        identity: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) True = PAD
        mode: str = "exact",
        grid_corrections: Optional[jnp.ndarray] = None,  # (B, Q, L, 2) pixel shift
    ) -> jnp.ndarray:
        b, q, _ = query.shape
        s = value.shape[1]
        h, l, p = self.num_heads, self.num_levels, self.num_points
        head_dim = self.embed_dim // h

        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos

        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="value_proj")(value)
        if key_padding_mask is not None:
            v = jnp.where(key_padding_mask[..., None], 0.0, v)
        v = v.reshape(b, s, h, head_dim)

        offsets = nn.Dense(
            h * l * p * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: jnp.asarray(_offset_bias_init(h, l, p)),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(b, q, h, l, p, 2)
        weights = nn.Dense(
            h * l * p,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(b, q, h, l * p)
        weights = nn.softmax(weights.astype(jnp.float32), axis=-1).astype(v.dtype)
        weights = weights.reshape(b, q, h, l, p)

        if mode == "window":
            # offsets are already in value-level pixels; fold in valid-ratio shift
            pixel_offsets = offsets
            if reference_points.shape[-1] != 2:
                raise ValueError("window mode requires 2-point references")
            if grid_corrections is not None:
                pixel_offsets = pixel_offsets + grid_corrections[:, :, None, :, None, :]
            out = ms_deform_attn_window_dispatch(
                v, spatial_shapes, pixel_offsets, weights, radius=self.window_radius
            )
            # remat-policy tag: under nn.remat(policy=save_only_these_names
            # ("msda_out")) the window-kernel output is SAVED, so the encoder
            # backward does not re-run the Pallas forward (its residuals are
            # the projections' outputs, recomputed cheaply); see
            # transformer.py use_act_checkpoint
            out = jax.ad_checkpoint.checkpoint_name(out, "msda_out")
        else:
            norm = jnp.asarray(
                [[w_, h_] for h_, w_ in spatial_shapes], dtype=jnp.float32
            )  # (L, 2) in (x, y)
            if reference_points.shape[-1] == 2:
                loc = (
                    reference_points[:, :, None, :, None, :]
                    + offsets / norm[None, None, None, :, None, :]
                )
            elif reference_points.shape[-1] == 4:
                loc = (
                    reference_points[:, :, None, :, None, :2]
                    + offsets
                    / p
                    * reference_points[:, :, None, :, None, 2:]
                    * 0.5
                )
            else:
                raise ValueError(reference_points.shape)
            out = ms_deform_attn_decoder(
                v, tuple(map(tuple, spatial_shapes)), loc.astype(v.dtype), weights
            )

        out = nn.Dense(self.embed_dim, dtype=self.dtype, name="output_proj")(out)
        return identity + out
