"""EVA-02 / EVA-CLIP ViT backbone + SimpleFeaturePyramid, flax/NHWC.

Capability match (one implementation, flag-selected variants):
  * EVA-02 ViT   — /root/reference/ape/modeling/backbone/vit_eva02.py:206-634
    (packed qkv with q/v-only bias, 2D RoPE, windowed/global blocks, SwiGLU)
    used by APE-Ti (configs/common/backbone/vitt_eva02.py: 192d/12L/3H/win14)
  * EVA-CLIP ViT — /root/reference/ape/modeling/backbone/vit_eva_clip.py:135-700
    (subln: separate q/k/v projections + inner attention LN + SwiGLU ffn_ln)
    used by APE-L_D (configs/common/backbone/vitl_eva02_clip.py: 1024d/24L/win32)
  * SimpleFeaturePyramid — vit_eva02.py:637-777 (deconv x4/x2, id, maxpool 0.5
    -> p2..p5 @256ch + LastLevelMaxPool p6)

TPU-first notes: everything NHWC and static-shape; window partition is pure
reshape/transpose; RoPE tables are compile-time constants; attention runs in a
single fused einsum chain (flash-attention kernel pluggable via ``attn_impl``);
LayerNorm/SwiGLU fuse into the surrounding matmuls under XLA.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ape_tpu.modeling.backbone.vit_utils import (
    apply_rope,
    resize_abs_pos,
    rope_2d_table,
    window_partition,
    window_unpartition,
)

Dtype = jnp.dtype


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Attention(nn.Module):
    """EVA attention: q/v-only bias, 2D RoPE on q and k, optional sub-LN."""

    dim: int
    num_heads: int
    subln: bool = False
    inner_attn_ln: bool = False
    qkv_bias: bool = True
    use_rel_pos: bool = False  # EVA-01 decomposed rel-pos (vit_eva.py:109-141)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope_cos, rope_sin):
        b, h, w, c = x.shape
        n = h * w
        x = x.reshape(b, n, c)
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        q_bias = (
            self.param("q_bias", nn.initializers.zeros, (self.dim,))
            if self.qkv_bias
            else None
        )
        v_bias = (
            self.param("v_bias", nn.initializers.zeros, (self.dim,))
            if self.qkv_bias
            else None
        )

        dense = lambda name: nn.Dense(
            self.dim, use_bias=False, dtype=self.dtype, name=name
        )
        if self.subln:
            q = dense("q_proj")(x)
            k = dense("k_proj")(x)
            v = dense("v_proj")(x)
        else:
            qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=self.dtype, name="qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        if q_bias is not None:
            q = q + q_bias.astype(q.dtype)
            v = v + v_bias.astype(v.dtype)

        q = q.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        if rope_cos is not None:
            q = apply_rope(q, rope_cos.astype(q.dtype), rope_sin.astype(q.dtype))
            k = apply_rope(k, rope_cos.astype(k.dtype), rope_sin.astype(k.dtype))

        # flash attention for long global blocks on TPU (replaces the reference's
        # xformers/SDPA paths, vit_eva02.py:270-286); einsum otherwise
        # block must divide n; pick the largest lane-aligned divisor so sizes
        # like 2304 (768^2 inputs) still take the fused path
        flash_blk = next(
            (bk for bk in (1024, 512, 384, 256, 128) if n % bk == 0), None
        )
        use_flash = (
            jax.default_backend() == "tpu"
            and n >= 2048
            and flash_blk is not None
            and head_dim in (32, 64, 128)
            and not self.use_rel_pos
        )
        if use_flash:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes,
                flash_attention,
            )

            # default BlockSizes cost 1.43 ms at (1,3,4096,64) on v5e; 1024
            # blocks bring it under 0.2 ms (experiments/backbone_fix_probe.py).
            blk = flash_blk
            bs = BlockSizes(
                block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
                block_q_major_dkv=blk, block_k_major_dkv=blk,
                block_k_dkv=blk, block_q_dkv=blk,
                block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
            )
            out = flash_attention(q, k, v, sm_scale=scale, block_sizes=bs)
        else:
            attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
            if self.use_rel_pos:
                from ape_tpu.modeling.backbone.vit_utils import add_decomposed_rel_pos

                head_dim_ = self.dim // self.num_heads
                rel_h = self.param(
                    "rel_pos_h", nn.initializers.zeros, (2 * h - 1, head_dim_)
                )
                rel_w = self.param(
                    "rel_pos_w", nn.initializers.zeros, (2 * w - 1, head_dim_)
                )
                a2 = attn.reshape(b * self.num_heads, n, n)
                q2 = q.reshape(b * self.num_heads, n, head_dim_)
                a2 = add_decomposed_rel_pos(a2, q2, rel_h, rel_w, (h, w), (h, w))
                attn = a2.reshape(b, self.num_heads, n, n)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)

        if self.inner_attn_ln:
            out = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="inner_attn_ln")(out)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return out.reshape(b, h, w, self.dim)


class SwiGLU(nn.Module):
    """SwiGLU MLP. ``packed=True`` mirrors EVA-02's xops_SwiGLU (w12 packed);
    otherwise separate w1/w2 with optional sub-LN before w3 (EVA-CLIP naiveswiglu)."""

    hidden_dim: int
    out_dim: int
    packed: bool = False
    subln: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.packed:
            x12 = nn.Dense(2 * self.hidden_dim, dtype=self.dtype, name="w12")(x)
            x1, x2 = jnp.split(x12, 2, axis=-1)
        else:
            x1 = nn.Dense(self.hidden_dim, dtype=self.dtype, name="w1")(x)
            x2 = nn.Dense(self.hidden_dim, dtype=self.dtype, name="w2")(x)
        hidden = nn.silu(x1) * x2
        if self.subln:
            hidden = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ffn_ln")(hidden)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="w3")(hidden)


class Mlp(nn.Module):
    """Plain GELU MLP (EVA-01 blocks, timm Mlp: fc1/act/fc2)."""

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_hidden_dim: int
    window_size: int = 0  # 0 = global attention
    subln: bool = False
    inner_attn_ln: bool = False
    packed_swiglu: bool = False
    swiglu_subln: bool = False
    mlp_type: str = "swiglu"  # "swiglu" (EVA-02/CLIP) | "gelu" (EVA-01)
    use_rel_pos: bool = False
    drop_path: float = 0.0
    # postnorm (EVA-CLIP ViT-E, vit_eva_clip.py:485-505): norm AFTER the
    # sublayer — x + drop_path(norm1(attn(x))), x + drop_path(norm2(mlp(x)))
    postnorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope_cos, rope_sin, deterministic: bool = True):
        shortcut = x
        y = x if self.postnorm else nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, name="norm1"
        )(x)
        if self.window_size > 0:
            h, w = y.shape[1], y.shape[2]
            y, pad_hw = window_partition(y, self.window_size)
        y = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            subln=self.subln,
            inner_attn_ln=self.inner_attn_ln,
            use_rel_pos=self.use_rel_pos,
            dtype=self.dtype,
            name="attn",
        )(y, rope_cos, rope_sin)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, pad_hw, (h, w))
        if self.postnorm:
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(y)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(y, deterministic)

        y = x if self.postnorm else nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, name="norm2"
        )(x)
        if self.mlp_type == "gelu":
            y = Mlp(
                hidden_dim=self.mlp_hidden_dim, out_dim=self.dim,
                dtype=self.dtype, name="mlp",
            )(y)
        else:
            y = SwiGLU(
                hidden_dim=self.mlp_hidden_dim,
                out_dim=self.dim,
                packed=self.packed_swiglu,
                subln=self.swiglu_subln,
                dtype=self.dtype,
                name="mlp",
            )(y)
        if self.postnorm:
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


class PatchEmbed(nn.Module):
    """Non-overlapping patchify as reshape + matmul.

    Param tree matches flax nn.Conv ({kernel (P,P,3,D), bias (D,)}) so the
    torch converter rules are unchanged, but the compute path avoids XLA's
    strided-conv lowering: 1.64 ms -> 0.10 ms at 1024^2/16 on v5e
    (experiments/backbone_fix_probe.py).
    """

    features: int
    patch_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        p = self.patch_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.reshape(b, h // p, p, w // p, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h // p, w // p, p * p * c).astype(self.dtype)
        y = x @ kernel.reshape(p * p * c, self.features).astype(self.dtype)
        return y + bias.astype(self.dtype)


class EVAViT(nn.Module):
    """Plain ViT with windowed/global blocks producing one stride-16 feature map."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4 * 2 / 3
    window_size: int = 14
    window_block_indexes: Sequence[int] = ()
    use_abs_pos: bool = True
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    pt_hw_seq_len: int = 16
    rope: bool = True
    subln: bool = False  # separate q/k/v projections (EVA-CLIP)
    inner_attn_ln: bool = False  # LN on attention output (EVA-CLIP subln)
    packed_swiglu: bool = False  # EVA-02 xops_SwiGLU packed w12
    swiglu_subln: bool = False  # ffn_ln inside SwiGLU (naiveswiglu)
    mlp_type: str = "swiglu"  # "gelu" = EVA-01 plain MLP
    use_rel_pos: bool = False  # EVA-01 decomposed relative positions
    postnorm: bool = False  # EVA-CLIP ViT-E post-sublayer norms
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W, 3) -> (B, H/16, W/16, embed_dim)."""
        x = PatchEmbed(
            self.embed_dim, self.patch_size, dtype=self.dtype, name="patch_embed"
        )(x)
        b, h, w, c = x.shape

        if self.use_abs_pos:
            num_patches = (self.pretrain_img_size // self.patch_size) ** 2
            num_positions = num_patches + (1 if self.pretrain_use_cls_token else 0)
            pos_embed = self.param(
                "pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, num_positions, self.embed_dim),
            )
            x = x + resize_abs_pos(
                pos_embed, self.pretrain_use_cls_token, (h, w)
            ).astype(x.dtype)

        half = self.embed_dim // self.num_heads // 2
        cos_w, sin_w = rope_2d_table(half, self.window_size, self.pt_hw_seq_len)
        cos_g, sin_g = rope_2d_table(half, h, self.pt_hw_seq_len)
        cos_w, sin_w = jnp.asarray(cos_w), jnp.asarray(sin_w)
        cos_g, sin_g = jnp.asarray(cos_g), jnp.asarray(sin_g)

        dpr = [
            self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)
        ]
        for i in range(self.depth):
            windowed = i in self.window_block_indexes
            x = Block(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_hidden_dim=int(self.embed_dim * self.mlp_ratio),
                window_size=self.window_size if windowed else 0,
                subln=self.subln,
                inner_attn_ln=self.inner_attn_ln,
                packed_swiglu=self.packed_swiglu,
                swiglu_subln=self.swiglu_subln,
                mlp_type=self.mlp_type,
                use_rel_pos=self.use_rel_pos,
                postnorm=self.postnorm,
                drop_path=dpr[i],
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(
                x,
                (cos_w if windowed else cos_g) if self.rope else None,
                (sin_w if windowed else sin_g) if self.rope else None,
                deterministic,
            )
        return x


class ConvLN(nn.Module):
    """Conv2d + channel LayerNorm (detectron2's Conv2d(norm=LN), NHWC)."""

    features: int
    kernel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            padding="SAME" if self.kernel > 1 else "VALID",
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)


class SimpleFeaturePyramid(nn.Module):
    """ViTDet SimpleFeaturePyramid: scale the single stride-16 map to p2..p6.

    Returns dict {"p2": (B,H/4,W/4,C), ..., "p6": (B,H/64,W/64,C)} NHWC.
    """

    net: EVAViT
    out_channels: int = 256
    scale_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5)
    top_block: bool = True  # LastLevelMaxPool -> p6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feat = self.net(x, deterministic)  # (B, H/16, W/16, D)
        dim = feat.shape[-1]
        results = {}
        for scale in self.scale_factors:
            stage = int(math.log2(16 / scale))
            name = f"simfp_{stage}"
            y = feat
            if scale == 4.0:
                y = nn.ConvTranspose(
                    dim // 2, (2, 2), strides=(2, 2), dtype=self.dtype, name=f"{name}_deconv1"
                )(y)
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"{name}_ln")(y)
                y = nn.gelu(y, approximate=False)
                y = nn.ConvTranspose(
                    dim // 4, (2, 2), strides=(2, 2), dtype=self.dtype, name=f"{name}_deconv2"
                )(y)
            elif scale == 2.0:
                y = nn.ConvTranspose(
                    dim // 2, (2, 2), strides=(2, 2), dtype=self.dtype, name=f"{name}_deconv1"
                )(y)
            elif scale == 1.0:
                pass
            elif scale == 0.5:
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
            else:
                raise NotImplementedError(scale)
            y = ConvLN(self.out_channels, 1, dtype=self.dtype, name=f"{name}_conv1x1")(y)
            y = ConvLN(self.out_channels, 3, dtype=self.dtype, name=f"{name}_conv3x3")(y)
            results[f"p{stage}"] = y
        if self.top_block:
            last = f"p{int(math.log2(16 / self.scale_factors[-1]))}"
            results["p6"] = nn.max_pool(
                results[last], (1, 1), strides=(2, 2), padding="VALID"
            )
        return results
