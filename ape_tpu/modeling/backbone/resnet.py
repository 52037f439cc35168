"""ResNet backbone (detectron2-style) for the APE-DETA r50 config family.

Capability match: the reference's base model config builds a detectron2
`ResNet` with `BasicStem` + `make_default_stages(depth=50, stride_in_1x1=False,
norm="FrozenBN")`, `out_features=["res2".."res5"]`, `freeze_at=1`
(/root/reference/configs/COCO_InstanceSegmentation/ape_deta/models/
ape_deta_r50.py:25-34), feeding a detrex ChannelMapper over res3-5 with
num_outs=5 (:41-52).

TPU-first notes: NHWC layout, bias-free convs + frozen-affine batchnorm
(inference statistics folded at call time — a pure elementwise FMA that XLA
fuses into the convolution epilogue), explicit torch-equivalent padding so
converted checkpoints are bit-faithful, `stop_gradient` freezing for
`freeze_at` stages and the BN constants. With `stride_in_1x1=False` the
detectron2 layout equals torchvision resnet50, which is the conversion /
parity oracle (tests/test_resnet_parity.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# depth -> blocks per stage (res2..res5); bottleneck depths only — the r50
# config family never uses basic-block (18/34) variants
_STAGE_BLOCKS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine (d2 FrozenBatchNorm2d).

    Stored as raw (scale, bias, mean, var) so converted checkpoints keep the
    torch values verbatim; the fold into one multiply-add happens per call.
    All four are `stop_gradient`-ed — they never train, matching the
    reference's norm="FrozenBN" everywhere in the r50 family.
    """

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        scale, bias, mean, var = (
            jax.lax.stop_gradient(t) for t in (scale, bias, mean, var)
        )
        mul = (scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        return x * mul + add


def _conv(x, features, kernel, stride, pad, name, dtype):
    """Bias-free conv with explicit torch-equivalent symmetric padding."""
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        dtype=dtype,
        name=name,
    )(x)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck with FrozenBN.

    stride_in_1x1=False (the reference's setting): the stage stride sits on
    the 3x3 conv, i.e. the torchvision layout.
    """

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    has_shortcut: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        sc = x
        if self.has_shortcut:
            sc = _conv(x, self.out_channels, 1, self.stride, 0, "shortcut", self.dtype)
            sc = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="shortcut_norm")(sc)
        y = _conv(x, self.bottleneck_channels, 1, 1, 0, "conv1", self.dtype)
        y = nn.relu(FrozenBatchNorm(self.bottleneck_channels, dtype=self.dtype, name="norm1")(y))
        y = _conv(y, self.bottleneck_channels, 3, self.stride, 1, "conv2", self.dtype)
        y = nn.relu(FrozenBatchNorm(self.bottleneck_channels, dtype=self.dtype, name="norm2")(y))
        y = _conv(y, self.out_channels, 1, 1, 0, "conv3", self.dtype)
        y = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="norm3")(y)
        return nn.relu(y + sc)


class ResNet(nn.Module):
    """detectron2-equivalent ResNet producing a {res2..res5} feature dict.

    freeze_at: 0 trains everything, 1 freezes the stem, n>=2 freezes the stem
    and the first n-1 stages (d2 ResNet.freeze semantics). Freezing is a
    `stop_gradient` on the frozen prefix's output — with all norms already
    frozen this equals d2's requires_grad_(False) for AdamW updates when the
    optimizer masks the frozen subtree (engine/optimizer.py frozen_regex).
    """

    depth: int = 50
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    freeze_at: int = 1
    stem_out_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> dict:
        del deterministic  # no dropout anywhere in the r50 family
        blocks_per_stage = _STAGE_BLOCKS[self.depth]
        x = _conv(x, self.stem_out_channels, 7, 2, 3, "stem_conv", self.dtype)
        x = nn.relu(FrozenBatchNorm(self.stem_out_channels, dtype=self.dtype, name="stem_norm")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        feats = {}
        in_channels = self.stem_out_channels
        out_channels = 256
        for stage_idx, num_blocks in enumerate(blocks_per_stage):  # res2..res5
            stage_name = f"res{stage_idx + 2}"
            first_stride = 1 if stage_idx == 0 else 2
            for i in range(num_blocks):
                x = BottleneckBlock(
                    out_channels=out_channels,
                    bottleneck_channels=out_channels // 4,
                    stride=first_stride if i == 0 else 1,
                    has_shortcut=(i == 0),
                    dtype=self.dtype,
                    name=f"{stage_name}_block{i}",
                )(x)
            if self.freeze_at >= stage_idx + 2:
                x = jax.lax.stop_gradient(x)
            if stage_name in self.out_features:
                feats[stage_name] = x
            in_channels = out_channels
            out_channels *= 2
        return feats
