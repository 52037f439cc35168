"""Probe fixes for the two slow backbone pieces (experiments/backbone_probe.py):
global-block attention (1.32 ms each, ~13x roofline) and the stride-16 patch
conv (1.17 ms, ~20x roofline).

    python experiments/backbone_fix_probe.py
"""

from __future__ import annotations

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from experiments.backbone_probe import timed

B, H, N, D = 1, 3, 4096, 64
DT = jnp.bfloat16


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, N, D), DT)
    k = jnp.asarray(rng.randn(B, H, N, D), DT)
    v = jnp.asarray(rng.randn(B, H, N, D), DT)
    scale = D**-0.5

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    def flash_default(q):
        return flash_attention(q, k, v, sm_scale=scale)

    def flash_big(q):
        bs = BlockSizes(
            block_q=1024, block_k_major=1024, block_k=1024, block_b=1,
            block_q_major_dkv=1024, block_k_major_dkv=1024,
            block_k_dkv=1024, block_q_dkv=1024,
            block_k_major_dq=1024, block_k_dq=1024, block_q_dq=1024,
        )
        return flash_attention(q, k, v, sm_scale=scale, block_sizes=bs)

    def einsum_attn(q):
        a = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", a, v)

    def einsum_bf16sm(q):
        a = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        a = jax.nn.softmax(a, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", a, v)

    # fold 3 heads into one 192-wide... not equivalent; instead fold heads into
    # the batch/row axis so each matmul is bigger: (H*N, D) x (D, N) per head is
    # what einsum already does. Try merged-qk layout: heads on lanes.
    which = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else {
        "einsum_f32", "einsum_bf16", "flash", "flash_big", "patch"
    }
    for name, key, fn in (
        ("einsum f32 softmax", "einsum_f32", einsum_attn),
        ("einsum bf16 softmax", "einsum_bf16", einsum_bf16sm),
        ("flash default", "flash", flash_default),
        ("flash 1024 blocks", "flash_big", flash_big),
    ):
        if key not in which:
            continue
        try:
            t = timed(fn, q, chains=(1, 5))
            print(f"  {name:20s}: {t*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"  {name:20s}: FAILED {type(e).__name__} {str(e)[:120]}", flush=True)
    if "patch" not in which:
        return

    # ---- patchify ----
    img = jnp.asarray(rng.randn(1, 1024, 1024, 3), jnp.float32)
    wconv = jnp.asarray(rng.randn(16, 16, 3, 192) * 0.02, DT)
    bias = jnp.asarray(rng.randn(192) * 0.02, DT)

    def conv_patch(img):
        y = jax.lax.conv_general_dilated(
            img.astype(DT), wconv, (16, 16), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias

    wmat = wconv.reshape(768, 192)

    def matmul_patch(img):
        x = img.reshape(1, 64, 16, 64, 16, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(1, 64, 64, 768).astype(DT)
        return jnp.einsum("bhwc,cd->bhwd", x, wmat) + bias

    # parity
    d = jax.jit(lambda im: jnp.max(jnp.abs(conv_patch(im) - matmul_patch(im))))(img)
    print(f"  patchify parity max|diff| = {float(d):.2e}", flush=True)
    for name, fn in (("conv patchify", conv_patch), ("matmul patchify", matmul_patch)):
        t = timed(fn, img, chains=(1, 9))
        print(f"  {name:20s}: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
