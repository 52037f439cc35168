"""EVA ViT backbone tests: utils correctness vs torch oracles + shape/variant checks."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ape_tpu.modeling.backbone.eva_vit import EVAViT, SimpleFeaturePyramid
from ape_tpu.modeling.backbone.vit_utils import (
    apply_rope,
    bicubic_resize_matrix,
    resize_abs_pos,
    rope_2d_table,
    rotate_half,
    window_partition,
    window_unpartition,
)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 10, 10, 4).astype(np.float32))
    wins, pad_hw = window_partition(x, 4)
    assert wins.shape == (2 * 3 * 3, 4, 4, 4)
    assert pad_hw == (12, 12)
    back = window_unpartition(wins, 4, pad_hw, (10, 10))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_window_partition_matches_torch_layout(rng):
    """Same permutation as the reference (utils_eva02.py:19-40)."""
    import torch
    import torch.nn.functional as F

    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    wins, _ = window_partition(jnp.asarray(x), 3)
    xt = torch.from_numpy(x)
    xt = xt.view(1, 2, 3, 2, 3, 2).permute(0, 1, 3, 2, 4, 5).reshape(-1, 3, 3, 2)
    np.testing.assert_allclose(np.asarray(wins), xt.numpy())


def test_bicubic_matrix_matches_torch():
    import torch
    import torch.nn.functional as F

    v = np.random.RandomState(1).randn(1, 3, 14, 14).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(v), size=(20, 20), mode="bicubic", align_corners=False
    ).numpy()
    my = bicubic_resize_matrix(14, 20)
    out = np.einsum("hs,cst->cht", my, v[0])
    out = np.einsum("wt,cht->chw", bicubic_resize_matrix(14, 20), out)
    np.testing.assert_allclose(out, ref[0], rtol=1e-3, atol=1e-4)


def test_resize_abs_pos_with_cls(rng):
    pos = jnp.asarray(rng.randn(1, 1 + 14 * 14, 8).astype(np.float32))
    out = resize_abs_pos(pos, True, (9, 9))
    assert out.shape == (1, 9, 9, 8)
    # identity when sizes match
    out_same = resize_abs_pos(pos, True, (14, 14))
    np.testing.assert_allclose(
        np.asarray(out_same).reshape(-1, 8), np.asarray(pos)[0, 1:], atol=1e-6
    )


def test_rope_matches_reference_math(rng):
    """Re-derive VisionRotaryEmbeddingFast (utils_eva02.py:312-346) in numpy."""
    half, seq, pt = 8, 4, 16
    cos, sin = rope_2d_table(half, seq, pt)
    # independent derivation
    dim = half
    freqs = 1.0 / (10000 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    t = np.arange(seq) / seq * pt
    f = np.einsum("n,f->nf", t, freqs)
    f = np.repeat(f, 2, axis=-1)
    full = np.concatenate(
        [
            np.broadcast_to(f[:, None, :], (seq, seq, dim)),
            np.broadcast_to(f[None, :, :], (seq, seq, dim)),
        ],
        -1,
    ).reshape(seq * seq, 2 * dim)
    np.testing.assert_allclose(cos, np.cos(full), rtol=1e-6)

    # rotation preserves norm
    x = jnp.asarray(rng.randn(2, 3, seq * seq, 2 * half).astype(np.float32))
    y = apply_rope(x, jnp.asarray(cos), jnp.asarray(sin))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )
    # position 0 (freq*0) is identity
    np.testing.assert_allclose(np.asarray(y)[..., 0, :], np.asarray(x)[..., 0, :], rtol=1e-5)


def test_rotate_half():
    x = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(rotate_half(x)), [[-2.0, 1.0, -4.0, 3.0]])


@pytest.mark.parametrize("subln", [False, True])
def test_vit_forward_shapes(rng, subln):
    vit = EVAViT(
        img_size=64,
        embed_dim=32,
        depth=2,
        num_heads=2,
        window_size=2,
        window_block_indexes=(0,),
        pretrain_img_size=32,
        subln=subln,
        inner_attn_ln=subln,
        packed_swiglu=not subln,
        swiglu_subln=subln,
    )
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    params = vit.init(jax.random.PRNGKey(0), x)
    out = vit.apply(params, x)
    assert out.shape == (1, 4, 4, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_sfp_output_pyramid(rng):
    sfp = SimpleFeaturePyramid(
        net=EVAViT(
            img_size=64,
            embed_dim=32,
            depth=1,
            num_heads=2,
            window_size=2,
            window_block_indexes=(),
            pretrain_img_size=32,
            packed_swiglu=True,
        ),
        out_channels=16,
    )
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    params = sfp.init(jax.random.PRNGKey(0), x)
    out = sfp.apply(params, x)
    assert set(out.keys()) == {"p2", "p3", "p4", "p5", "p6"}
    assert out["p2"].shape == (1, 16, 16, 16)
    assert out["p3"].shape == (1, 8, 8, 16)
    assert out["p4"].shape == (1, 4, 4, 16)
    assert out["p5"].shape == (1, 2, 2, 16)
    assert out["p6"].shape == (1, 1, 1, 16)
