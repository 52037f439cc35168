"""MSDA parity vs a torch grid_sample oracle.

The oracle reproduces the reference's pure-pytorch fallback semantics
(bilinear grid_sample, align_corners=False, zero padding, weighted sum over
levels x points) independently, so our XLA/Pallas kernels are validated against
torch's battle-tested sampler rather than against themselves.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ape_tpu.ops.msda import ms_deform_attn, level_start_index


def torch_oracle(value, spatial_shapes, loc, weights):
    """value (B,S,H,D); loc (B,Q,H,L,P,2) xy in [0,1]; weights (B,Q,H,L,P)."""
    b, s, h, d = value.shape
    _, q, _, l, p, _ = loc.shape
    value_t = torch.from_numpy(value)
    loc_t = torch.from_numpy(loc)
    w_t = torch.from_numpy(weights)
    splits = [hh * ww for hh, ww in spatial_shapes]
    value_list = value_t.split(splits, dim=1)
    grids = 2 * loc_t - 1
    sampled = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(b * h, d, hh, ww)
        g = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4).flatten(0, 1)  # (B*H,Q,P,2)
        out = F.grid_sample(
            v, g, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # (B*H, D, Q, P)
        sampled.append(out)
    w = w_t.permute(0, 2, 1, 3, 4).reshape(b * h, 1, q, l * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * w).sum(-1)
    out = out.view(b, h * d, q).transpose(1, 2)
    return out.numpy()


def make_inputs(rng, b=2, heads=2, d=4, q=10, spatial_shapes=((6, 8), (3, 4)), p=3):
    s = sum(hh * ww for hh, ww in spatial_shapes)
    l = len(spatial_shapes)
    value = rng.randn(b, s, heads, d).astype(np.float32)
    # include out-of-range locations to exercise zero padding
    loc = rng.uniform(-0.2, 1.2, size=(b, q, heads, l, p, 2)).astype(np.float32)
    w = rng.rand(b, q, heads, l, p).astype(np.float32)
    w /= w.reshape(b, q, heads, -1).sum(-1)[..., None, None]
    return value, loc, w


@pytest.mark.parametrize("spatial_shapes", [((6, 8), (3, 4)), ((16, 16),), ((8, 8), (4, 4), (2, 2))])
def test_msda_matches_torch(rng, spatial_shapes):
    value, loc, w = make_inputs(rng, spatial_shapes=spatial_shapes)
    ref = torch_oracle(value, spatial_shapes, loc, w)
    out = np.asarray(ms_deform_attn(jnp.asarray(value), spatial_shapes, jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_msda_query_chunking(rng):
    spatial_shapes = ((6, 8), (3, 4))
    value, loc, w = make_inputs(rng, q=12, spatial_shapes=spatial_shapes)
    full = ms_deform_attn(jnp.asarray(value), spatial_shapes, jnp.asarray(loc), jnp.asarray(w))
    chunked = ms_deform_attn(
        jnp.asarray(value), spatial_shapes, jnp.asarray(loc), jnp.asarray(w), query_chunk=4
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=1e-6, atol=1e-6)


def test_msda_grad_matches_torch(rng):
    spatial_shapes = ((5, 7), (3, 3))
    value, loc, w = make_inputs(rng, b=1, q=6, spatial_shapes=spatial_shapes)

    # torch grads
    vt = torch.from_numpy(value).requires_grad_(True)
    lt = torch.from_numpy(loc).requires_grad_(True)
    wt = torch.from_numpy(w).requires_grad_(True)
    b, s, h, d = value.shape
    splits = [hh * ww for hh, ww in spatial_shapes]
    grids = 2 * lt - 1
    sampled = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        v = vt.split(splits, dim=1)[lvl].flatten(2).transpose(1, 2).reshape(b * h, d, hh, ww)
        g = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4).flatten(0, 1)
        sampled.append(
            F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        )
    q, l, p = loc.shape[1], loc.shape[3], loc.shape[4]
    wr = wt.permute(0, 2, 1, 3, 4).reshape(b * h, 1, q, l * p)
    out_t = (torch.stack(sampled, dim=-2).flatten(-2) * wr).sum(-1).view(b, h * d, q).transpose(1, 2)
    out_t.sum().backward()

    def f(v, lo, we):
        return ms_deform_attn(v, spatial_shapes, lo, we).sum()

    gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(gv), vt.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), wt.grad.numpy(), rtol=1e-4, atol=1e-5)
    # grad wrt locations: exclude samples whose corners straddle the image border,
    # where grid_sample's subgradient convention may differ
    np.testing.assert_allclose(np.asarray(gl), lt.grad.numpy(), rtol=1e-3, atol=1e-3)


def test_level_start_index():
    starts, total = level_start_index(((4, 4), (2, 2), (1, 1)))
    assert starts == (0, 16, 20)
    assert total == 21
