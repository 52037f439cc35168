"""Window MSDA must match exact gather MSDA when offsets are within the window."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ape_tpu.ops.msda import ms_deform_attn
from ape_tpu.ops.msda_window import (
    ms_deform_attn_window,
    pixel_offsets_to_locations,
)


def make_pyramid_inputs(rng, b=1, heads=2, d=4, spatial_shapes=((8, 8), (4, 4), (2, 2)), p=3, max_off=3.0):
    s = sum(hh * ww for hh, ww in spatial_shapes)
    l = len(spatial_shapes)
    value = rng.randn(b, s, heads, d).astype(np.float32)
    off = rng.uniform(-max_off, max_off, size=(b, s, heads, l, p, 2)).astype(np.float32)
    w = rng.rand(b, s, heads, l, p).astype(np.float32)
    w /= w.reshape(b, s, heads, -1).sum(-1)[..., None, None]
    return value, off, w


# Budget note: the window oracle unrolls O(win^2) taps per pair at trace time,
# and tracing (not XLA compile — that's cached) dominates these tests on the
# 1-core VM. Multi-level params run radius 3; the production radius-4 window
# is pinned by the single-level param and the clamp test.
@pytest.mark.parametrize(
    "spatial_shapes,radius",
    [
        (((8, 8), (4, 4), (2, 2)), 3),
        (((8, 8),), 4),
        (((16, 16), (8, 8), (4, 4), (2, 2)), 3),
    ],
)
def test_window_matches_exact(rng, spatial_shapes, radius):
    value, off, w = make_pyramid_inputs(
        rng, spatial_shapes=spatial_shapes, max_off=float(radius)
    )
    out_win = ms_deform_attn_window(
        jnp.asarray(value), spatial_shapes, jnp.asarray(off), jnp.asarray(w), radius=radius
    )
    loc = pixel_offsets_to_locations(spatial_shapes, jnp.asarray(off))
    out_exact = ms_deform_attn(jnp.asarray(value), spatial_shapes, loc, jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(out_win), np.asarray(out_exact), rtol=1e-4, atol=1e-5
    )


def test_window_clamps_large_offsets(rng):
    """Offsets beyond the radius are clamped: result equals exact MSDA with clipped offsets."""
    spatial_shapes = ((8, 8), (4, 4))
    value, off, w = make_pyramid_inputs(rng, spatial_shapes=spatial_shapes, max_off=10.0)
    out_win = ms_deform_attn_window(
        jnp.asarray(value), spatial_shapes, jnp.asarray(off), jnp.asarray(w), radius=4
    )
    loc = pixel_offsets_to_locations(spatial_shapes, jnp.clip(jnp.asarray(off), -4, 4))
    out_exact = ms_deform_attn(jnp.asarray(value), spatial_shapes, loc, jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(out_win), np.asarray(out_exact), rtol=1e-4, atol=1e-5
    )


def test_window_gradients_flow(rng):
    spatial_shapes = ((4, 4), (2, 2))
    value, off, w = make_pyramid_inputs(rng, spatial_shapes=spatial_shapes, max_off=0.9)

    def f(v, o, a):
        return ms_deform_attn_window(v, spatial_shapes, o, a, radius=1).sum()

    gv, go, ga = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(off), jnp.asarray(w)
    )
    # compare against the exact-path gradients through the location bridge
    def g(v, o, a):
        loc = pixel_offsets_to_locations(spatial_shapes, o)
        return ms_deform_attn(v, spatial_shapes, loc, a).sum()

    gv2, go2, ga2 = jax.grad(g, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(off), jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(go), np.asarray(go2), rtol=1e-3, atol=1e-4)


def test_window_clamp_fraction():
    import numpy as np

    from ape_tpu.ops.msda_dispatch import window_clamp_fraction

    off = np.zeros((2, 10, 4, 2, 4, 2), np.float32)
    off[0, 0, 0, 0, 0, 0] = 9.0  # one offset beyond the radius
    frac = window_clamp_fraction(off, radius=4)
    assert abs(frac - 1.0 / off.size) < 1e-9
    assert window_clamp_fraction(np.full_like(off, 2.0), radius=4) == 0.0
