"""Dense separable-bilinear decoder MSDA vs the exact-gather oracle."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ape_tpu.ops.msda import ms_deform_attn
from ape_tpu.ops.msda_decoder import ms_deform_attn_dense

SHAPES = ((13, 17), (7, 9), (4, 4))
# the grad tests pay tracing for fwd+bwd of every level's separable build —
# two odd-shaped levels already cover the blocked/edge paths
SHAPES_2L = ((13, 17), (7, 9))


def _inputs(rng, b=2, q=31, h=4, d=8, p=4, shapes=SHAPES):
    l = len(shapes)
    s = sum(hh * ww for hh, ww in shapes)
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (b, q, h, l, p, 2)), jnp.float32)
    w = jax.nn.softmax(jnp.asarray(rng.randn(b, q, h, l * p), jnp.float32), -1)
    return v, loc, w.reshape(b, q, h, l, p)


def test_forward_parity(rng):
    v, loc, w = _inputs(rng)
    ref = ms_deform_attn(v, SHAPES, loc, w)
    got = ms_deform_attn_dense(v, SHAPES, loc, w, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_grad_parity(rng):
    v, loc, w = _inputs(rng, q=9, shapes=SHAPES_2L)

    def f_ref(v, loc, w):
        return (ms_deform_attn(v, SHAPES_2L, loc, w) ** 2).sum()

    def f_got(v, loc, w):
        return (
            ms_deform_attn_dense(
                v, SHAPES_2L, loc, w, precision=jax.lax.Precision.HIGHEST
            )
            ** 2
        ).sum()

    gr = jax.grad(f_ref, (0, 1, 2))(v, loc, w)
    gg = jax.grad(f_got, (0, 1, 2))(v, loc, w)
    for a, b_ in zip(gr, gg):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-4 * scale
        )


@pytest.mark.parametrize("row_block", [1, 3, 64])
def test_row_blocking_invariance(rng, row_block):
    v, loc, w = _inputs(rng, q=5)
    base = ms_deform_attn_dense(
        v, SHAPES, loc, w, precision=jax.lax.Precision.HIGHEST
    )
    got = ms_deform_attn_dense(
        v, SHAPES, loc, w, row_block=row_block, precision=jax.lax.Precision.HIGHEST
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(got), atol=1e-5)


def test_out_of_range_zero_padding(rng):
    """Samples fully outside the grid contribute exactly zero (grid_sample pad)."""
    v, loc, w = _inputs(rng, q=4)
    loc_out = jnp.full_like(loc, 3.0)  # all samples far outside every level
    got = ms_deform_attn_dense(
        v, SHAPES, loc_out, w, precision=jax.lax.Precision.HIGHEST
    )
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-7)


def test_hybrid_decoder_vjp_matches_exact(rng):
    """ms_deform_attn_decoder: gather fwd + dense bwd == pure gather autodiff."""
    from ape_tpu.ops.msda_decoder import ms_deform_attn_decoder

    v, loc, w = _inputs(rng, q=7, shapes=SHAPES_2L)

    def f_h(v, loc, w):
        return (ms_deform_attn_decoder(v, SHAPES_2L, loc, w) ** 2).sum()

    def f_e(v, loc, w):
        return (ms_deform_attn(v, SHAPES_2L, loc, w) ** 2).sum()

    np.testing.assert_allclose(float(f_h(v, loc, w)), float(f_e(v, loc, w)), rtol=1e-6)
    gh = jax.grad(f_h, (0, 1, 2))(v, loc, w)
    ge = jax.grad(f_e, (0, 1, 2))(v, loc, w)
    for a, b_ in zip(gh, ge):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4 * scale)
