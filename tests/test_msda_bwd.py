"""Pallas window-MSDA backward kernels vs the exact-path VJP (interpret mode).

The production training path (ops/msda_dispatch) used jax.vjp of the exact
gather equivalent; the Pallas backward (ops/msda_window_pallas_bwd) must
reproduce those gradients: clip pass-through, hat subgradients, zero padding.
bf16 appears in the kernels' MXU contractions and value planes, so tolerances
are relative ~1e-2.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ape_tpu.ops.msda_dispatch import _exact_equiv
from ape_tpu.ops.msda_window_pallas_bwd import ms_deform_attn_window_pallas_bwd

pytestmark = pytest.mark.slow


@functools.lru_cache(maxsize=None)
def _jitted(shapes, radius):
    """One traced callable per geometry: the two off_scale parametrizations
    (and the clip test) share shapes, so jit caching cuts the interpret-mode
    trace cost from 3x to 1x per geometry."""
    bwd = jax.jit(
        lambda v, o, a, g: ms_deform_attn_window_pallas_bwd(
            v, shapes, o, a, g, radius=radius, interpret=True
        )
    )

    @jax.jit
    def ref(v, o, a, g):
        _, vjp = jax.vjp(lambda vv, oo, aa: _exact_equiv(vv, shapes, oo, aa, radius), v, o, a)
        return vjp(g)

    return bwd, ref

# Budget note: interpret-mode cost is dominated by per-pair-geometry tracing
# (O(win^2) tap graphs x pairs). The off_scale params and the clip test share
# ONE 2-level compile set (same-res/inv2/sx2 pairs); the batch-2 test carries
# the 3-level pyramid so inv4/sx4 backward geometry compiles exactly once.
SHAPES = ((16, 16), (8, 8))
SHAPES_3L = ((16, 16), (8, 8), (4, 4))
B, H, D, P = 1, 8, 32, 4
RADIUS = 2


def _inputs(seed, off_scale):
    rng = np.random.RandomState(seed)
    S = sum(h * w for h, w in SHAPES)
    value = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    # avoid integer-aligned sample positions: hat/floor subgradient ties there
    off = jnp.asarray(rng.randn(B, S, H, len(SHAPES), P, 2) * off_scale + 0.123, jnp.float32)
    att = jnp.asarray(rng.rand(B, S, H, len(SHAPES), P), jnp.float32)
    g = jnp.asarray(rng.randn(B, S, H * D), jnp.float32)
    return value, off, att, g


@pytest.mark.parametrize("off_scale", [0.4, 1.7])
def test_bwd_matches_exact_vjp(off_scale):
    value, off, att, g = _inputs(0, off_scale)

    bwd, ref = _jitted(SHAPES, RADIUS)
    dv_ref, do_ref, da_ref = ref(value, off, att, g)
    dv, do, da = bwd(value, off, att, g)

    for name, a, r in (("d_value", dv, dv_ref), ("d_off", do, do_ref), ("d_att", da, da_ref)):
        scale = max(1.0, float(jnp.abs(r).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-2 * scale,
            err_msg=f"{name} mismatch (off_scale={off_scale})",
        )


def test_bwd_clip_masks_gradients():
    """Offsets beyond the radius get zero offset-gradient (clip pass-through)."""
    value, off, att, g = _inputs(1, 0.5)
    off = off.at[0, 5, 2, 0, 1, 0].set(RADIUS + 3.0)  # x clipped
    off = off.at[0, 7, 1, 1, 0, 1].set(-(RADIUS + 2.0))  # y clipped

    bwd, _ = _jitted(SHAPES, RADIUS)
    dv, do, da = bwd(value, off, att, g)
    assert float(do[0, 5, 2, 0, 1, 0]) == 0.0
    assert float(do[0, 7, 1, 1, 0, 1]) == 0.0


def test_bwd_vp_input_mode():
    """APE_MSDA_BWD_VP: the merged kernel fed one unshifted vp slab (in-VMEM
    shifted plane builds) must match the pre-shifted-planes feed exactly.
    Smallest geometry with the same pair classes (same-res/inv2/sx2): this
    test costs two full interpret traces, one per input mode."""
    import ape_tpu.ops.msda_window_pallas_bwd as bwd

    shapes = ((8, 8), (4, 4))
    rng = np.random.RandomState(5)
    s = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(B, s, H, D), jnp.float32)
    off = jnp.asarray(rng.randn(B, s, H, len(shapes), P, 2) * 0.6 + 0.123, jnp.float32)
    att = jnp.asarray(rng.rand(B, s, H, len(shapes), P), jnp.float32)
    g = jnp.asarray(rng.randn(B, s, H * D), jnp.float32)
    base = ms_deform_attn_window_pallas_bwd(
        value, shapes, off, att, g, radius=RADIUS, interpret=True
    )
    orig = bwd.BWD_VP
    try:
        bwd.BWD_VP = not orig
        got = ms_deform_attn_window_pallas_bwd(
            value, shapes, off, att, g, radius=RADIUS, interpret=True
        )
    finally:
        bwd.BWD_VP = orig
    for name, a, r in zip(("d_value", "d_off", "d_att"), got, base):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=0, atol=0, err_msg=name
        )


def test_bwd_batch2_matches_exact_vjp():
    """b=2: the merged kernel's per-tile dvp RMW walks the batch as the
    outermost sequential grid dim; batch rows must not bleed into each other.
    Runs the 3-level pyramid so the inv4/sx4 backward geometries compile here
    (the only place they do — keep the level count if editing)."""
    rng = np.random.RandomState(3)
    S = sum(h * w for h, w in SHAPES_3L)
    value = jnp.asarray(rng.randn(2, S, H, D), jnp.float32)
    off = jnp.asarray(rng.randn(2, S, H, len(SHAPES_3L), P, 2) * 0.6 + 0.123, jnp.float32)
    att = jnp.asarray(rng.rand(2, S, H, len(SHAPES_3L), P), jnp.float32)
    g = jnp.asarray(rng.randn(2, S, H * D), jnp.float32)

    bwd, ref = _jitted(SHAPES_3L, RADIUS)
    dv_ref, do_ref, da_ref = ref(value, off, att, g)
    dv, do, da = bwd(value, off, att, g)
    for name, a, r in (("d_value", dv, dv_ref), ("d_off", do, do_ref), ("d_att", da, da_ref)):
        scale = max(1.0, float(jnp.abs(r).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-2 * scale,
            err_msg=f"{name} batch-2 mismatch",
        )
