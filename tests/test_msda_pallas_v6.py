"""v6 transposed-layout window-MSDA kernel vs the XLA window reference.

The v6 kernel (experiments/msda_window_pallas_v6.py) holds value tiles channels-on-
sublanes / window-x-on-lanes so the per-tap weight path is pure VPU FMA
(no MXU expansion — the v2 K=32 floor). Semantics are identical to the XLA
oracle; these interpret-mode tests pin that on the full op (mixed v6+v2
chain: narrow query levels fall back to v2) and on the strided-pair path.

Budgeted like test_msda_pallas.py: wq must be a multiple of 128 for v6 to
engage, so geometries are wide-but-short and each unique pair geometry is
traced once.
"""

import pytest

# heavy tier: the v6 kernel is a documented negative result living in
# experiments/ (chip A/B loses ~1.6x to v2, PERF.md r4) — its parity guard
# does not need to run in the slow-tier CI window
pytestmark = [pytest.mark.slow, pytest.mark.heavy]

import numpy as np

import jax.numpy as jnp

from ape_tpu.ops.msda_window import ms_deform_attn_window
from experiments.msda_window_pallas_v6 import (
    _run_pair_v6,
    ms_deform_attn_window_pallas_v6,
)
from ape_tpu.ops.msda_window_pallas_v2 import _run_pair_v2

H, D, P, R = 8, 32, 4, 4


def make_inputs(rng, spatial_shapes, b=1):
    s = sum(hh * ww for hh, ww in spatial_shapes)
    l = len(spatial_shapes)
    value = rng.randn(b, s, H, D).astype(np.float32)
    off = rng.uniform(-(R + 2), R + 2, size=(b, s, H, l, P, 2)).astype(np.float32)
    w = rng.rand(b, s, H, l, P).astype(np.float32)
    w /= w.reshape(b, s, H, -1).sum(-1)[..., None, None]
    return jnp.asarray(value), jnp.asarray(off), jnp.asarray(w)


def test_v6_full_op_mixed_chain(rng):
    # level 0 (wq=128) runs v6, level 1 (wq=64) falls back to v2 — exercises
    # the transposed-partial fold between the two chains
    shapes = ((8, 128), (4, 64))
    value, off, w = make_inputs(rng, shapes)
    ref = ms_deform_attn_window(value, shapes, off, w, radius=R)
    out = ms_deform_attn_window_pallas_v6(value, shapes, off, w, radius=R, interpret=True)
    # bf16 value slabs inside the kernel
    assert float(jnp.abs(out - ref).max()) < 2e-2


@pytest.mark.parametrize(
    "hq,wq,hv,wv",
    [
        (8, 128, 2, 32),   # coarser value: inv4, sub-8 lane shifts
        (4, 128, 16, 512), # finer value: sx4 phase decomposition
    ],
)
def test_v6_pair_matches_v2(rng, hq, wq, hv, wv):
    vd = jnp.asarray(rng.randn(1, hv * wv, H * D).astype(np.float32))
    off = jnp.asarray((rng.randn(1, hq * wq, H, P, 2) * 3).astype(np.float32))
    att = jnp.asarray(rng.rand(1, hq * wq, H, P).astype(np.float32))
    o2 = _run_pair_v2(vd, off, att, hq, wq, hv, wv, R, H, D, P, interpret=True)
    o6 = _run_pair_v6(vd, off, att, hq, wq, hv, wv, R, H, D, P, interpret=True)
    o6 = o6.transpose(0, 1, 3, 2).reshape(1, hq * wq, H * D)
    assert float(jnp.abs(o2 - o6).max()) < 3e-2
