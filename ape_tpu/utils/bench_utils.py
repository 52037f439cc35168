"""Shared helpers for the benchmark entry points (bench.py, tools/bench_*.py).

Keeps the two protocol-critical behaviors in ONE place so the inference and
training benches cannot drift:

  * synth_params      — shape-only parameter synthesis (model.init would
                        compile the forward a second time through the slow
                        remote-compile tunnel).
  * rearm_offsets     — re-arm every ``sampling_offsets`` bias with the
                        reference's directional ring init (deformable
                        transformer init: head h at angle 2*pi*h/H, point p at
                        radius p+1 — multi-pixel taps). N(0, 0.02) synthesis
                        leaves the offsets near zero, which lets the window
                        kernels' inactive-tap skip flatter MSDA ~2x vs trained
                        weights (PERF.md "Realistic-offset pair costs").
"""

from __future__ import annotations

import numpy as np


def synth_params(model, example_args, seed=0):
    """Parameters with the right shapes/dtypes via eval_shape (no compile)."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(
        lambda r: model.init(r, *example_args), jax.random.PRNGKey(seed)
    )["params"]
    prng = np.random.RandomState(seed)

    def synth(s):
        return jnp.asarray(prng.normal(0, 0.02, s.shape).astype(s.dtype))

    return jax.tree.map(synth, shapes)


def rearm_offsets(params, off_scale=1.0, heads=8, points=4):
    """Replace every sampling_offsets bias with the reference ring init."""
    import jax
    import jax.numpy as jnp

    from ape_tpu.layers.msda_module import _offset_bias_init

    def rearm(path, leaf):
        keys = [getattr(p, "key", "") for p in path]
        if "sampling_offsets" in keys and keys[-1] == "bias":
            h_l_p = leaf.shape[0] // 2
            levels = h_l_p // (heads * points)
            return jnp.asarray(
                _offset_bias_init(heads, levels, points) * off_scale, leaf.dtype
            )
        return leaf

    return jax.tree_util.tree_map_with_path(rearm, params)
