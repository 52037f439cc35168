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

# TPU v5e public spec: bf16 peak and HBM bandwidth per chip.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_S = 819e9


def aot_compile_with_cost(fn, *args, **jit_kwargs):
    """jit-compile fn AOT; return (compiled_callable, cost_dict).

    One compile serves both timing and XLA cost analysis (flops / bytes
    accessed — custom calls, i.e. Pallas kernels, count as zero flops, the
    same convention as the reference's fvcore protocol which cannot see
    inside its CUDA op).
    """
    import jax

    lowered = jax.jit(fn, **jit_kwargs).lower(*args)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis() or {}
    except Exception:
        cost = {}
    return compiled, cost


def mfu_fields(cost, img_per_s, batch=1):
    """MFU/bandwidth-utilization JSON fields from a cost dict + measured rate."""
    out = {}
    flops = float(cost.get("flops", 0.0)) / max(batch, 1)
    bytes_acc = float(cost.get("bytes accessed", 0.0)) / max(batch, 1)
    if flops > 0:
        out["xla_gflops_per_img"] = round(flops / 1e9, 1)
        out["mfu_pct"] = round(100 * flops * img_per_s / V5E_PEAK_BF16_FLOPS, 2)
    if bytes_acc > 0:
        out["hbm_gb_per_img"] = round(bytes_acc / 1e9, 2)
        out["hbm_util_pct"] = round(100 * bytes_acc * img_per_s / V5E_HBM_BYTES_S, 1)
    return out


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
