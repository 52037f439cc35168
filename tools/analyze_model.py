#!/usr/bin/env python
"""Model analysis: parameters, FLOPs, activation sizes, structure.

Capability match: /root/reference/tools/analyze_model.py (fvcore flops/params/
activations) — here via jax's own cost analysis of the jitted forward.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--tasks", default="parameter,flop", help="parameter,flop,structure")
    p.add_argument("--image-size", type=int, default=0, help="override train.image_size")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ape_tpu.config import ConfigDict, LazyConfig, instantiate

    cfg = LazyConfig.load(args.config_file)
    LazyConfig.apply_overrides(cfg, [o for o in (args.opts or []) if "=" in o])
    model = instantiate(ConfigDict(model=cfg.model))["model"]
    img = args.image_size or int(cfg.train.get("image_size", 1024))
    num_text = int(cfg.train.get("num_text", 80))
    text_dim = int(cfg.train.get("text_dim", 1024))

    x = (
        jnp.zeros((1, img, img, 3)),
        jnp.asarray([[img, img]], jnp.int32),
        jnp.zeros((1, num_text, text_dim)),
        jnp.ones((1, num_text), bool),
    )
    params = model.init(jax.random.PRNGKey(0), *x)["params"]

    tasks = args.tasks.split(",")
    if "parameter" in tasks:
        total = sum(v.size for v in jax.tree.leaves(params))
        print(f"#parameters: {total / 1e6:.2f}M")
        by_top = {}
        from ape_tpu.checkpoint.convert import flatten_tree

        for k, v in flatten_tree(jax.tree.map(np.asarray, params)).items():
            top = k.split("/")[0]
            by_top[top] = by_top.get(top, 0) + v.size
        for k, v in sorted(by_top.items(), key=lambda kv: -kv[1]):
            print(f"  {k:30s} {v / 1e6:8.2f}M")

    if "flop" in tasks:
        fwd = jax.jit(lambda p, *a: model.apply({"params": p}, *a))
        lowered = fwd.lower(params, *x)
        cost = lowered.compile().cost_analysis()
        if cost:
            flops = cost.get("flops", float("nan"))
            print(f"forward GFLOPs @ {img}x{img}: {flops / 1e9:.1f}")
            print(f"bytes accessed: {cost.get('bytes accessed', float('nan')) / 1e9:.2f} GB")

    if "structure" in tasks:
        print(jax.tree_util.tree_structure(params))


if __name__ == "__main__":
    main()
