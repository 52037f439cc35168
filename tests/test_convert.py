"""Checkpoint converter: build a reference-style torch state dict from our own
param shapes, convert, and check coverage + layout correctness."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

import jax
import jax.numpy as jnp

from ape_tpu.checkpoint.convert import (
    convert_torch_state_dict,
    flatten_tree,
    unflatten_tree,
)
from ape_tpu.modeling.build import build_ape_ti


def test_flatten_roundtrip():
    tree = {"a": {"b": np.zeros(3), "c": {"d": np.ones(2)}}, "e": np.ones(1)}
    flat = flatten_tree(tree)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    back = unflatten_tree(flat)
    assert back["a"]["c"]["d"].shape == (2,)


def test_convert_vit_block_names(rng):
    """Reference-style ViT block keys land on our tree with correct layout."""
    sd = {
        "model_vision.backbone.net.blocks.0.norm1.weight": rng.randn(8),
        "model_vision.backbone.net.blocks.0.norm1.bias": rng.randn(8),
        "model_vision.backbone.net.blocks.0.attn.qkv.weight": rng.randn(24, 8),
        "model_vision.backbone.net.blocks.0.attn.q_bias": rng.randn(8),
        "model_vision.backbone.net.blocks.0.attn.v_bias": rng.randn(8),
        "model_vision.backbone.net.blocks.0.attn.proj.weight": rng.randn(8, 8),
        "model_vision.backbone.net.blocks.0.attn.proj.bias": rng.randn(8),
        "model_vision.backbone.net.blocks.0.mlp.w12.weight": rng.randn(12, 8),
        "model_vision.backbone.net.blocks.0.mlp.w12.bias": rng.randn(12),
        "model_vision.backbone.net.blocks.0.mlp.w3.weight": rng.randn(8, 6),
        "model_vision.backbone.net.blocks.0.mlp.w3.bias": rng.randn(8),
        "model_vision.backbone.net.patch_embed.proj.weight": rng.randn(8, 3, 16, 16),
        "model_vision.backbone.net.patch_embed.proj.bias": rng.randn(8),
        "model_vision.backbone.net.pos_embed": rng.randn(1, 197, 8),
    }
    flat = convert_torch_state_dict(sd)
    assert flat["backbone/net/blocks_0/norm1/scale"].shape == (8,)
    assert flat["backbone/net/blocks_0/attn/qkv/kernel"].shape == (8, 24)
    np.testing.assert_allclose(
        flat["backbone/net/blocks_0/attn/qkv/kernel"],
        sd["model_vision.backbone.net.blocks.0.attn.qkv.weight"].T,
    )
    assert flat["backbone/net/patch_embed/kernel"].shape == (16, 16, 3, 8)


def test_convert_covers_ape_ti_tree(rng):
    """Synthesize reference names from our APE-Ti tree (inverse mapping) and
    check the converter hits a large fraction of the real parameter set."""
    model = build_ape_ti(img_size=64, num_queries=12, window_radius=2)
    x = jnp.zeros((1, 64, 64, 3))
    # only names+shapes matter here: eval_shape skips XLA compile/execute of
    # the full forward (~60 s -> seconds on CPU)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            x,
            jnp.asarray([[64, 64]]),
            jnp.zeros((1, 4, 1024)),
            jnp.ones((1, 4), bool),
        )
    )["params"]
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    flat = flatten_tree(params)

    # build the torch-style dict by inverting our naming rules
    sd = {}
    for k, v in flat.items():
        name = k.replace("/", ".")
        if name.endswith(".kernel"):
            base = name[: -len(".kernel")]
            if v.ndim == 2:
                sd_name, val = base + ".weight", v.T
            elif v.ndim == 4:
                sd_name, val = base + ".weight", v.transpose(3, 2, 0, 1)
            else:
                continue
        elif name.endswith(".scale"):
            sd_name, val = name[: -len(".scale")] + ".weight", v
        else:
            sd_name, val = name, v
        sd[sd_name] = val

    # translate OUR dotted names to the reference's naming for the main blocks
    import re

    ref_sd = {}
    for k, v in sd.items():
        r = k
        r = re.sub(r"backbone\.net\.blocks_(\d+)", r"backbone.net.blocks.\1", r)
        r = re.sub(r"backbone\.net\.patch_embed\.(weight|bias)", r"backbone.net.patch_embed.proj.\1", r)
        r = re.sub(r"encoder\.layers_(\d+)\.attn\.", r"encoder.layers.\1.attentions.0.", r)
        r = re.sub(r"encoder\.layers_(\d+)\.ffn\.fc1\.", r"encoder.layers.\1.ffns.0.layers.0.0.", r)
        r = re.sub(r"encoder\.layers_(\d+)\.ffn\.fc2\.", r"encoder.layers.\1.ffns.0.layers.1.", r)
        r = re.sub(r"encoder\.layers_(\d+)\.norm1\.", r"encoder.layers.\1.norms.0.", r)
        r = re.sub(r"encoder\.layers_(\d+)\.norm2\.", r"encoder.layers.\1.norms.1.", r)
        r = re.sub(r"decoder\.layers_(\d+)\.cross_attn\.", r"decoder.layers.\1.attentions.1.", r)
        r = re.sub(r"decoder\.layers_(\d+)\.norm1\.", r"decoder.layers.\1.norms.0.", r)
        r = re.sub(r"decoder\.layers_(\d+)\.norm2\.", r"decoder.layers.\1.norms.1.", r)
        r = re.sub(r"decoder\.layers_(\d+)\.norm3\.", r"decoder.layers.\1.norms.2.", r)
        r = re.sub(r"decoder\.layers_(\d+)\.ffn\.fc1\.", r"decoder.layers.\1.ffns.0.layers.0.0.", r)
        r = re.sub(r"decoder\.layers_(\d+)\.ffn\.fc2\.", r"decoder.layers.\1.ffns.0.layers.1.", r)
        r = re.sub(r"decoder\.bbox_embed_(\d+)\.layer(\d+)\.", r"decoder.bbox_embed.\1.layers.\2.", r)
        r = re.sub(r"class_embed_(\d+)\.", r"class_embed.\1.", r)
        r = re.sub(r"mask_embed\.layer(\d+)\.", r"mask_embed.layers.\1.", r)
        ref_sd[r] = v

    out = convert_torch_state_dict(ref_sd)
    hit = sum(1 for k in out if k in flat and flat[k].shape == out[k].shape)
    coverage = hit / len(flat)
    # decoder self-attn (packed in_proj), SFP sequential names and a few heads use
    # torch-only layouts this synthetic inverse can't reproduce; the real
    # converter handles them via dedicated rules. Expect most of the tree:
    assert coverage > 0.6, f"converter coverage too low: {coverage:.2%} ({hit}/{len(flat)})"
