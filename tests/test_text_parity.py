"""Activation parity: our flax CLIP text tower vs the reference torch tower.

Loads /root/reference/ape/modeling/text/eva02_clip/transformer.py as an oracle
(reference code is only *executed* here as a test fixture, never copied),
builds a small random TextTransformer, converts its state dict with
``convert_language_state_dict`` and compares end-to-end activations.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

# heavy tier (round 5): torch-oracle RELEASE gate — runs in `-m heavy`
# alongside the e2e train loops. The slow tier keeps the pure-JAX
# kernel/model guards that protect day-to-day edits; these parity
# suites re-run whenever modeling code ships.
pytestmark = [pytest.mark.slow, pytest.mark.heavy]

REF = "/root/reference/ape/modeling/text/eva02_clip"


def _load_reference_transformer():
    torch = pytest.importorskip("torch")
    # stub timm (only trunc_normal_ is touched at import time)
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        layers = types.ModuleType("timm.models.layers")
        layers.trunc_normal_ = lambda *a, **k: None
        models = types.ModuleType("timm.models")
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    if "torchvision.ops.misc" not in sys.modules:
        # may coexist with ref_stubs_detrex's torchvision stub (which carries
        # nms/batched_nms but, before this guard keyed on the submodule,
        # lacked ops.misc) — augment whatever is installed
        tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
        ops = sys.modules.get("torchvision.ops") or types.ModuleType("torchvision.ops")
        misc = types.ModuleType("torchvision.ops.misc")

        class _FBN:  # only imported, not used by the text tower
            pass

        misc.FrozenBatchNorm2d = _FBN
        ops.misc = misc
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.misc"] = misc
    # fake package so the module's relative imports (.rope, .utils) resolve
    pkg = types.ModuleType("refclip")
    pkg.__path__ = [REF]
    sys.modules["refclip"] = pkg
    spec = importlib.util.spec_from_file_location(
        "refclip.transformer", f"{REF}/transformer.py",
        submodule_search_locations=[REF],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refclip.transformer"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_text_tower_parity():
    torch = pytest.importorskip("torch")
    mod = _load_reference_transformer()

    width, heads, layers, out_dim, ctx, vocab = 64, 4, 2, 32, 20, 101
    torch.manual_seed(0)
    ref = mod.TextTransformer(
        context_length=ctx, vocab_size=vocab, width=width, heads=heads,
        layers=layers, output_dim=out_dim, xattn=False,
    ).eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from ape_tpu.checkpoint.convert import convert_language_state_dict, unflatten_tree
    from ape_tpu.modeling.text.clip_text import CLIPTextTransformer

    import jax
    import jax.numpy as jnp

    ours = CLIPTextTransformer(
        vocab_size=vocab, context_length=ctx, width=width, heads=heads,
        layers=layers, output_dim=out_dim,
    )
    template = ours.init(jax.random.PRNGKey(0), jnp.zeros((2, ctx), jnp.int32))["params"]
    flat = convert_language_state_dict(sd)
    converted = unflatten_tree(flat)

    # every template leaf must be covered by the conversion, same shapes
    from ape_tpu.checkpoint.convert import flatten_tree

    tflat = flatten_tree(template)
    missing = sorted(set(tflat) - set(flat))
    assert not missing, f"unconverted params: {missing}"
    for k in tflat:
        assert tuple(np.asarray(flat[k]).shape) == tuple(tflat[k].shape), k

    rng = np.random.RandomState(1)
    tokens = np.zeros((3, ctx), np.int64)
    for i in range(3):
        n = rng.randint(3, ctx - 1)
        tokens[i, 0] = vocab - 2  # SOT
        tokens[i, 1:n] = rng.randint(1, vocab - 2, n - 1)
        tokens[i, n] = vocab - 1  # EOT (max id -> argmax pooling)

    with torch.no_grad():
        ref_eot = ref(torch.from_numpy(tokens)).numpy()

    eot, _seq = ours.apply({"params": converted}, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(eot), ref_eot, atol=2e-5, rtol=1e-4)
