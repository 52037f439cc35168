"""OpenAI-CLIP text surface: CLIPTEXT torch-activation parity + TextModel routing.

The oracle is the reference's own torch ``CLIPTEXT``
(/root/reference/ape/modeling/text/clip_wrapper.py — executed as a fixture,
never copied), loaded with a stubbed ``clip`` package (only its tokenizer
symbol is imported at module scope).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REF = "/root/reference/ape/modeling/text/clip_wrapper.py"


def _load_reference_clip_wrapper():
    torch = pytest.importorskip("torch")
    if "clip" not in sys.modules:
        clip = types.ModuleType("clip")
        st = types.ModuleType("clip.simple_tokenizer")

        class SimpleTokenizer:
            def __init__(self, *a, **k):
                self.encoder = {"<|startoftext|>": 49406, "<|endoftext|>": 49407}

            def encode(self, text):
                return [1]

        st.SimpleTokenizer = SimpleTokenizer
        clip.simple_tokenizer = st
        sys.modules["clip"] = clip
        sys.modules["clip.simple_tokenizer"] = st
    spec = importlib.util.spec_from_file_location("ref_clip_wrapper", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, torch


def test_cliptext_matches_torch(rng):
    mod, torch = _load_reference_clip_wrapper()
    torch.manual_seed(0)
    ref = mod.CLIPTEXT(
        embed_dim=16,
        context_length=12,
        vocab_size=50,
        transformer_width=32,
        transformer_heads=2,
        transformer_layers=2,
    ).eval()

    sd = {k: np.asarray(v.detach().float()) for k, v in ref.state_dict().items()}

    from ape_tpu.checkpoint.convert import convert_language_state_dict
    from ape_tpu.modeling.text.clip_openai import CLIPTEXT, _unflatten

    enc = CLIPTEXT(
        embed_dim=16,
        context_length=12,
        vocab_size=50,
        transformer_width=32,
        transformer_heads=2,
        transformer_layers=2,
    )
    enc.params = _unflatten(convert_language_state_dict(sd))

    # tokens: ids below EOT, EOT (highest id) at a varying position
    tokens = rng.randint(1, 40, size=(3, 12)).astype(np.int64)
    for i, pos in enumerate((4, 7, 11)):
        tokens[i, pos] = 49  # vocab_size-1 is the max id -> argmax pool
        tokens[i, pos + 1 :] = 0
    with torch.no_grad():
        want = ref.encode_text(torch.from_numpy(tokens)).numpy()
    got = np.asarray(enc.encode_text(tokens.astype(np.int32)))
    assert np.abs(got - want).max() < 2e-5


def test_text_model_routing_and_embeddings():
    from ape_tpu.modeling.text.clip_openai import TextModel, get_clip_embeddings

    tm = TextModel("CLIP", "RN50", "/nonexistent/clip.pt")  # random-init fallback
    emb = tm.forward_text(["cat", "dog", "zebra"])
    assert emb.shape == (3, 512)
    emb2 = get_clip_embeddings(tm.model, ["cat", "dog", "zebra"])
    assert np.allclose(np.asarray(emb), np.asarray(emb2))
    # determinism of the bank (ZeroShotFC online mode feeds this)
    assert np.allclose(np.asarray(emb), np.asarray(tm.forward_text(["cat", "dog", "zebra"])))


def test_openclip_surface():
    from ape_tpu.modeling.text.clip_openai import (
        build_openclip_text_encoder,
        get_openclip_embeddings,
    )

    model, tok = build_openclip_text_encoder("ViT-B-32", "/nonexistent/openclip.pt")
    emb = get_openclip_embeddings(model, tok, ["a", "b"])
    assert emb.shape == (2, 512)
