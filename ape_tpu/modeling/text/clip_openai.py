"""OpenAI-CLIP text encoder surface: CLIPTEXT / TextModel / get_*_embeddings.

Capability match (not a port) for /root/reference/ape/modeling/text/
clip_wrapper.py:74-215 (``CLIPTEXT``, ``build_clip_text_encoder``,
``get_clip_embeddings``), clip_wrapper_open.py:11-51 (``build_openclip_text_
encoder``, ``get_openclip_embeddings``) and text_encoder.py:12-38
(``TextModel``). These feed class-embedding banks to ``ZeroShotFC``'s
"online" mode (ape/layers/zero_shot_fc.py:54-59) — the bank is produced by
encoding ``prompt + class_name`` strings.

TPU-first design notes:
  * the tower is the same flax ``CLIPTextTransformer`` used for the vendored
    EVA-CLIP text tower (clip_text.py), with ``quick_gelu=True`` — OpenAI
    CLIP's only architectural delta (clip_wrapper.py:24-26). Encoding runs as
    one jitted call over a fixed (batch, 77) int32 array; callers are chunked
    to power-of-two batch buckets so vocabulary size doesn't retrace.
  * the reference random-crops over-long token lists (clip_wrapper.py:146-151,
    torch.randint); we head-crop and force the EOT terminal instead —
    deterministic under jit and the EOT-argmax pool stays valid.
  * checkpoints: ``build_clip_text_encoder`` accepts a torch state-dict file
    (.pt/.pth, full CLIP or text-only keys) and converts it with the
    production converter rules (checkpoint/convert.convert_language_state_dict
    — the OpenAI text tower uses the same key layout as EVA-CLIP's). The
    torchscript archives ``clip.load`` downloads are not parsed here (no
    downloads in this environment); export their ``state_dict()`` first.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ape_tpu.modeling.text.clip_text import CLIPTextTransformer
from ape_tpu.modeling.text.tokenizer import get_tokenizer

logger = logging.getLogger(__name__)


def _unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


class CLIPTEXT:
    """OpenAI CLIP text encoder: tokenize -> causal transformer -> EOT pool.

    Functional wrapper: holds frozen params + a jitted encode; mirrors the
    reference module's ``tokenize`` / ``encode_text`` / ``__call__`` surface
    (clip_wrapper.py:74-172).
    """

    def __init__(
        self,
        embed_dim: int = 512,
        context_length: int = 77,
        vocab_size: int = 49408,
        transformer_width: int = 512,
        transformer_heads: int = 8,
        transformer_layers: int = 12,
        bpe_path: Optional[str] = None,
        params=None,
        dtype=jnp.float32,
        seed: int = 0,
    ):
        self.context_length = context_length
        self.net = CLIPTextTransformer(
            vocab_size=vocab_size,
            context_length=context_length,
            width=transformer_width,
            heads=transformer_heads,
            layers=transformer_layers,
            output_dim=embed_dim,
            dtype=dtype,
            quick_gelu=True,
        )
        self._tokenizer = get_tokenizer(bpe_path)
        if params is None:
            tokens0 = jnp.zeros((1, context_length), jnp.int32)
            params = self.net.init(jax.random.PRNGKey(seed), tokens0)["params"]
        self.params = params
        self._encode = jax.jit(
            lambda p, t: self.net.apply({"params": p}, t)[0]
        )

    def tokenize(self, texts: Union[str, List[str]]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        return np.asarray(self._tokenizer(texts, self.context_length), np.int32)

    def encode_text(self, tokens) -> jnp.ndarray:
        """(B, ctx) int32 -> (B, embed_dim) EOT-pooled projected embedding."""
        return self._encode(self.params, jnp.asarray(tokens, jnp.int32))

    def __call__(self, captions: List[str]) -> jnp.ndarray:
        tokens = self.tokenize(captions)
        # bucket the batch so vocab size doesn't retrace the jit
        n = tokens.shape[0]
        bucket = 1 << max(0, (n - 1).bit_length())
        if bucket != n:
            tokens = np.concatenate(
                [tokens, np.zeros((bucket - n, tokens.shape[1]), np.int32)]
            )
        return self.encode_text(tokens)[:n]


def build_clip_text_encoder(model_path: str, pretrain: bool = True, **dims) -> CLIPTEXT:
    """Build CLIPTEXT, loading a torch state dict when available.

    Mirrors clip_wrapper.py:176-204: infers the tower dims from the state
    dict (text_projection / positional_embedding / token_embedding /
    ln_final shapes), drops visual.* keys, loads the rest.
    """
    if pretrain and model_path and os.path.exists(model_path):
        import torch

        from ape_tpu.checkpoint.convert import convert_language_state_dict

        logger.info("Loading pretrained CLIP text tower from %s", model_path)
        sd = torch.load(model_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if "state_dict" in sd and isinstance(sd["state_dict"], dict):
            sd = sd["state_dict"]
        sd = {
            k: v
            for k, v in sd.items()
            if not k.startswith("visual.")
            and k not in ("logit_scale", "input_resolution", "context_length", "vocab_size")
        }
        sd_np = {k: np.asarray(v.detach().cpu().float()) for k, v in sd.items()}
        enc = CLIPTEXT(
            embed_dim=sd_np["text_projection"].shape[1],
            context_length=sd_np["positional_embedding"].shape[0],
            vocab_size=sd_np["token_embedding.weight"].shape[0],
            transformer_width=sd_np["ln_final.weight"].shape[0],
            transformer_heads=sd_np["ln_final.weight"].shape[0] // 64,
            transformer_layers=len(
                {k.split(".")[2] for k in sd_np if k.startswith("transformer.resblocks")}
            ),
            bpe_path=dims.pop("bpe_path", None),
        )
        enc.params = _unflatten(convert_language_state_dict(sd_np))
        return enc
    if pretrain:
        logger.warning(
            "CLIP checkpoint %s not found — building a randomly-initialized "
            "CLIPTEXT (offline environment; embeddings are NOT CLIP's)",
            model_path,
        )
    return CLIPTEXT(**dims)


def get_clip_embeddings(text_model, vocabulary: List[str], prompt: str = "a ") -> jnp.ndarray:
    """Class-name list -> (N, embed_dim) bank for ZeroShotFC "online" mode."""
    if isinstance(text_model, str):
        text_model = build_clip_text_encoder(text_model, pretrain=True)
    texts = [prompt + x for x in vocabulary]
    return text_model(texts)


def build_openclip_text_encoder(open_clip_name: str, open_clip_model: str):
    """open_clip equivalent (clip_wrapper_open.py:11-29).

    open_clip's released text towers share the OpenAI layout; non-"quickgelu"
    model names use exact gelu, which ``CLIPTextTransformer`` also supports —
    but without a checkpoint file the tower is random-init. Returns
    (model, tokenizer) like the reference.
    """
    enc = build_clip_text_encoder(open_clip_model, pretrain=True)
    if "quickgelu" not in open_clip_name.lower():
        # rebuild the tower with exact gelu, keeping the loaded params
        net = enc.net
        enc.net = CLIPTextTransformer(
            vocab_size=net.vocab_size,
            context_length=net.context_length,
            width=net.width,
            heads=net.heads,
            layers=net.layers,
            output_dim=net.output_dim,
            dtype=net.dtype,
            quick_gelu=False,
        )
        enc._encode = jax.jit(lambda p, t: enc.net.apply({"params": p}, t)[0])
    return enc, enc.tokenize


def _encode_bucketed(model, tokens: np.ndarray) -> jnp.ndarray:
    """Pad the batch to a power of two before the jitted encode and slice back
    (the same bucketing as ``CLIPTEXT.__call__``) so each distinct vocabulary
    size does not retrace the jit."""
    n = tokens.shape[0]
    bucket = 1 << max(0, (n - 1).bit_length())
    if bucket != n:
        tokens = np.concatenate(
            [tokens, np.zeros((bucket - n, tokens.shape[1]), np.int32)]
        )
    return model.encode_text(tokens)[:n]


def get_openclip_embeddings(model, tokenizer, vocabulary, prompt="a ") -> jnp.ndarray:
    sentences = [prompt + x for x in vocabulary]
    tokens = np.asarray(tokenizer(sentences), np.int32)
    if len(tokens) > 10000:  # chunk giant vocabularies (clip_wrapper_open.py:38-46)
        half = len(tokens) // 2
        return jnp.concatenate(
            [_encode_bucketed(model, tokens[:half]), _encode_bucketed(model, tokens[half:])],
            axis=0,
        )
    return _encode_bucketed(model, tokens)


class TextModel:
    """CLIP / OPENCLIP routing wrapper (text_encoder.py:12-38)."""

    def __init__(self, model_type: str, model_name: str, model_path: str):
        self.model_type = model_type
        self.model_name = model_name
        self.model_path = model_path
        if model_type == "CLIP":
            self.model = build_clip_text_encoder(model_path, pretrain=True)
            self.tokenizer = self.model.tokenize
        elif model_type == "OPENCLIP":
            self.model, self.tokenizer = build_openclip_text_encoder(model_name, model_path)
        else:
            raise ValueError(f"unknown text model_type {model_type!r}")

    def forward_text(self, text: List[str], prompt: str = "a ") -> jnp.ndarray:
        if self.model_type == "CLIP":
            return get_clip_embeddings(self.model, text, prompt)
        return get_openclip_embeddings(self.model, self.tokenizer, text, prompt)
