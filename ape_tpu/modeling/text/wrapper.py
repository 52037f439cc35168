"""Text-encoder wrapper with tokenization, chunked encoding and caching.

Capability match: EVA02CLIP.forward_text (/root/reference/ape/modeling/text/
clip_wrapper_eva02.py:88-132): tokenize (ctx 77) -> chunked encode -> dict with
last_hidden_state / last_hidden_state_eot / attention_mask / end_token_idx,
cached in memory keyed on the text tuple. The tower is frozen.

TPU-first: the encode function is jitted once per chunk shape; chunks are padded
to a fixed max so the executable count stays bounded.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ape_tpu.modeling.text.clip_text import CLIPTextTransformer
from ape_tpu.modeling.text.tokenizer import get_tokenizer


class EVA02CLIP:
    """Frozen CLIP text tower; functional params + host-side cache."""

    def __init__(
        self,
        params=None,
        rng_seed: int = 0,
        vocab_size: int = 49408,
        context_length: int = 77,
        width: int = 1024,
        heads: int = 16,
        layers: int = 24,
        output_dim: int = 1024,
        bpe_path: Optional[str] = None,
        max_batch_size: int = 256,
        dtype=jnp.float32,
    ):
        self.model = CLIPTextTransformer(
            vocab_size=vocab_size,
            context_length=context_length,
            width=width,
            heads=heads,
            layers=layers,
            output_dim=output_dim,
            dtype=dtype,
        )
        self.context_length = context_length
        self.output_dim = output_dim
        self.tokenizer = get_tokenizer(bpe_path)
        self.max_batch_size = max_batch_size
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, context_length), jnp.int32),
            )["params"]
        self.params = params
        self._cache: Dict[tuple, Dict] = {}
        self._encode = jax.jit(
            lambda p, t: self.model.apply({"params": p}, t)
        )

    def forward_text(self, text_list: List[str], cache: bool = False) -> Dict:
        key = tuple(text_list)
        if cache and key in self._cache:
            return self._cache[key]
        tokens = np.asarray(self.tokenizer(list(text_list), self.context_length))
        n = tokens.shape[0]
        bs = self.max_batch_size
        # pad to a multiple of the chunk size -> one executable shape
        n_pad = -(-max(n, 1) // bs) * bs
        tokens_p = np.zeros((n_pad, self.context_length), np.int32)
        tokens_p[:n] = tokens
        tokens_p[n:, 0] = tokens_p[:1, 0] if n else 0
        eots, seqs = [], []
        for i in range(0, n_pad, bs):
            eot, seq = self._encode(self.params, jnp.asarray(tokens_p[i : i + bs]))
            eots.append(eot)
            seqs.append(seq)
        eot = jnp.concatenate(eots, 0)[:n]
        seq = jnp.concatenate(seqs, 0)[:n]
        end_token_idx = jnp.asarray(tokens.argmax(-1)) if n else jnp.zeros((0,), jnp.int32)
        attn = (
            jnp.arange(self.context_length)[None, :] <= end_token_idx[:, None]
            if n
            else jnp.zeros((0, self.context_length), bool)
        )
        ret = {
            "end_token_idx": end_token_idx,
            "attention_mask": attn,
            "last_hidden_state": seq,
            "last_hidden_state_eot": eot,
        }
        if cache:
            self._cache[key] = ret
        return ret

    # alias matching the reference's encode_text (EOT only)
    def encode_text(self, text_list: List[str], cache: bool = False) -> Dict:
        out = self.forward_text(text_list, cache=cache)
        return {"last_hidden_state_eot": out["last_hidden_state_eot"]}


def reduce_language_feature(
    features: jnp.ndarray, mask: jnp.ndarray, reduce_type: str = "average"
) -> jnp.ndarray:
    """Pool per-token features to one vector (reference: ape/modeling/text/utils.py:11-32)."""
    if reduce_type == "average":
        m = mask.astype(features.dtype)[..., None]
        return jnp.sum(features * m, -2) / jnp.clip(jnp.sum(m, -2), 1.0)
    if reduce_type == "max":
        neg = jnp.where(mask[..., None], features, -jnp.inf)
        return jnp.max(neg, -2)
    if reduce_type == "last":
        idx = jnp.sum(mask.astype(jnp.int32), -1) - 1
        return jnp.take_along_axis(features, idx[..., None, None], -2)[..., 0, :]
    raise ValueError(reduce_type)
