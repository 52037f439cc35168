"""Swap-in HuggingFace language towers (Bert / T5 / Llama2).

Capability match: ape/modeling/text/{bert_wrapper.py, t5_wrapper.py,
llama2_wrapper.py, text_encoder.py} — alternative frozen language models behind
the same forward_text contract. These run the HF torch models on the host CPU
(the towers are frozen; features are cached per text list, so encode cost is
amortized exactly like the reference's in-memory cache). Gated on transformers
availability and local weights (this image has no network egress).
"""

from __future__ import annotations

import logging
from typing import Dict, List

import numpy as np

logger = logging.getLogger("ape_tpu")


class HFTextModel:
    """Generic frozen HF encoder: forward_text -> token features + pooled EOT."""

    def __init__(self, model_name_or_path: str, max_length: int = 77, pooling: str = "average"):
        import torch
        from transformers import AutoModel, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        self.model = AutoModel.from_pretrained(model_name_or_path)
        self.model.eval()
        for p in self.model.parameters():
            p.requires_grad_(False)
        self.max_length = max_length
        self.pooling = pooling
        self._cache: Dict[tuple, Dict] = {}

    def forward_text(self, text_list: List[str], cache: bool = False) -> Dict:
        import torch

        key = tuple(text_list)
        if cache and key in self._cache:
            return self._cache[key]
        toks = self.tokenizer(
            list(text_list),
            padding="max_length",
            truncation=True,
            max_length=self.max_length,
            return_tensors="pt",
        )
        with torch.no_grad():
            out = self.model(**toks)
        hidden = out.last_hidden_state.numpy()
        mask = toks["attention_mask"].numpy().astype(bool)
        if self.pooling == "average":
            pooled = (hidden * mask[..., None]).sum(1) / np.maximum(
                mask.sum(1, keepdims=True), 1
            )
        else:  # last valid token
            idx = mask.sum(1) - 1
            pooled = hidden[np.arange(len(hidden)), idx]
        ret = {
            "last_hidden_state": hidden,
            "last_hidden_state_eot": pooled.astype(np.float32),
            "attention_mask": mask,
            "end_token_idx": mask.sum(1) - 1,
        }
        if cache:
            self._cache[key] = ret
        return ret


def Bert(model_name="bert-base-uncased", **kw):
    return HFTextModel(model_name, **kw)


def T5(model_name="google/flan-t5-large", **kw):
    return HFTextModel(model_name, **kw)


def Llama2(model_name="meta-llama/Llama-2-7b-hf", **kw):
    return HFTextModel(model_name, pooling="last", **kw)
