"""Swap-in HuggingFace language towers (Bert / T5 / Llama2).

Capability match: ape/modeling/text/{bert_wrapper.py, t5_wrapper.py,
llama2_wrapper.py} — alternative frozen language models behind the
forward_text contract. Faithful per family:

* Bert (bert_wrapper.py:53-108): max_length=256 "max_length" padding,
  500-text chunking, ``end_token_idx = input_ids.argmin(-1) - 1``; returns
  {last_hidden_state, attention_mask, end_token_idx}.
* T5 (t5_wrapper.py:70-99): encoder-only forward with "longest" padding;
  returns the POOLED feature (the reference calls an undefined
  ``agg_lang_feat`` — the GLIP-style masked average it names — and returns
  the tensor, not a dict).
* Llama2 (llama2_wrapper.py:107-152): "longest" padding, 128-text chunking,
  ``hidden_states[-1]`` + nan_to_num; returns
  {last_hidden_state, attention_mask}.

All towers run frozen on the host CPU; per-text-list feature caching amortizes
encode cost exactly like the reference's in-memory cache. Gated on the
transformers package; weights load from a local path (no network egress in
this image). For the rest of this stack a pooled ``last_hidden_state_eot``
(masked average) is added to the dict-returning wrappers so they satisfy the
same contract as EVA02CLIP.forward_text.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger("ape_tpu")


def agg_lang_feat(hidden: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Masked average pool over the sequence axis (the GLIP helper the
    reference's t5_wrapper.py:94 names but never defines)."""
    mask = mask.astype(bool)
    return (hidden * mask[..., None]).sum(1) / np.maximum(
        mask.sum(1, keepdims=True), 1
    )


class _FrozenHF:
    """Shared loading/freezing/caching for the HF towers.

    model/tokenizer may be passed directly (tests build tiny local models);
    otherwise they load from ``model_name_or_path``.
    """

    def __init__(self, model_name_or_path: str = "", model=None, tokenizer=None):
        if model is None or tokenizer is None:
            from transformers import AutoModel, AutoTokenizer

            tokenizer = tokenizer or AutoTokenizer.from_pretrained(model_name_or_path)
            model = model or AutoModel.from_pretrained(model_name_or_path)
        self.tokenizer = tokenizer
        self.model = model
        self.model.eval()
        for p in self.model.parameters():
            p.requires_grad_(False)
        self._cache: Dict[tuple, Dict] = {}

    def _chunked_forward(self, forward, input_ids, attention_mask, chunk: int):
        import torch

        outs = []
        with torch.no_grad():
            for i in range(0, input_ids.shape[0], chunk):
                outs.append(
                    forward(
                        input_ids=input_ids[i : i + chunk],
                        attention_mask=attention_mask[i : i + chunk],
                    )
                )
        return outs


class Bert(_FrozenHF):
    """bert_wrapper.py Bert: BertModel without the pooling layer."""

    max_length = 256
    max_batch_size = 500

    def __init__(self, model_name_or_path: str = "", model=None, tokenizer=None):
        if model is None and model_name_or_path:
            from transformers import BertModel

            model = BertModel.from_pretrained(
                model_name_or_path, add_pooling_layer=False
            )
        super().__init__(model_name_or_path, model=model, tokenizer=tokenizer)

    def forward_text(self, text_list: List[str], cache: bool = False) -> Dict:
        key = tuple(text_list)
        if cache and key in self._cache:
            return self._cache[key]
        toks = self.tokenizer(
            list(text_list),
            max_length=self.max_length,
            padding="max_length",
            truncation=True,
            return_tensors="pt",
        )
        outs = self._chunked_forward(
            self.model, toks["input_ids"], toks["attention_mask"], self.max_batch_size
        )
        hidden = np.concatenate([o.last_hidden_state.numpy() for o in outs], 0)
        input_ids = toks["input_ids"].numpy()
        mask = toks["attention_mask"].numpy().astype(bool)
        # reference: position of the first pad token minus one (bert pad id 0)
        end_token_idx = input_ids.argmin(axis=-1) - 1
        ret = {
            "last_hidden_state": hidden,
            "attention_mask": mask,
            "end_token_idx": end_token_idx,
            "last_hidden_state_eot": agg_lang_feat(hidden, mask).astype(np.float32),
        }
        if cache:
            self._cache[key] = ret
        return ret


class T5(_FrozenHF):
    """t5_wrapper.py T5_warpper: encoder-only forward, pooled feature out."""

    def __init__(self, model_name_or_path: str = "", model=None, tokenizer=None):
        if model is None and model_name_or_path:
            from transformers import AutoModelForSeq2SeqLM

            model = AutoModelForSeq2SeqLM.from_pretrained(model_name_or_path)
        super().__init__(model_name_or_path, model=model, tokenizer=tokenizer)

    def forward_text(self, text_list: List[str], cache: bool = False):
        key = tuple(text_list)
        if cache and key in self._cache:
            return self._cache[key]
        toks = self.tokenizer(list(text_list), padding="longest", return_tensors="pt")
        encoder = getattr(self.model, "encoder", self.model)
        outs = self._chunked_forward(
            encoder, toks["input_ids"], toks["attention_mask"], 500
        )
        hidden = np.concatenate([o.last_hidden_state.numpy() for o in outs], 0)
        mask = toks["attention_mask"].numpy()
        feature = agg_lang_feat(hidden, mask).astype(np.float32)
        if cache:
            self._cache[key] = feature
        return feature


class Llama2(_FrozenHF):
    """llama2_wrapper.py Llama2: last hidden state with nan scrubbing."""

    max_batch_size = 128

    def forward_text(self, text_list: List[str], cache: bool = False) -> Dict:
        import torch

        key = tuple(text_list)
        if cache and key in self._cache:
            return self._cache[key]
        toks = self.tokenizer(list(text_list), padding="longest", return_tensors="pt")

        def fwd(input_ids, attention_mask):
            return self.model(
                input_ids=input_ids,
                attention_mask=attention_mask,
                output_hidden_states=True,
                return_dict=True,
            )

        outs = self._chunked_forward(
            fwd, toks["input_ids"], toks["attention_mask"], self.max_batch_size
        )
        hidden = np.concatenate([o.hidden_states[-1].numpy() for o in outs], 0)
        hidden = np.nan_to_num(hidden, nan=0.0, posinf=0.0, neginf=0.0)
        mask = toks["attention_mask"].numpy().astype(bool)
        ret = {
            "last_hidden_state": hidden,
            "attention_mask": mask,
            "last_hidden_state_eot": agg_lang_feat(hidden, mask).astype(np.float32),
        }
        if cache:
            self._cache[key] = ret
        return ret


def build_hf_text_model(kind: str, model_name_or_path: str, **kw):
    """Config-friendly factory: kind in {bert, t5, llama2}."""
    cls = {"bert": Bert, "t5": T5, "llama2": Llama2}[kind]
    return cls(model_name_or_path, **kw)
