"""APE: the top-level prompted-inference wrapper.

Capability match: SomeThing (ape/modeling/ape_deta/ape_deta.py:20-41) +
DeformableDETRSegmVL's prompt routing and eval plumbing
(deformable_detr_segm_vl.py:166-340, :524-549): holds vision model + language
model, routes "name"/"phrase"/"expression"/"text" prompts into text features
(with in-memory cache and a text feature bank), selects per-dataset vocabulary
via set_eval_dataset, and produces instance/semantic/panoptic outputs.

Functional split: this class owns params + jitted functions; the flax model is
pure. Demo-facing API mirrors DefaultPredictor (engine/defaults.py:159-230).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ape_tpu.data.catalog import MetadataCatalog, get_text_list
from ape_tpu.modeling.ape_deta.postprocess import (
    instance_inference,
    panoptic_scores,
    semantic_inference,
)

logger = logging.getLogger("ape_tpu")


class APE:
    def __init__(
        self,
        model,  # APEDeta flax module
        params,
        model_language,  # EVA02CLIP-like (forward_text)
        dataset_names: Sequence[str] = (),
        dataset_prompts: Optional[Sequence[str]] = None,
        max_text: int = 128,  # padded vocab size per forward
        test_score_thresh: float = 0.05,
        test_nms_thresh: float = 0.5,
        select_box_nums_for_evaluation: int = 300,
        select_box_nums_for_evaluation_list: Optional[Sequence[int]] = None,
        name_prompt_fusion_text: Optional[Sequence[bool]] = None,
        name_prompt_fusion_type: str = "zero",
        instance_on: bool = True,
        semantic_on: bool = True,
        panoptic_on: bool = False,
    ):
        self.model = model
        self.params = params
        self.model_language = model_language
        self.metadata_list = [MetadataCatalog.get(n) for n in dataset_names]
        self.dataset_prompts = list(dataset_prompts or ["name"] * len(self.metadata_list))
        self.max_text = max_text
        self.test_score_thresh = test_score_thresh
        self.test_nms_thresh = test_nms_thresh
        self.select_box_nums_default = select_box_nums_for_evaluation
        self.select_box_nums = select_box_nums_for_evaluation
        # per-dataset eval protocol (reference deformable_detr.py:195-196 /
        # segm_vl.py:342-360): benchmark-suite configs set a per-dataset box
        # budget and whether "name" prompts fuse against the real text or the
        # name_prompt_fusion_feature token
        self.select_box_nums_list = (
            list(select_box_nums_for_evaluation_list)
            if select_box_nums_for_evaluation_list is not None
            else None
        )
        self.name_prompt_fusion_text = (
            list(name_prompt_fusion_text) if name_prompt_fusion_text is not None else None
        )
        self.name_prompt_fusion_type = name_prompt_fusion_type
        self.instance_on = instance_on
        self.semantic_on = semantic_on
        self.panoptic_on = panoptic_on
        self.eval_dataset_id = 0 if self.metadata_list else -1
        self._apply_dataset_protocol()
        self._text_cache: Dict[tuple, np.ndarray] = {}

        # align_on_fused and fusion_text_mode are static per prompt type /
        # dataset: "name" prompts align against the ORIGINAL text features
        # (VL fusion only updates vision, segm_vl.py:445-448) and fuse against
        # text or the fusion token per name_prompt_fusion_text; phrase/
        # expression prompts align on the fused text
        self._forward = jax.jit(
            lambda p, img, sz, txt, tv, fused, fmode: self.model.apply(
                {"params": p}, img, sz, txt, tv,
                align_on_fused=fused, fusion_text_mode=fmode,
            ),
            static_argnums=(5, 6),
        )
        self._post_instance = jax.jit(
            lambda lo, bx, sz, cv, topk: instance_inference(
                lo, bx, sz, cv,
                score_thresh=self.test_score_thresh,
                nms_thresh=self.test_nms_thresh,
                topk=topk,
            ),
            static_argnums=(4,),
        )
        self._post_semantic = jax.jit(semantic_inference)

    # ------------------------------------------------------------------
    def profile_stage_times(self, inp: Dict, iters: int = 4) -> Dict[str, float]:
        """Model-internal stage wall-times (reference segm_vl.py:362-441
        preprocess/backbone/transformer/postprocess attribution).

        The forward is one fused XLA program in production, so stages are
        attributed by timing the backbone+neck subgraph separately (its own
        jit on the same params) and the postprocess jit; transformer+heads is
        the remainder of the full forward."""
        import time

        text_list = self.vocabulary(inp.get("text_prompt")) or ["object"]
        txt, tvalid = self._text_features(text_list)
        images = jnp.asarray(inp["image"][None])
        sizes = jnp.asarray(inp["image_size"][None])

        bb_apply = jax.jit(
            lambda p, x: self.model.neck.apply(
                {"params": p["neck"]},
                self.model.backbone.apply({"params": p["backbone"]}, x),
            )
            if self.model.neck is not None
            else self.model.backbone.apply({"params": p["backbone"]}, x)
        )

        def timed(fn, *args):
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
            return (time.perf_counter() - t0) / iters

        ptype = self._prompt_type(inp)
        fused = ptype != "name"
        fmode = self._fusion_mode(ptype)
        full_t = timed(
            self._forward, self.params, images, sizes, txt, tvalid, fused, fmode
        )
        bb_t = timed(bb_apply, self.params, images)
        out = self._forward(self.params, images, sizes, txt, tvalid, fused, fmode)
        post_t = timed(
            self._post_instance,
            out["pred_logits"][0], out["pred_boxes"][0], sizes[0], tvalid[0],
            self.select_box_nums,
        )
        return {
            "backbone_time": bb_t,
            "transformer_time": max(full_t - bb_t, 0.0),
            "postprocess_time": post_t,
            "total_forward_time": full_t,
        }

    # ------------------------------------------------------------------
    def set_eval_dataset(self, dataset_name: str):
        """Pick the dataset's vocabulary/prompt (deformable_detr.py:524-549).

        The reference maps an eval dataset to a registered dataset by
        substring ("+"-joined names match any part); exact match wins.
        """
        match = -1
        for i, m in enumerate(self.metadata_list):
            if m.name == dataset_name:
                match = i
                break
            if match < 0 and any(
                part and part in dataset_name for part in m.name.split("+")
            ):
                match = i
        self.eval_dataset_id = match
        if match < 0:
            logger.warning(f"unknown eval dataset {dataset_name}")
        self._apply_dataset_protocol()

    def _apply_dataset_protocol(self):
        """Per-dataset eval knobs (deformable_detr.py:195-196): box budget."""
        i = self.eval_dataset_id
        if self.select_box_nums_list is not None and 0 <= i < len(self.select_box_nums_list):
            self.select_box_nums = int(self.select_box_nums_list[i])
        else:
            self.select_box_nums = self.select_box_nums_default

    def _fusion_mode(self, prompt_type: str) -> str:
        """Which features the VL-fusion layers see (segm_vl.py:342-360)."""
        if prompt_type != "name":
            return "text"
        i = self.eval_dataset_id
        if (
            self.name_prompt_fusion_text is not None
            and 0 <= i < len(self.name_prompt_fusion_text)
            and self.name_prompt_fusion_text[i]
        ):
            return "text"
        if self.name_prompt_fusion_type in ("zero", "learnable"):
            return self.name_prompt_fusion_type
        return "none"

    def _encode_vocab(self, text_list: List[str]) -> np.ndarray:
        key = tuple(text_list)
        if key not in self._text_cache:
            out = self.model_language.forward_text(text_list, cache=True)
            # EVA02CLIP/Bert/Llama2 return a dict; the T5 wrapper returns the
            # pooled feature directly (t5_wrapper.py:94-99)
            if not isinstance(out, dict):
                feats = out
            else:
                feats = out["last_hidden_state_eot"]
            self._text_cache[key] = np.asarray(feats, np.float32)
        return self._text_cache[key]

    def _text_features(self, text_list: List[str]):
        feats = self._encode_vocab(text_list)  # (T, Cl)
        t = len(text_list)
        pad = self.max_text * -(-max(t, 1) // self.max_text)
        out = np.zeros((pad, feats.shape[-1]), np.float32)
        out[:t] = feats
        valid = np.zeros(pad, bool)
        valid[:t] = True
        return jnp.asarray(out[None]), jnp.asarray(valid[None])

    def _prompt_type(self, inp: Dict) -> str:
        """name / phrase / expression for this input (segm_vl.py:177-234:
        dataset prompt, or text_prompt with any multi-word entry -> phrase)."""
        tp = inp.get("text_prompt")
        if tp:
            words = [w.strip() for w in tp.split(",") if w.strip()]
            return "phrase" if any(" " in w for w in words) else "name"
        if 0 <= self.eval_dataset_id < len(self.dataset_prompts):
            return self.dataset_prompts[self.eval_dataset_id]
        return "name"

    def vocabulary(self, text_prompt: Optional[str] = None) -> List[str]:
        if text_prompt:
            return [w.strip() for w in text_prompt.split(",") if w.strip()]
        if 0 <= self.eval_dataset_id < len(self.metadata_list):
            return get_text_list(self.metadata_list[self.eval_dataset_id])
        return []

    # ------------------------------------------------------------------
    def __call__(self, batched_inputs: List[Dict], do_postprocess: bool = True):
        """Inference on a list of mapped inputs (each has image/image_size/...).

        Matches the reference's eval forward: dataset vocabulary or per-input
        text_prompt -> text features -> vision forward -> per-task inference.
        """
        results = []
        for inp in batched_inputs:
            text_list = self.vocabulary(inp.get("text_prompt"))
            if not text_list:
                text_list = ["object"]
            txt, tvalid = self._text_features(text_list)
            images = jnp.asarray(inp["image"][None])
            sizes = jnp.asarray(inp["image_size"][None])
            ptype = self._prompt_type(inp)
            out = self._forward(
                self.params, images, sizes, txt, tvalid,
                ptype != "name", self._fusion_mode(ptype),
            )

            res: Dict = {"image_id": inp.get("image_id", 0)}
            if self.instance_on:
                # instance path sees only thing classes when the vocabulary has
                # an explicit thing/stuff split (segm_vl.py:578-591)
                inst_valid = tvalid[0]
                if 0 <= self.eval_dataset_id < len(self.metadata_list) and not inp.get(
                    "text_prompt"
                ):
                    meta = self.metadata_list[self.eval_dataset_id]
                    n_thing = len(meta.get("thing_classes", []) or [])
                    if n_thing and n_thing < len(text_list):
                        inst_valid = inst_valid & (
                            jnp.arange(inst_valid.shape[0]) < n_thing
                        )
                inst = self._post_instance(
                    out["pred_logits"][0], out["pred_boxes"][0], sizes[0], inst_valid,
                    self.select_box_nums,
                )
                inst = {k: np.asarray(v) for k, v in inst.items()}
                keep = inst["valid"]
                scale = self._rescale_factor(inp)
                instances = {
                    "boxes": inst["boxes"][keep] * scale,
                    "scores": inst["scores"][keep],
                    "classes": inst["classes"][keep],
                }
                if "pred_masks" in out:
                    masks_small = np.asarray(out["pred_masks"][0])  # (K, Hm, Wm)
                    instances["mask_logits"] = masks_small[inst["query_idx"][keep]]
                res["instances"] = instances
            if self.semantic_on and "pred_masks" in out:
                sem = self._post_semantic(
                    out["pred_logits"][0], out["pred_masks"][0], tvalid[0]
                )
                res["sem_seg"] = np.asarray(sem)
            if self.panoptic_on and "pred_masks" in out:
                scores, labels, raw = panoptic_scores(out["pred_logits"][0], tvalid[0])
                res["panoptic_raw"] = {
                    "scores": np.asarray(scores),
                    "labels": np.asarray(labels),
                    "raw_scores": np.asarray(raw),
                    "mask_logits": np.asarray(out["pred_masks"][0]),
                }
            res["text_list"] = text_list
            results.append(res)
        return results

    @staticmethod
    def _rescale_factor(inp: Dict) -> float:
        """boxes are in model-input pixels; scale back to the original image."""
        rec = inp.get("transform")
        if rec is None:
            return 1.0
        return 1.0 / rec.scale
