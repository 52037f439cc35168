"""Copy-paste augmentation.

Capability match: ape/data/mapper_utils.py:232-380 + the copy-paste dataset
plumbing (build_multi_dataset_copypaste.py, common_copypaste.py): sort source
instances by area, paste into a background image avoiding existing foreground,
gaussian edge blending for large masks, re-derive boxes/annotations.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np
from PIL import Image, ImageFilter

logger = logging.getLogger("ape_tpu")


def copypaste(
    fg_example: Dict,
    bg_example: Dict,
    rng: np.random.RandomState,
    max_paste: int = 20,
    blend_sigma: float = 5.0,
    blend_min_area: int = 64 * 64,
) -> Dict:
    """Paste fg instances (with masks) onto the bg canvas.

    Both examples are mapper outputs (fixed-shape targets + canvas image).
    Returns a new example based on bg with pasted instances appended.
    """
    fg_t = fg_example.get("targets")
    bg_t = bg_example.get("targets")
    if fg_t is None or bg_t is None or "masks" not in fg_t:
        return bg_example

    img = bg_example["image"].copy()
    h, w = img.shape[:2]
    mask_size = fg_t["masks"].shape[-1]
    scale_up = h // mask_size

    # existing foreground occupancy of the background
    bg_occupied = bg_t["masks"][bg_t["valid"]].max(0) > 0.5 if bg_t["valid"].any() else np.zeros((mask_size, mask_size), bool)

    fg_idx = np.nonzero(fg_t["valid"])[0]
    areas = fg_t["masks"][fg_idx].sum((1, 2))
    order = fg_idx[np.argsort(-areas)][:max_paste]

    out_t = {k: v.copy() for k, v in bg_t.items()}
    n_slots = out_t["valid"].shape[0]
    next_slot = int(out_t["valid"].sum())

    for i in order:
        if next_slot >= n_slots:
            break
        m_small = fg_t["masks"][i] > 0.5
        if not m_small.any():
            continue
        # avoid pasting onto existing foreground (reference: &~foreground_mask)
        m_small = m_small & ~bg_occupied
        if m_small.sum() < 4:
            continue
        m_full = np.asarray(
            Image.fromarray(m_small.astype(np.uint8) * 255).resize((w, h), Image.NEAREST)
        ) > 127
        alpha = m_full.astype(np.float32)
        if m_full.sum() * (scale_up**2) >= blend_min_area and blend_sigma > 0:
            alpha = np.asarray(
                Image.fromarray((alpha * 255).astype(np.uint8)).filter(
                    ImageFilter.GaussianBlur(blend_sigma)
                ),
                np.float32,
            ) / 255.0
            alpha = np.where(m_full, np.maximum(alpha, 0.5), np.minimum(alpha, 0.5))
        img = img * (1 - alpha[..., None]) + fg_example["image"] * alpha[..., None]

        ys, xs = np.nonzero(m_small)
        cx = (xs.min() + xs.max() + 1) / 2 / mask_size
        cy = (ys.min() + ys.max() + 1) / 2 / mask_size
        bw = (xs.max() + 1 - xs.min()) / mask_size
        bh = (ys.max() + 1 - ys.min()) / mask_size
        out_t["boxes"][next_slot] = [cx, cy, bw, bh]
        out_t["labels"][next_slot] = fg_t["labels"][i]
        out_t["masks"][next_slot] = m_small.astype(np.float32)
        out_t["valid"][next_slot] = True
        if "is_thing" in out_t:
            out_t["is_thing"][next_slot] = True
        bg_occupied |= m_small
        next_slot += 1

    out = dict(bg_example)
    out["image"] = img.astype(bg_example["image"].dtype)
    out["targets"] = out_t
    out["copypaste"] = 1
    return out


class CopyPasteMapper:
    """Wrap a base mapper, pairing each foreground sample with a background
    sample from a separate pool (MapDataset_coppaste semantics)."""

    def __init__(self, base_mapper, bg_dataset: List[dict], prob: float = 0.5, seed: int = 0):
        self.base = base_mapper
        self.bg_dataset = bg_dataset
        self.prob = prob
        self._rng = np.random.RandomState(seed)

    def __call__(self, record: Dict) -> Optional[Dict]:
        fg = self.base(record)
        if fg is None or self._rng.rand() > self.prob or not self.bg_dataset:
            return fg
        bg_rec = self.bg_dataset[self._rng.randint(len(self.bg_dataset))]
        bg = self.base(bg_rec)
        if bg is None:
            return fg
        return copypaste(fg, bg, self._rng)
