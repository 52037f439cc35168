"""DefaultPredictor + argument parser.

Capability match: ape/engine/defaults.py:159-230 (DefaultPredictor: instantiate
model, load checkpoint, test-time resize, dict input with prompt routing) and
detectron2's default_argument_parser as used by tools/train_net.py:656.
"""

from __future__ import annotations

import argparse
import logging
from typing import Dict, Optional

import numpy as np

from ape_tpu.data.mapper import PIXEL_MEAN, PIXEL_STD
from ape_tpu.data.transforms import (
    TransformRecord,
    pad_to_square,
    resize_shortest_edge,
)

logger = logging.getLogger("ape_tpu")


class DefaultPredictor:
    """Single-image inference against an APE wrapper."""

    def __init__(self, ape_model, image_size: int = 1024):
        self.model = ape_model
        self.image_size = image_size

    def __call__(
        self,
        original_image: np.ndarray,  # RGB uint8 (H, W, 3)
        text_prompt: Optional[str] = None,
        mask_prompt: Optional[np.ndarray] = None,
    ) -> Dict:
        h0, w0 = original_image.shape[:2]
        resized, r = resize_shortest_edge(original_image, self.image_size, self.image_size)
        canvas, (vh, vw) = pad_to_square(resized, self.image_size)
        image = (canvas.astype(np.float32) - PIXEL_MEAN) / PIXEL_STD
        inp = {
            "image": image,
            "image_size": np.asarray([vh, vw], np.int32),
            "height": h0,
            "width": w0,
            "transform": TransformRecord(r, False, (0, 0), (self.image_size,) * 2, (vh, vw)),
        }
        if text_prompt:
            inp["text_prompt"] = text_prompt
            inp["prompt"] = "text"
        if mask_prompt is not None:
            inp["mask_prompt"] = mask_prompt
        return self.model([inp])[0]


def default_argument_parser():
    parser = argparse.ArgumentParser(description="APE-TPU training/eval")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--num-gpus", type=int, default=1, help="(ignored; TPU mesh)")
    parser.add_argument("--num-machines", type=int, default=1)
    parser.add_argument("--machine-rank", type=int, default=0)
    parser.add_argument("--dist-url", default="auto")
    parser.add_argument(
        "opts",
        help="dotted-path config overrides, e.g. train.max_iter=100",
        default=None,
        nargs=argparse.REMAINDER,
    )
    return parser
