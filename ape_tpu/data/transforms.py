"""Image/annotation transforms: large-scale jitter (LSJ), flip, resize.

Capability match: the reference's LSJ recipe — ``ResizeScale(0.1-2.0, 1024^2)``
+ ``FixedSizeCrop(1024^2, pad=False)`` + RandomFlip as declared in the data
configs (configs/common/data/*lsj1024*.py:48-61) and detectron2's transform
semantics (boxes/masks transformed consistently; crops clip annotations).

Host-side numpy/PIL; output images are fixed-size square with a recorded valid
(h, w) so the device sees static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image


@dataclasses.dataclass
class TransformRecord:
    """What happened to the image, to replay on boxes/masks/points."""

    scale: float
    flip: bool
    crop_xy: Tuple[int, int]  # offset of the crop in the resized image
    out_size: Tuple[int, int]  # (h, w) final canvas
    valid_size: Tuple[int, int]  # (h, w) of real content in the canvas


def resize_image(img: np.ndarray, h: int, w: int) -> np.ndarray:
    pil = Image.fromarray(img)
    return np.asarray(pil.resize((w, h), Image.BILINEAR))


def resize_nearest(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    pil = Image.fromarray(arr)
    return np.asarray(pil.resize((w, h), Image.NEAREST))


def lsj_transform(
    img: np.ndarray,
    rng: np.random.RandomState,
    out_size: int = 1024,
    min_scale: float = 0.1,
    max_scale: float = 2.0,
    flip_prob: float = 0.5,
) -> Tuple[np.ndarray, TransformRecord]:
    """ResizeScale + FixedSizeCrop + flip. Returns canvas image + record."""
    h0, w0 = img.shape[:2]
    scale = rng.uniform(min_scale, max_scale)
    # ResizeScale: target = scale * out_size, keep aspect via min ratio
    r = min(out_size * scale / h0, out_size * scale / w0)
    nh, nw = int(round(h0 * r)), int(round(w0 * r))
    img = resize_image(img, nh, nw)

    flip = rng.rand() < flip_prob
    if flip:
        img = img[:, ::-1]

    # FixedSizeCrop(out, pad=False): random crop when larger, else keep
    cy = rng.randint(0, max(nh - out_size, 0) + 1)
    cx = rng.randint(0, max(nw - out_size, 0) + 1)
    img = img[cy : cy + out_size, cx : cx + out_size]
    vh, vw = img.shape[:2]

    canvas = np.zeros((out_size, out_size, 3), img.dtype)
    canvas[:vh, :vw] = img
    return canvas, TransformRecord(r, flip, (cx, cy), (out_size, out_size), (vh, vw))


def apply_to_boxes(boxes: np.ndarray, rec: TransformRecord, orig_w: int) -> np.ndarray:
    """boxes xyxy in original pixels -> canvas pixels (clipped)."""
    b = boxes.astype(np.float64) * rec.scale
    if rec.flip:
        w = orig_w * rec.scale
        b = np.stack([w - b[:, 2], b[:, 1], w - b[:, 0], b[:, 3]], 1)
    b[:, 0::2] -= rec.crop_xy[0]
    b[:, 1::2] -= rec.crop_xy[1]
    b[:, 0::2] = b[:, 0::2].clip(0, rec.valid_size[1])
    b[:, 1::2] = b[:, 1::2].clip(0, rec.valid_size[0])
    return b.astype(np.float32)


def apply_to_mask(mask: np.ndarray, rec: TransformRecord) -> np.ndarray:
    """binary mask in original pixels -> canvas-sized mask."""
    h0, w0 = mask.shape
    nh, nw = int(round(h0 * rec.scale)), int(round(w0 * rec.scale))
    m = resize_nearest(mask.astype(np.uint8) * 255, nh, nw) > 127
    if rec.flip:
        m = m[:, ::-1]
    cx, cy = rec.crop_xy
    out_h, out_w = rec.out_size
    m = m[cy : cy + out_h, cx : cx + out_w]
    canvas = np.zeros(rec.out_size, bool)
    canvas[: m.shape[0], : m.shape[1]] = m
    return canvas


def resize_shortest_edge(
    img: np.ndarray, short: int = 1024, max_size: int = 1024
) -> Tuple[np.ndarray, float]:
    """Test-time ResizeShortestEdge (engine/defaults.py DefaultPredictor aug)."""
    h, w = img.shape[:2]
    r = short / min(h, w)
    if max(h, w) * r > max_size:
        r = max_size / max(h, w)
    nh, nw = int(round(h * r)), int(round(w * r))
    return resize_image(img, nh, nw), r


def pad_to_square(img: np.ndarray, size: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    h, w = img.shape[:2]
    canvas = np.zeros((size, size, 3), img.dtype)
    canvas[:h, :w] = img
    return canvas, (h, w)


def polygons_to_mask(polygons: List[np.ndarray], h: int, w: int) -> np.ndarray:
    """COCO polygon list -> binary mask via PIL rasterization (replaces
    pycocotools.frPyObjects + detectron2 polygons_to_bitmask)."""
    from PIL import ImageDraw

    img = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(img)
    for poly in polygons:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        if len(pts) >= 3:
            draw.polygon([tuple(p) for p in pts], outline=1, fill=1)
    return np.asarray(img, bool)


# ---------------------------------------------------------------------------
# COCO RLE codec (replaces pycocotools mask API for decode/encode/iou)
# ---------------------------------------------------------------------------

def rle_decode(rle: Dict, h: Optional[int] = None, w: Optional[int] = None) -> np.ndarray:
    """Decode COCO RLE (counts list or LEB128-style string) to (h, w) bool."""
    if h is None or w is None:
        h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = _rle_string_to_counts(
            counts.encode() if isinstance(counts, str) else counts
        )
    flat = np.zeros(h * w, bool)
    pos = 0
    val = False
    for c in counts:
        if val:
            flat[pos : pos + c] = True
        pos += c
        val = not val
    return flat.reshape(w, h).T  # column-major


def rle_encode(mask: np.ndarray) -> Dict:
    """Encode (h, w) bool mask to COCO compressed RLE."""
    h, w = mask.shape
    flat = np.asfortranarray(mask).reshape(-1, order="F").astype(np.uint8)
    # run lengths starting with zeros
    diffs = np.nonzero(np.diff(flat))[0] + 1
    starts = np.concatenate([[0], diffs])
    ends = np.concatenate([diffs, [len(flat)]])
    counts = (ends - starts).tolist()
    if flat[0] == 1:
        counts = [0] + counts
    return {"size": [h, w], "counts": _counts_to_rle_string(counts)}


def _counts_to_rle_string(counts) -> bytes:
    """pycocotools-compatible LEB128-ish encoding with delta for even runs."""
    out = bytearray()
    for i, x in enumerate(counts):
        x = int(x)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def _rle_string_to_counts(s: bytes):
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def rle_iou(a: Dict, b: Dict) -> float:
    ma, mb = rle_decode(a), rle_decode(b)
    inter = np.logical_and(ma, mb).sum()
    union = np.logical_or(ma, mb).sum()
    return float(inter) / max(float(union), 1.0)
