"""Training-log and precision/recall plotting utilities.

Reference: ape/utils/plot_utils.py (DETR lineage) — `plot_logs` draws selected
metric curves from per-run log files and `plot_precision_recall` overlays PR
curves from saved COCO-eval dumps. This rebuild reads the rebuild's own
artifacts: `metrics.json` lines written by utils/events.JSONWriter, and PR
dumps saved as .npz (precision (T, R) per IoU-threshold x recall-point,
recall thresholds, scores) — see evaluation/coco_eval.py.

matplotlib is imported lazily so headless installs without it can still
import the package.
"""

from __future__ import annotations

import json
import os
from pathlib import Path, PurePath
from typing import Iterable, List, Sequence

import numpy as np


def _read_metrics(path: os.PathLike) -> List[dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def _series(records: List[dict], field: str):
    xs, ys = [], []
    for r in records:
        if field in r and isinstance(r[field], (int, float)):
            xs.append(r.get("iteration", len(xs)))
            ys.append(r[field])
    return np.asarray(xs), np.asarray(ys, np.float64)


def _ewm(y: np.ndarray, com: float) -> np.ndarray:
    """Exponential weighted mean with center-of-mass `com` (pandas semantics)."""
    if com <= 0 or len(y) == 0:
        return y
    alpha = 1.0 / (1.0 + com)
    out = np.empty_like(y)
    acc = 0.0
    norm = 0.0
    for i, v in enumerate(y):
        acc = (1 - alpha) * acc + v
        norm = (1 - alpha) * norm + 1.0
        out[i] = acc / norm
    return out


def plot_logs(
    logs,
    fields: Sequence[str] = ("total_loss", "loss_cls", "lr"),
    ewm_col: float = 0,
    log_name: str = "metrics.json",
):
    """Plot metric curves from one or more run directories.

    logs: a Path or list of Paths, each a train.output_dir containing
    `metrics.json`. Returns (fig, axs)."""
    import matplotlib.pyplot as plt

    if isinstance(logs, (str, PurePath)):
        logs = [logs]
    logs = [Path(p) for p in logs]
    for d in logs:
        if not d.exists():
            raise ValueError(f"plot_logs: invalid directory {d}")

    all_records = [_read_metrics(p / log_name) for p in logs]
    fig, axs = plt.subplots(ncols=len(fields), figsize=(5 * len(fields), 5))
    if len(fields) == 1:
        axs = [axs]
    colors = [f"C{i}" for i in range(len(logs))]
    for records, color, p in zip(all_records, colors, logs):
        for ax, field in zip(axs, fields):
            xs, ys = _series(records, field)
            if len(xs) == 0:
                continue
            ax.plot(xs, _ewm(ys, ewm_col), c=color, label=p.name)
    for ax, field in zip(axs, fields):
        ax.set_title(field)
        ax.legend()
    return fig, axs


def plot_precision_recall(files: Iterable[os.PathLike], naming_scheme: str = "iter"):
    """Overlay PR curves from .npz dumps {precision (T, R), recall (R,),
    scores (T, R)} (IoU thresholds T x recall points R). Prints mAP@50 /
    mean score / F1 per file like the reference."""
    import matplotlib.pyplot as plt

    files = [Path(f) for f in files]
    if naming_scheme == "exp_id":
        names = [f.parts[-3] for f in files]
    elif naming_scheme == "iter":
        names = [f.stem for f in files]
    else:
        raise ValueError(f"not supported {naming_scheme}")
    fig, axs = plt.subplots(ncols=2, figsize=(16, 5))
    for f, name in zip(files, names):
        data = np.load(f)
        precision = data["precision"]  # (T, R)
        recall = data["recall"]  # (R,)
        scores = data["scores"]  # (T, R)
        prec50 = precision[0]
        score50 = scores[0]
        prec = float(prec50.mean())
        rec = float(recall.mean()) if recall.ndim else float(recall)
        print(
            f"{naming_scheme} {name}: mAP@50={prec * 100: 05.1f}, "
            f"score={float(score50.mean()):0.3f}, "
            f"f1={2 * prec * rec / (prec + rec + 1e-8):0.3f}"
        )
        axs[0].plot(recall, prec50, label=name)
        axs[1].plot(recall, score50, label=name)
    axs[0].set_title("Precision / Recall")
    axs[1].set_title("Scores / Recall")
    for ax in axs:
        ax.legend()
    return fig, axs
