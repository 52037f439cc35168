"""Every config in configs/ loads and exposes the standard entry-point keys.

The reference ships ~40 task-dir config families (configs/*); train_net.py
consumes model/criterion/optimizer/train/dataloader from each. A config that
does not load (or silently lacks a key train_net reads) is dead weight — this
suite keeps the whole fan-out importable.
"""

import glob
import os

import pytest

CFG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_CONFIGS = sorted(
    p
    for p in glob.glob(os.path.join(CFG_ROOT, "**", "*.py"), recursive=True)
    if "/common/" not in p
)


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: os.path.relpath(p, CFG_ROOT))
def test_config_loads(path):
    from ape_tpu.config import LazyConfig

    cfg = LazyConfig.load(path)
    for key in ("model", "criterion", "train", "dataloader"):
        assert key in cfg, f"{os.path.basename(path)} missing {key}"
    dl = cfg.dataloader
    assert "train" in dl and "tests" in dl
    # every test entry names a dataset and an evaluator type resolvable later
    for t in dl["tests"]:
        assert t["dataset_name"]
    # multi-dataset groups carry per-group criteria + ratio/prompt tables
    groups = dl["train"].get("groups")
    if groups:
        assert "criterions" in cfg and len(cfg.criterions) >= len(groups)
        assert len(cfg.train["dataset_ratio"]) == len(groups)
