"""Data pipeline tests: transforms, mapper, samplers, copy-paste, COCO loading."""

import json
import os

import numpy as np
import pytest

from ape_tpu.data.catalog import DatasetCatalog, MetadataCatalog, get_text_list
from ape_tpu.data.copypaste import copypaste
from ape_tpu.data.datasets.coco import load_coco_json, register_coco_instances
from ape_tpu.data.mapper import DatasetMapperDETR
from ape_tpu.data.samplers import (
    InferenceSampler,
    MultiDatasetSampler,
    RepeatFactorTrainingSampler,
    repeat_factors_from_category_frequency,
)
from ape_tpu.data.transforms import (
    apply_to_boxes,
    apply_to_mask,
    lsj_transform,
    polygons_to_mask,
)


def make_coco_json(tmp_path, n_images=3):
    import PIL.Image

    img_dir = tmp_path / "images"
    img_dir.mkdir(exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        fn = f"{i:04d}.jpg"
        PIL.Image.fromarray(
            (np.random.RandomState(i).rand(80, 100, 3) * 255).astype(np.uint8)
        ).save(img_dir / fn)
        images.append({"id": i, "file_name": fn, "height": 80, "width": 100})
        annotations.append(
            {
                "id": aid,
                "image_id": i,
                "category_id": 1 + (i % 2),
                "bbox": [10, 10, 40, 30],
                "area": 1200,
                "iscrowd": 0,
                "segmentation": [[10, 10, 50, 10, 50, 40, 10, 40]],
            }
        )
        aid += 1
    js = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}],
    }
    jp = tmp_path / "ann.json"
    jp.write_text(json.dumps(js))
    return str(jp), str(img_dir)


def test_load_coco_json(tmp_path):
    jp, root = make_coco_json(tmp_path)
    dicts = load_coco_json(jp, root, "test_coco_tmp")
    assert len(dicts) == 3
    assert dicts[0]["annotations"][0]["bbox"] == [10, 10, 50, 40]  # xyxy
    meta = MetadataCatalog.get("test_coco_tmp")
    assert meta.thing_classes == ["cat", "dog"]
    assert get_text_list(meta) == ["cat", "dog"]


def test_mapper_train(tmp_path, rng):
    jp, root = make_coco_json(tmp_path)
    dicts = load_coco_json(jp, root)
    mapper = DatasetMapperDETR(is_train=True, image_size=64, max_gt=10, mask_size=16)
    ex = mapper(dicts[0])
    assert ex["image"].shape == (64, 64, 3)
    t = ex["targets"]
    assert t["boxes"].shape == (10, 4)
    if t["valid"].any():
        b = t["boxes"][t["valid"]]
        assert ((b >= 0) & (b <= 1)).all()
        assert t["masks"].shape == (10, 16, 16)


def test_mapper_eval(tmp_path):
    jp, root = make_coco_json(tmp_path)
    dicts = load_coco_json(jp, root)
    mapper = DatasetMapperDETR(is_train=False, image_size=64)
    ex = mapper(dicts[0])
    assert ex["image"].shape == (64, 64, 3)
    assert "targets" not in ex
    # 80x100 -> short side to 64 capped by max 64: r = 0.64 -> (51, 64)
    assert tuple(ex["image_size"]) == (51, 64)


def test_lsj_box_mask_consistency(rng):
    img = (rng.rand(60, 90, 3) * 255).astype(np.uint8)
    canvas, rec = lsj_transform(img, np.random.RandomState(3), out_size=64)
    mask = np.zeros((60, 90), bool)
    mask[20:40, 30:60] = True
    box = np.asarray([[30, 20, 60, 40]], np.float32)
    tb = apply_to_boxes(box, rec, orig_w=90)[0]
    tm = apply_to_mask(mask, rec)
    if tm.any():
        ys, xs = np.nonzero(tm)
        # transformed mask extent should be inside (or equal to) the box +-1px
        assert xs.min() >= tb[0] - 1.5 and xs.max() <= tb[2] + 1.5
        assert ys.min() >= tb[1] - 1.5 and ys.max() <= tb[3] + 1.5


def test_polygons_to_mask():
    m = polygons_to_mask([[0, 0, 10, 0, 10, 10, 0, 10]], 20, 20)
    assert m[5, 5] and not m[15, 15]


def test_repeat_factor_sampler():
    dicts = [
        {"annotations": [{"category_id": 0}]},  # frequent
        {"annotations": [{"category_id": 0}]},
        {"annotations": [{"category_id": 1}]},  # rare
    ]
    rf = repeat_factors_from_category_frequency(dicts, repeat_thresh=0.9)
    assert rf[2] > rf[0] >= 1.0
    s = RepeatFactorTrainingSampler(rf, seed=1)
    idx = [next(iter(s)) for _ in range(1)]
    assert all(0 <= i < 3 for i in idx)


def test_inference_sampler_cover():
    parts = [list(InferenceSampler(10, rank=r, world_size=3)) for r in range(3)]
    flat = sorted(sum(parts, []))
    assert flat == list(range(10))


def test_multi_dataset_sampler_ratio():
    mds = MultiDatasetSampler([9.0, 1.0], seed=0)
    picks = [mds.next_dataset() for _ in range(500)]
    frac = sum(p == 0 for p in picks) / 500
    assert 0.82 < frac < 0.97


def test_copypaste(rng):
    mask_size = 16
    def ex(n_valid, seed):
        r = np.random.RandomState(seed)
        masks = np.zeros((5, mask_size, mask_size), np.float32)
        for i in range(n_valid):
            masks[i, 4 * i : 4 * i + 4, 4 * i : 4 * i + 4] = 1
        return {
            "image": r.rand(64, 64, 3).astype(np.float32),
            "targets": {
                "labels": np.arange(5, dtype=np.int32),
                "boxes": r.rand(5, 4).astype(np.float32) * 0.3 + 0.2,
                "valid": np.arange(5) < n_valid,
                "masks": masks,
            },
        }

    fg, bg = ex(2, 1), ex(1, 2)
    out = copypaste(fg, bg, np.random.RandomState(0))
    assert out["targets"]["valid"].sum() >= bg["targets"]["valid"].sum()
    assert out["copypaste"] == 1


def test_train_loader_copypaste_wiring(tmp_path, rng):
    """copypaste_prob>0 on build_detection_train_loader wraps the mapper with
    CopyPasteMapper drawing backgrounds from the group's own pool (reference
    build_multi_dataset_copypaste.py:402-412; the cp config families)."""
    jp, img_dir = make_coco_json(tmp_path, n_images=4)
    name = "cp_wiring_test"
    if name not in DatasetCatalog:
        register_coco_instances(name, {}, jp, img_dir)

    from ape_tpu.data.build import build_detection_train_loader
    from ape_tpu.data.mapper import DatasetMapperDETR

    mapper = DatasetMapperDETR(is_train=True, image_size=64, max_gt=8, mask_size=16)
    loader = build_detection_train_loader(
        [name], mapper, batch_size=2, copypaste_prob=1.0, seed=0
    )
    from ape_tpu.data.copypaste import CopyPasteMapper

    assert isinstance(loader.mapper, CopyPasteMapper)
    batch = next(iter(loader))
    assert batch["images"].shape[0] == 2
    # prob=1.0: every record that survived mapping went through the paste op
    assert batch["targets"]["valid"].any()
