"""datasets/ prep + converter tools (reference: /root/reference/datasets/),
driven on synthetic inputs. Fast tier: pure numpy/PIL/json logic."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

ROOT = os.path.join(os.path.dirname(__file__), "..", "datasets")


def _load(relpath, name=None):
    name = name or os.path.splitext(os.path.basename(relpath))[0]
    spec = importlib.util.spec_from_file_location(name, os.path.join(ROOT, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_panoptic_to_semantic(tmp_path):
    prep = _load("prepare_coco_semantic_annos_from_panoptic_annos.py")
    # segment ids encoded as RGB; categories deliberately unsorted
    pan = np.zeros((4, 6, 3), np.uint8)
    pan[:2] = [7, 0, 0]   # id 7
    pan[2:] = [1, 1, 0]   # id 1 + 256 = 257
    pan_png = tmp_path / "img1.png"
    Image.fromarray(pan).save(pan_png)
    obj = {
        "categories": [{"id": 90, "isthing": 0}, {"id": 3, "isthing": 1}],
        "annotations": [
            {
                "file_name": "img1.png",
                "segments_info": [
                    {"id": 7, "category_id": 3},
                    {"id": 257, "category_id": 90},
                ],
            }
        ],
    }
    jp = tmp_path / "pan.json"
    jp.write_text(json.dumps(obj))
    out_dir = tmp_path / "sem"
    n = prep.convert_split(str(jp), str(tmp_path), str(out_dir), workers=1)
    assert n == 1
    sem = np.asarray(Image.open(out_dir / "img1.png"))
    # sorted ids [3, 90] -> train ids {3: 0, 90: 1}
    assert (sem[:2] == 0).all() and (sem[2:] == 1).all()


def test_voc_remap():
    prep = _load("prepare_voc_sem_seg.py")
    mask = np.asarray([[0, 1, 20], [255, 5, 0]], np.uint8)
    out = prep.remap_voc_mask(mask)
    assert out.tolist() == [[255, 0, 19], [255, 4, 255]]


def test_pascal_context_maps():
    prep = _load("prepare_pascal_context.py")
    name_to_459 = prep.parse_459_labels("1: aeroplane\n2: bag\n30: cat\n")
    assert name_to_459 == {"aeroplane": 1, "bag": 2, "cat": 30}
    tr = prep.parse_59_map("aeroplane\ncat\n\n", name_to_459)
    assert tr == {0: 1, 1: 30}
    lm = np.asarray([[1, 2], [30, 7]], np.uint16)
    p459 = prep.convert_pc459(lm)
    assert p459.tolist() == [[0, 1], [29, 6]]
    p59 = prep.convert_pc59(lm, tr)
    assert p59.tolist() == [[0, 255], [1, 255]]


def test_ade20k_full_class_mask(tmp_path):
    prep = _load("prepare_ade20k_full_sem_seg.py")
    seg = np.zeros((3, 3, 3), np.uint8)
    seg[..., 0] = 20  # R=20 -> class high bits 2*256
    seg[..., 1] = 5   # G=5
    p = tmp_path / "x_seg.png"
    Image.fromarray(seg).save(p)
    mask = prep.load_ade20k_class_mask(str(p))
    assert (mask == 2 * 256 + 5).all()
    # resize caps the short side only when it exceeds max_size
    img = np.zeros((1200, 600, 3), np.uint8)
    lab = np.zeros((1200, 600), np.int32)
    ri, rl = prep.resize_short_cap(img, lab, max_size=512)
    assert ri.shape[:2] == (1024, 512) and rl.shape == (1024, 512)
    ri2, _ = prep.resize_short_cap(np.zeros((300, 400, 3), np.uint8), lab[:300, :400], 512)
    assert ri2.shape[:2] == (300, 400)


def _coco_lvis_pair():
    lvis = {
        "images": [
            {
                "id": 10,
                "coco_url": "http://x/val2017/000000000001.jpg",
                "neg_category_ids": [501],
            }
        ],
        "categories": [
            {"id": 500, "synset": "person.n.01", "name": "person"},
            {"id": 501, "synset": "car.n.01", "name": "car"},
        ],
        "annotations": [
            {"id": 1, "image_id": 10, "category_id": 500, "bbox": [0, 0, 10, 10]},
        ],
    }
    coco = {
        "images": [{"id": 77, "file_name": "000000000001.jpg"}],
        "categories": [{"id": 1, "name": "person"}, {"id": 3, "name": "car"}],
        "annotations": [
            # duplicate of the lvis person box (IoU 1.0, same mapped cat)
            {"id": 5, "image_id": 77, "category_id": 1, "bbox": [0, 0, 10, 10]},
            # distinct person box -> kept
            {"id": 6, "image_id": 77, "category_id": 1, "bbox": [50, 50, 10, 10]},
            # car maps into neg_category_ids -> dropped
            {"id": 7, "image_id": 77, "category_id": 3, "bbox": [30, 30, 5, 5]},
        ],
    }
    return coco, lvis


def test_merge_lvis_coco():
    merge_mod = _load("tools/lvis/merge_lvis_coco.py")
    coco, lvis = _coco_lvis_pair()
    out, stats = merge_mod.merge(coco, lvis, thresh=0.7)
    assert stats["coco_neg_category"] == 1
    assert stats["coco_duplicate"] == 1
    assert stats["coco_added"] == 1
    assert len(out["annotations"]) == 2  # lvis ann + one new coco ann
    assert [a["id"] for a in out["annotations"]] == [1, 2]
    added = out["annotations"][1]
    assert added["category_id"] == 500 and added["image_id"] == 10
    person = next(c for c in out["categories"] if c["id"] == 500)
    assert person["instance_count"] == 2 and person["image_count"] == 1


def test_pairwise_iou_xywh():
    merge_mod = _load("tools/lvis/merge_lvis_coco.py")
    iou = merge_mod.pairwise_iou_xywh(
        np.asarray([[0, 0, 10, 10]], float), np.asarray([[5, 0, 10, 10]], float)
    )
    np.testing.assert_allclose(iou, [[50.0 / 150.0]])


def test_add_category_info_and_lvis_format():
    freq_mod = _load("tools/lvis/add_category_info_frequence.py")
    data = {
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
        "images": [{"id": 1}, {"id": 2}],
        "annotations": [
            {"image_id": 1, "category_id": 1},
            {"image_id": 2, "category_id": 1},
            {"image_id": 1, "category_id": 1},
        ],
    }
    cats = freq_mod.add_category_info(data, add_freq=True, r_thresh=1, c_thresh=3)
    a, b = cats
    assert a["image_count"] == 2 and a["instance_count"] == 3 and a["frequency"] == "c"
    assert b["image_count"] == 0 and b["frequency"] == "r"

    fmt_mod = _load("tools/lvis/add_lvis_format.py")
    out = fmt_mod.add_lvis_format(data)
    assert out["images"][0]["neg_category_ids"] == []
    assert out["categories"][0]["frequency"] == "f"


def test_sa1b_index(tmp_path):
    mod = _load("tools/sa1b2coco/convert.py", "sa1b_convert")
    d = tmp_path / "shard0"
    d.mkdir()
    Image.fromarray(np.zeros((4, 6, 3), np.uint8)).save(d / "sa_1.jpg")
    (d / "sa_1.json").write_text(
        json.dumps({"image": {"image_id": 1, "height": 4, "width": 6, "file_name": "sa_1.jpg"}})
    )
    Image.fromarray(np.zeros((4, 6, 3), np.uint8)).save(d / "sa_2.jpg")  # no sidecar
    imgs = mod.index_sa1b(str(tmp_path))
    assert len(imgs) == 1 and imgs[0]["height"] == 4
    coco = mod.to_coco(imgs)
    assert coco["categories"][0]["name"] == "object" and coco["annotations"] == []


def test_seqtr_convert_and_group():
    ref_mod = _load("tools/seqtr2coco/convert_ref2coco.py", "convert_ref2coco")
    rec = {
        "image_id": 42, "height": 20, "width": 30,
        "bbox": [1, 2, 3, 4],
        "mask": [[0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0]],
        "expressions": ["left dog", "the dog"],
    }
    out = ref_mod.convert({"train": [rec], "val": [dict(rec, image_id=43)]})
    assert out["train"]["images"][0]["file_name"] == "COCO_train2014_000000000042.jpg"
    assert out["train"]["annotations"][0]["area"] == pytest.approx(100.0)
    assert out["val"]["images"][0]["id"] == 2  # ids increase across splits

    grp_mod = _load(
        "tools/seqtr2coco/convert_refcoco_mixed_group_by_image.py", "grp_mod"
    )
    cocofied = grp_mod.cocofy_train_with_phrases({"train": [rec, dict(rec)]})
    merged = grp_mod.group_by_image([cocofied])
    assert len(merged["images"]) == 1  # same underlying COCO image
    assert len(merged["annotations"]) == 4  # 2 anns x 2 phrases
    assert {a["phrase"] for a in merged["annotations"]} == {"left dog", "the dog"}


def test_odinw_renumber():
    mod = _load("tools/odinw/convert.py", "odinw_convert")
    data = {
        "images": [{"id": 900}, {"id": 7}],
        "annotations": [{"id": 3, "image_id": 7}, {"id": 9, "image_id": 900}],
    }
    out = mod.renumber(data)
    assert [im["id"] for im in out["images"]] == [1, 2]
    assert out["annotations"][0] == {"id": 1, "image_id": 2}
    assert out["annotations"][1] == {"id": 2, "image_id": 1}


def test_o365_convert_and_fixnames():
    mod = _load("tools/objects3652coco/convert_annotations.py", "o365_convert")
    data = {
        "licenses": [],
        "categories": [{"id": 1, "name": "Person"}],
        "images": [
            {"id": 1, "file_name": "a.jpg", "width": 10, "height": 20},
            {"id": 2, "file_name": "b.jpg", "width": 10, "height": 20},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1},
            {"id": 2, "image_id": 2, "category_id": 1},
        ],
    }
    info = {1: ("a.jpg", 99, 88)}  # image 2 missing -> dropped; exif fixes sizes
    out = mod.convert(data, "val", info)
    assert len(out["images"]) == 1 and out["images"][0]["height"] == 99
    assert len(out["annotations"]) == 1

    fix_mod = _load("tools/objects3652coco/fix_o365_names.py", "o365_fix")
    cats, renamed = fix_mod.fix_names(
        [{"id": 5, "name": "Wallet/Purse"}], {5: ["Wallet/Purse", "Wallet"]}
    )
    assert renamed == 1 and cats[0]["name"] == "Wallet"


def test_phrasecut_flatten():
    mod = _load("tools/phrasecut2coco/convert.py", "phrasecut_convert")
    rings = mod.flatten_instance_polygons([[[0, 0], [1, 0], [1, 1]], [[5, 5], [6, 5], [6, 6]]])
    assert rings == [[0, 0, 1, 0, 1, 1], [5, 5, 6, 5, 6, 6]]


def test_generate_img_ann_pair(tmp_path):
    mod = _load("tools/generate_img_ann_pair.py", "gen_pair")
    (tmp_path / "sa_9.jpg").write_bytes(b"fake")
    (tmp_path / "sa_9.json").write_text(json.dumps({"key": "000000009", "extra": 1}))
    data = {
        "images": [{"id": 9, "file_name": "sa_9.jpg"}],
        "annotations": [{"id": 1, "image_id": 9}],
    }
    n = mod.shard(data, str(tmp_path))
    assert n == 1
    merged = json.loads((tmp_path / "sa_9.json").read_text())
    assert merged["extra"] == 1 and merged["image"]["id"] == 9
    assert len(merged["annotations"]) == 1


def test_flickr_sentence_and_clustering():
    mod = _load("tools/flickr2coco/convert.py", "flickr_convert")
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("[/EN#7/people A man] rides [/EN#9/vehicles a red bike] .\n")
        path = f.name
    parsed = mod.get_sentence_data(path)
    assert parsed[0]["sentence"] == "A man rides a red bike ."
    p0, p1 = parsed[0]["phrases"]
    assert p0["phrase"] == "A man" and p0["phrase_id"] == "7" and p0["first_word_index"] == 0
    assert p1["phrase"] == "a red bike" and p1["first_word_index"] == 3

    spans = mod.phrase_spans(parsed[0]["sentence"], parsed[0]["phrases"])
    assert parsed[0]["sentence"][slice(*spans[0])] == "A man"
    assert parsed[0]["sentence"][slice(*spans[1])] == "a red bike"

    compo = mod.get_equivalent_boxes(
        [[0, 0, 10, 10], [0.1, 0, 10, 10], [50, 50, 5, 5]], 0.9
    )
    sizes = sorted(len(v) for v in compo.values())
    assert sizes == [1, 2]

    merged = mod.merge_entity_boxes({7: [[0, 0, 10, 10], [20, 0, 10, 10]]})
    assert merged[7] == [[0.0, 0.0, 30.0, 10.0]]

    target = {7: [[0, 0, 10, 10]], 9: [[30, 30, 4, 4]]}
    annos, next_id = mod.sentence_annotations(parsed, target, image_id=1, next_id=1)
    assert len(annos) == 2 and next_id == 3
    assert {a["phrase"] for a in annos} == {"A man", "a red bike"}


def test_vg_object_convert():
    mod = _load(
        "tools/visualgenome2coco/convert_annotations_object.py", "vg_object"
    )
    assert mod.sentence_preprocess(" Dog's! ") == "dogs"
    import tempfile, os as _os

    with tempfile.TemporaryDirectory() as d:
        a1 = _os.path.join(d, "a1.txt")
        a2 = _os.path.join(d, "a2.txt")
        open(a1, "w").write("dog,puppy\ncat,kitten\n")
        open(a2, "w").write("puppy,doggy\nbird\n")
        alias = mod.make_alias_dict_new(a1, a2)
    # transitive merge: dog/puppy/doggy in one group
    assert alias["dog"] == alias["puppy"] == alias["doggy"]
    assert "bird" not in alias  # singleton groups don't alias

    object_data = [
        {"image_id": 1, "objects": [
            {"object_id": 10, "names": ["dog"], "synsets": [], "x": 0, "y": 0, "w": 50, "h": 50},
            {"object_id": 11, "names": ["unknownthing"], "synsets": [], "x": 0, "y": 0, "w": 50, "h": 50},
            {"object_id": 12, "names": ["dog"], "synsets": [], "x": 1, "y": 1, "w": 1, "h": 1},  # too small
        ]},
        {"image_id": 2, "objects": [
            {"object_id": 20, "names": ["unknownthing"], "synsets": [], "x": 0, "y": 0, "w": 30, "h": 30},
        ]},
    ]
    image_data = [
        {"image_id": 1, "height": 100, "width": 100, "url": "https://x/VG_100K/1.jpg"},
        {"image_id": 2, "height": 100, "width": 100, "url": "https://x/VG_100K/2.jpg"},
    ]
    train, val, full, cats = mod.convert(
        object_data, image_data, num_objects=10, object_list=["dog"],
        min_box_area_frac=0.002,
    )
    # image 2 has no kept objects -> dropped; tiny box filtered
    assert [im["id"] for im in full["images"]] == [1]
    assert full["images"][0]["file_name"] == "VG_100K/1.jpg"
    assert len(full["annotations"]) == 1
    assert cats == [{"id": 1, "name": "dog"}]
    assert full["annotations"][0]["phrase"] == "dog"


def test_vg_region_fanout():
    obj_mod = _load(
        "tools/visualgenome2coco/convert_annotations_object.py", "convert_annotations_object"
    )
    reg_mod = _load(
        "tools/visualgenome2coco/convert_annotations_region.py", "vg_region"
    )
    ds = {
        "info": {}, "licenses": [], "categories": [{"id": 1, "name": "dog"}],
        "images": [{"id": 1, "file_name": "a.jpg", "height": 10, "width": 10}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1}],
    }
    import copy

    train = copy.deepcopy(ds)
    val = {**copy.deepcopy(ds), "images": [], "annotations": []}
    full = copy.deepcopy(ds)
    region_data = [
        {"id": 1, "regions": [
            {"region_id": 9, "image_id": 1, "x": 0, "y": 0, "width": 5, "height": 4,
             "phrase": "a dog on grass"},
        ]},
    ]
    image_data = [{"image_id": 1}]
    r_train, r_val, r_all = reg_mod.add_regions(train, val, full, region_data, image_data, 1)
    assert len(full["annotations"]) == 2
    reg_ann = full["annotations"][-1]
    assert reg_ann["isobject"] == 0 and reg_ann["phrase"] == "a dog on grass"
    assert reg_ann["category_id"] == 1 + 0  # len(vocab) + region index
    assert len(r_train["annotations"]) == 1 and not r_val["annotations"]


def test_gqa_spans_and_phrases():
    mod = _load("tools/gqa2coco/convert.py", "gqa_convert")
    q = "What is the man holding?"
    # token 3 = "man"
    beg, end = mod.token_ref_to_span("3", q)
    assert q[beg:end] == "man"
    beg, end = mod.token_ref_to_span("1:3", q)
    assert q[beg:end] == "is the"
    # overlapping spans merge; punctuation snaps off
    spans = mod.consolidate_spans([(0, 5), (3, 8)], "hello, world")
    assert spans == [(0, 8)]
    assert mod.clean_phrase("What", "dog", "The dog is here", 0) == "dog"
    assert mod.clean_phrase("he", "x", "a man walking", 0) == "a man walking"
    assert mod.clean_phrase("she", "x", "nothing here", 0) == "woman"
    assert mod.clean_phrase("ab", "x", "full answer", 0) == "full answer"
    assert mod.clean_phrase("tv", "x", "full answer", 0) == "tv"
    assert mod.clean_phrase("yes, a hat", "x", "y", 0) == "a hat"


def test_openimages_bbox_convert():
    mod = _load("tools/openimages2coco/convert_annotations.py", "oi_convert")
    cats = mod.convert_categories([["/m/01", "Person"], ["/m/02", "Car"]])
    assert cats[0] == {"id": 1, "name": "Person", "freebase_id": "/m/01"}
    meta = [["ImageID"], ["imgA"], ["imgB"]]
    labels = [
        ["ImageID", "LabelName", "Confidence"],
        ["imgA", "/m/01", "1"],
        ["imgA", "/m/02", "0"],
    ]
    sizes = [["image_id", "image_w", "image_h"], ["imgA", "100", "50"], ["imgB", "20", "10"]]
    images = mod.convert_images(meta, labels, sizes, "/nonexistent", cats)
    assert images[0]["pos_category_ids"] == [1]
    assert images[0]["neg_category_ids"] == [2]
    assert images[0]["width"] == 100 and images[0]["height"] == 50
    anns_rows = [
        ["ImageID", "LabelName", "XMin", "XMax", "YMin", "YMax", "IsGroupOf"],
        ["imgA", "/m/01", "0.1", "0.5", "0.2", "0.6", "0"],
        ["imgB", "/m/02", "0.0", "1.0", "0.0", "1.0", "1"],
    ]
    anns = mod.convert_instances(anns_rows, images, cats)
    assert anns[0]["bbox"] == [10.0, 10.0, 40.0, 20.0]
    assert anns[0]["area"] == 800.0
    imgs2, anns2 = mod.exclude_group(images, anns)
    assert [im["id"] for im in imgs2] == ["imgA"] and len(anns2) == 1
