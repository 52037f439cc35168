import numpy as np

from ape_tpu.evaluation.panoptic_merge import panoptic_merge


def test_panoptic_merge_basic():
    h = w = 16
    masks = np.zeros((3, h, w), np.float32)
    masks[0, :8] = 0.9  # thing, top half
    masks[1, 8:] = 0.9  # stuff, bottom half
    masks[2, :4] = 0.4  # low-quality, should be dropped by prob/overlap
    seg, info = panoptic_merge(
        scores=np.asarray([0.8, 0.7, 0.3]),
        labels=np.asarray([0, 5, 0]),
        raw_scores=np.asarray([0.9, 0.8, 0.26]),
        masks_prob=masks,
        thing_ids={0},
    )
    assert len(info) == 2
    ids = {s["category_id"]: s for s in info}
    assert ids[0]["isthing"] and not ids[5]["isthing"]
    assert (seg[:8] == info[0]["id"]).all()
    assert (seg[8:] == info[1]["id"]).all()


def test_panoptic_merge_stuff_dedup():
    h = w = 8
    masks = np.zeros((2, h, w), np.float32)
    masks[0, :, :4] = 0.9
    masks[1, :, 4:] = 0.9
    seg, info = panoptic_merge(
        scores=np.asarray([0.8, 0.7]),
        labels=np.asarray([3, 3]),  # same stuff class twice
        raw_scores=np.asarray([0.9, 0.9]),
        masks_prob=masks,
        thing_ids=set(),
    )
    assert len(info) == 1  # merged into one stuff segment
    assert (seg > 0).all()
