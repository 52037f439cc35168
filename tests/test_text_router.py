"""Phrase/expression prompt routing + text feature bank (VERDICT item 5)."""

import numpy as np

from ape_tpu.engine.text_router import TextRouter


def _batch(phrases, n_valid, max_gt=4, b=None):
    b = b or len(phrases)
    valid = np.zeros((b, max_gt), bool)
    labels = np.full((b, max_gt), -1, np.int32)
    for i, n in enumerate(n_valid):
        valid[i, :n] = True
        labels[i, :n] = 0
    return {
        "images": np.zeros((b, 8, 8, 3), np.float32),
        "targets": {"labels": labels, "valid": valid,
                    "boxes": np.zeros((b, max_gt, 4), np.float32)},
        "phrases": phrases,
        "dataset_id": 0,
    }


def test_phrase_relabeling_cumulative():
    r = TextRouter(num_text=16, text_dim=8, dataset_prompts=["phrase"])
    batch = r(_batch([["a cat", "a dog"], ["a bird"]], [2, 1]))
    labels = batch["targets"]["labels"]
    assert labels[0, 0] == 0 and labels[0, 1] == 1
    assert labels[1, 0] == 2  # cumulative across the batch
    assert batch["text_features"].shape == (2, 16, 8)
    assert batch["text_valid"].all()  # bank padding counts as real negatives


def test_same_phrase_same_embedding():
    r = TextRouter(num_text=8, text_dim=16, dataset_prompts=["phrase"])
    b1 = r(_batch([["a cat"]], [1]))
    f1 = b1["text_features"][0, 0].copy()
    r2 = TextRouter(num_text=8, text_dim=16, dataset_prompts=["phrase"])
    b2 = r2(_batch([["a cat"]], [1]))
    np.testing.assert_allclose(f1, b2["text_features"][0, 0])


def test_bank_accumulates_negatives():
    r = TextRouter(num_text=8, text_dim=4, dataset_prompts=["phrase"])
    r(_batch([["a cat"]], [1]))
    cat_vec = r.bank[0, 0].copy()
    assert np.abs(cat_vec).sum() > 0  # bank updated
    b2 = r(_batch([["a dog"]], [1]))
    # slot 1 of the new features is the banked "a cat" vector
    np.testing.assert_allclose(b2["text_features"][0, 1], cat_vec)


def test_expression_non_cumulative_collapses_to_zero():
    r = TextRouter(
        num_text=8, text_dim=4, dataset_prompts=["expression"],
        expression_cumulative_gt_class=False,
    )
    batch = _batch([["the red car"], ["the left person"]], [1, 1])
    out = r(batch)
    labels = out["targets"]["labels"]
    assert labels[0, 0] == 0 and labels[1, 0] == 0


def test_name_prompt_uses_vocabulary_fallback():
    r = TextRouter(num_text=4, text_dim=8, dataset_prompts=["name"])
    batch = _batch([[]], [1])
    del batch["phrases"]
    out = r(batch)
    assert out["text_valid"][0].all()
    assert out["class_valid"].shape == (1, 4)
