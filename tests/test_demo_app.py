"""demo/app.py glue regressions (round-4 advisor findings).

The gradio UI itself needs gradio (absent in this image); these tests pin the
two pieces of glue the advisor found broken: the model-loading path must go
through demo_lazy.build_model (model_zoo.get returns a bare (model, params)
pair the predictor cannot drive), and the json panel must read detections
from pred["instances"] with the predictor's key names (scores/boxes/classes).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_json_results_reads_predictor_instances():
    from demo.app import _json_results

    pred = {
        "text_list": ["cat", "dog"],
        "instances": {
            "scores": np.asarray([0.9, 0.2, 0.65]),
            "boxes": np.asarray(
                [[0.0, 1.0, 10.0, 12.0], [5, 5, 6, 6], [2.0, 2.0, 8.0, 9.0]]
            ),
            "classes": np.asarray([0, 1, 1]),
        },
    }
    out = _json_results(pred, threshold=0.3)
    assert [r["category"] for r in out] == ["cat", "dog"]
    assert out[0]["score"] == 0.9
    assert out[1]["bbox_xyxy"] == [2.0, 2.0, 8.0, 9.0]
    # no instances -> empty list, not a KeyError
    assert _json_results({"text_list": []}, 0.3) == []


def test_load_builds_via_demo_lazy(monkeypatch):
    import demo.app as app
    import demo.demo_lazy as demo_lazy
    import demo.predictor_lazy as predictor_lazy
    from ape_tpu.model_zoo import model_zoo

    seen = {}

    def fake_build_model(args):
        seen["config_file"] = args.config_file
        seen["init_checkpoint"] = args.init_checkpoint
        return object(), 1024

    class FakeDemo:
        def __init__(self, ape, img_size, *a, **k):
            seen["img_size"] = img_size

    monkeypatch.setattr(demo_lazy, "build_model", fake_build_model)
    monkeypatch.setattr(predictor_lazy, "VisualizationDemo", FakeDemo)
    monkeypatch.setenv("APE_CKPT_APE_Ti", "/tmp/fake.pth")

    cache = {}
    app._load("APE-Ti", cache)
    assert "APE-Ti" in cache
    assert seen["config_file"] == model_zoo.get_config_file("APE-Ti")
    assert seen["init_checkpoint"] == "/tmp/fake.pth"
    assert seen["img_size"] == 1024
    # cached on second call (no rebuild)
    seen.clear()
    app._load("APE-Ti", cache)
    assert not seen
