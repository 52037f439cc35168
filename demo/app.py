#!/usr/bin/env python
"""Gradio web demo for prompted detection/segmentation/grounding.

Capability match: /root/reference/demo/app.py — per-model tabs for the five
released checkpoints (APE-Ti, APE-L_A..D: reference :528-714 loaders, :716-900
tabs), a model-comparison tab (:408-428), an example gallery per tab
(:30-250 example tables), output-type checkboxes, a JSON results panel next
to the visualization, and a score-threshold slider.

Gradio is an optional dependency (not baked into the TPU image); the module
degrades to a CLI hint when absent. Checkpoints resolve through the model
zoo (env `APE_CKPT_<NAME>` overrides; offline fallback = random init with a
visible warning, mirroring model_zoo semantics).
"""

import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logger = logging.getLogger("ape_tpu")

THIS_DIR = os.path.dirname(os.path.abspath(__file__))

# model name -> zoo name; configs/checkpoints resolve via ape_tpu.model_zoo
MODEL_NAMES = ["APE-Ti", "APE-L_A", "APE-L_B", "APE-L_C", "APE-L_D"]

OUTPUT_TYPES = ["object detection", "instance segmentation", "semantic segmentation"]

# example rows: (image path, prompt, threshold, output types). Images are
# looked up under demo/examples/ and rows with missing files are dropped, so
# the gallery works with whatever assets are present.
EXAMPLES = [
    ("Totoro01.png", "Totoro", 0.15, OUTPUT_TYPES[:2]),
    ("TheGreatWall.jpg", "the Great Wall", 0.25, OUTPUT_TYPES[:1]),
    ("Pisa.jpg", "Leaning Tower of Pisa", 0.25, OUTPUT_TYPES[:2]),
    ("SolvayConference1927.jpg", "person", 0.3, OUTPUT_TYPES[:1]),
    ("Transformers.webp", "Optimus Prime", 0.2, OUTPUT_TYPES[:2]),
    ("cat_dog.jpg", "cat,dog,frisbee", 0.3, OUTPUT_TYPES[:2]),
]


def _examples():
    rows = []
    for name, prompt, thr, types in EXAMPLES:
        path = os.path.join(THIS_DIR, "examples", name)
        if os.path.exists(path):
            rows.append([path, prompt, thr, types])
    return rows


def _load(model_name, cache):
    if model_name not in cache:
        import types

        from ape_tpu.model_zoo import model_zoo
        from demo.demo_lazy import build_model
        from demo.predictor_lazy import VisualizationDemo

        env_key = f"APE_CKPT_{model_name.replace('-', '_')}"
        ckpt = os.environ.get(env_key, "") or model_zoo._local_checkpoint(model_name) or ""
        if not ckpt:
            logger.warning(
                f"{model_name}: no checkpoint via ${env_key} or $APE_CHECKPOINT_DIR; "
                "running with random-init params"
            )
        # build the full APE engine wrapper (model + params + language model)
        # exactly as the CLI demo does — model_zoo.get() returns only the bare
        # (model, params) pair, which the predictor cannot drive
        args = types.SimpleNamespace(
            config_file=model_zoo.get_config_file(model_name),
            opts=[],
            init_checkpoint=ckpt,
        )
        ape, img_size = build_model(args)
        cache[model_name] = VisualizationDemo(ape, img_size)
    return cache[model_name]


def _predict(demo, image, text_prompt, threshold, output_types):
    import numpy as np

    demo.threshold = threshold
    pred, vis = demo.run_on_image(
        np.asarray(image),
        text_prompt=text_prompt or None,
        with_box="object detection" in output_types,
        with_mask="instance segmentation" in output_types,
        with_sseg="semantic segmentation" in output_types,
    )
    return vis, _json_results(pred, threshold)


def _json_results(pred, threshold):
    """Reference returns COCO-ish json results beside the image (:757,:807)."""
    import numpy as np

    names = pred.get("text_list", [])
    out = []
    inst = pred.get("instances") or {}
    scores = np.asarray(inst.get("scores", []))
    boxes = np.asarray(inst.get("boxes", np.zeros((0, 4))))
    labels = np.asarray(inst.get("classes", np.zeros((0,), np.int64)))
    for i in range(len(scores)):
        if scores[i] < threshold:
            continue
        li = int(labels[i]) if i < len(labels) else -1
        out.append(
            {
                "score": round(float(scores[i]), 4),
                "category": names[li] if 0 <= li < len(names) else str(li),
                "bbox_xyxy": [round(float(v), 1) for v in boxes[i]] if i < len(boxes) else None,
            }
        )
    return out


def build_demo():
    import gradio as gr

    cache = {}

    def make_tab(model_name):
        with gr.Tab(model_name):
            with gr.Row(equal_height=False):
                with gr.Column(scale=1):
                    image = gr.Image(type="pil", label="input image")
                    prompt = gr.Textbox(
                        label="text prompt (comma-separated names, or a phrase)"
                    )
                    threshold = gr.Slider(0.0, 1.0, 0.3, label="score threshold")
                    types = gr.CheckboxGroup(
                        OUTPUT_TYPES, value=OUTPUT_TYPES[:1], label="output types"
                    )
                    btn = gr.Button("Run")
                with gr.Column(scale=2):
                    out_img = gr.Image(label="output")
                    out_json = gr.JSON(label="json results")
            rows = _examples()
            if rows:
                gr.Examples(examples=rows, inputs=[image, prompt, threshold, types])

            def run(image, prompt, threshold, types, model_name=model_name):
                demo = _load(model_name, cache)
                return _predict(demo, image, prompt, threshold, types)

            btn.click(run, [image, prompt, threshold, types], [out_img, out_json])

    def make_comparison_tab():
        with gr.Tab("Comparison"):
            with gr.Row(equal_height=False):
                with gr.Column(scale=1):
                    image = gr.Image(type="pil", label="input image")
                    prompt = gr.Textbox(label="text prompt")
                    threshold = gr.Slider(0.0, 1.0, 0.3, label="score threshold")
                    models = gr.CheckboxGroup(
                        MODEL_NAMES, value=["APE-Ti"], label="models"
                    )
                    btn = gr.Button("Run all")
                with gr.Column(scale=2):
                    gallery = gr.Gallery(label="outputs (one per model)")

            def run_all(image, prompt, threshold, models):
                outs = []
                for name in models:
                    demo = _load(name, cache)
                    vis, _ = _predict(demo, image, prompt, threshold, OUTPUT_TYPES[:2])
                    outs.append((vis, name))
                return outs

            btn.click(run_all, [image, prompt, threshold, models], gallery)

    with gr.Blocks(title="APE-TPU") as ui:
        gr.Markdown(
            "# APE-TPU: Aligning and Prompting Everything, on TPU\n"
            "Prompted open-vocabulary detection, instance/semantic "
            "segmentation and visual grounding. Five released-checkpoint "
            "slots; set `APE_CKPT_<NAME>` to a converted checkpoint path."
        )
        for name in MODEL_NAMES:
            make_tab(name)
        make_comparison_tab()
    return ui


if __name__ == "__main__":
    try:
        import gradio  # noqa: F401
    except ImportError:
        print("gradio is not installed in this image; use demo/demo_lazy.py instead")
        sys.exit(1)
    build_demo().launch()
