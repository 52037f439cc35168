#!/usr/bin/env python
"""Prompted image/video demo CLI.

Capability match: /root/reference/demo/demo_lazy.py:121-263 — --config-file,
--input globs / --webcam / --video-input, --text-prompt, --with-box/--with-mask/
--with-sseg, --confidence-threshold, --output dir, COCO-json export.
"""

import argparse
import glob
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

logger = logging.getLogger("ape_tpu")


def get_parser():
    parser = argparse.ArgumentParser(description="APE-TPU demo")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--input", nargs="+", help="image file(s) or glob")
    parser.add_argument("--video-input", default=None, help="video file path")
    parser.add_argument("--webcam", action="store_true", help="camera 0 stream")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--grabcut", action="store_true", help="GrabCut mask refine")
    parser.add_argument("--output", default="", help="output dir or file")
    parser.add_argument("--text-prompt", default=None)
    parser.add_argument("--with-box", action="store_true", default=True)
    parser.add_argument("--with-mask", action="store_true", default=False)
    parser.add_argument("--with-sseg", action="store_true", default=False)
    parser.add_argument("--confidence-threshold", type=float, default=0.3)
    parser.add_argument("--init-checkpoint", default="")
    parser.add_argument(
        "opts", default=None, nargs=argparse.REMAINDER, help="config overrides"
    )
    return parser


def build_model(args):
    import jax
    import jax.numpy as jnp

    from ape_tpu.config import ConfigDict, LazyConfig, instantiate
    from ape_tpu.engine.ape_wrapper import APE
    from ape_tpu.modeling.text.wrapper import EVA02CLIP

    cfg = LazyConfig.load(args.config_file)
    LazyConfig.apply_overrides(cfg, [o for o in (args.opts or []) if "=" in o])
    objs = instantiate(ConfigDict(model=cfg.model))
    model = objs["model"]
    img = int(cfg.train.get("image_size", 1024))
    num_text = int(cfg.train.get("num_text", 80))
    text_dim = int(cfg.train.get("text_dim", 1024))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, img, img, 3)),
        jnp.asarray([[img, img]], jnp.int32),
        jnp.zeros((1, num_text, text_dim)),
        jnp.ones((1, num_text), bool),
    )["params"]
    init = args.init_checkpoint or cfg.train.get("init_checkpoint", "")
    if init:
        from ape_tpu.checkpoint.convert import load_params_tolerant

        params = load_params_tolerant(init, params)
    lang_cfg = dict(cfg.get("language", {}))
    model_language = EVA02CLIP(**lang_cfg)
    ape = APE(
        model,
        params,
        model_language,
        max_text=num_text,
        test_score_thresh=0.05,
    )
    return ape, img


def main():
    logging.basicConfig(level=logging.INFO)
    args = get_parser().parse_args()
    ape, img_size = build_model(args)

    from demo.predictor_lazy import VisualizationDemo, run_on_video

    demo = VisualizationDemo(ape, img_size, args.confidence_threshold)

    if args.video_input or args.webcam:
        import cv2

        src = 0 if args.webcam else args.video_input
        writer = None
        for idx, vis in run_on_video(
            demo, src, text_prompt=args.text_prompt,
            with_box=args.with_box, with_mask=args.with_mask,
            max_frames=args.max_frames,
        ):
            if args.output:
                if writer is None:
                    os.makedirs(args.output, exist_ok=True)
                    h, w = vis.shape[:2]
                    writer = cv2.VideoWriter(
                        os.path.join(args.output, "out.mp4"),
                        cv2.VideoWriter_fourcc(*"mp4v"), 15, (w, h),
                    )
                writer.write(vis[:, :, ::-1])
            logger.info(f"frame {idx} done")
        if writer is not None:
            writer.release()
        return

    paths = []
    for p in args.input or []:
        paths.extend(sorted(glob.glob(p)) if any(c in p for c in "*?[") else [p])
    os.makedirs(args.output or ".", exist_ok=True)

    coco_results = []
    for path in paths:
        image = np.asarray(Image.open(path).convert("RGB"))
        pred, vis = demo.run_on_image(
            image,
            text_prompt=args.text_prompt,
            with_box=args.with_box,
            with_mask=args.with_mask,
            with_sseg=args.with_sseg,
            grabcut=args.grabcut,
        )
        inst = pred.get("instances", {})
        n = len(inst.get("scores", []))
        logger.info(f"{path}: detected {n} instances in {len(pred['text_list'])}-word vocab")
        if args.output:
            out_path = os.path.join(args.output, os.path.basename(path))
            Image.fromarray(vis).save(out_path)
            for i in range(n):
                x0, y0, x1, y1 = [float(v) for v in inst["boxes"][i]]
                coco_results.append(
                    {
                        "image_id": os.path.basename(path),
                        "category_id": int(inst["classes"][i]),
                        "category_name": pred["text_list"][int(inst["classes"][i])]
                        if int(inst["classes"][i]) < len(pred["text_list"])
                        else "",
                        "bbox": [x0, y0, x1 - x0, y1 - y0],
                        "score": float(inst["scores"][i]),
                    }
                )
    if args.output and coco_results:
        with open(os.path.join(args.output, "predictions.json"), "w") as f:
            json.dump(coco_results, f)


if __name__ == "__main__":
    main()
