#!/usr/bin/env python
"""Offline EVA checkpoint surgery: patch-embed 14->16 + pos-embed interpolation.

Capability match: /root/reference/tools/eva_interpolate_patch_14to16.py:18-121.
The same bicubic logic also runs automatically inside the converter
(ape_tpu/checkpoint/convert.py::adapt_shapes) — this CLI exists for protocol
parity with the reference workflow (pre-processing an EVA pretrain .pt before
train.init_checkpoint points at it).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="interpolate patch_embed kernel")
    ap.add_argument("--input", required=True, help="EVA checkpoint with 14x14 patch embed")
    ap.add_argument("--output", required=True)
    ap.add_argument("--image_size", type=int, required=True)
    ap.add_argument("--new_patch", type=int, default=16)
    args = ap.parse_args()

    import torch

    from ape_tpu.checkpoint.convert import interpolate_patch_embed, interpolate_pos_embed_np

    ckpt = torch.load(args.input, map_location="cpu", weights_only=False)
    if "module" in ckpt:
        ckpt["model"] = ckpt.pop("module")
    sd = ckpt["model"] if "model" in ckpt else ckpt
    pe_key = next(k for k in sd if k.endswith("patch_embed.proj.weight"))
    w = np.asarray(sd[pe_key])  # torch (out, in, kh, kw)
    w_hwio = np.transpose(w, (2, 3, 1, 0))
    w_hwio = interpolate_patch_embed(w_hwio, (args.new_patch, args.new_patch))
    sd[pe_key] = torch.from_numpy(np.ascontiguousarray(np.transpose(w_hwio, (3, 2, 0, 1))))
    print(f"patch embed {w.shape} -> {tuple(sd[pe_key].shape)}")

    pos_keys = [k for k in sd if k.endswith("pos_embed")]
    for k in pos_keys:
        pos = np.asarray(sd[k])
        n_new = (args.image_size // args.new_patch) ** 2 + 1
        if pos.shape[-2] != n_new:
            sd[k] = torch.from_numpy(interpolate_pos_embed_np(pos, n_new))
            print(f"pos embed {k}: {pos.shape} -> {tuple(sd[k].shape)}")

    # rename to the detection checkpoint namespace (reference :107-112)
    if "model" in ckpt:
        for k in list(sd):
            sd["backbone.net." + k] = sd.pop(k)
    torch.save(ckpt, args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
