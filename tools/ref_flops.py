#!/usr/bin/env python
"""Analytic matmul/conv FLOPs of the REFERENCE formulation per bench mode.

This is the fvcore-comparable count (the reference's scripts/eval_flops.sh
protocol counts matmuls/convs and cannot see inside the custom CUDA MSDA op,
whose 4-corner bilinear gather is listed separately here). It is the FLOPs
input to BASELINE.md's "Derivation of the A100 estimates": the A100 baseline
for a mode = assumed A100 effective throughput / these FLOPs.

Cross-check: tools/flops_report.py compiles OUR jitted forward and reads
XLA's cost analysis — which likewise excludes custom(-call) kernels, i.e. the
Pallas window MSDA — so the two should agree to ~10% (XLA counts a few extra
elementwise/softmax terms; fvcore counts convs only).

All counts: batch 1, multiply-add = 2 FLOPs. Layer norms, activations,
softmaxes, position embeddings excluded (fvcore convention).

Usage: python tools/ref_flops.py  -> one JSON line per (model, mode)
"""

import json


def vit_flops(tokens, dim, depth, win_tokens, global_every=3, mlp_hidden=None,
              img_tokens=None):
    """EVA-02/CLIP ViT: qkv+proj, window/global attention, SwiGLU MLP."""
    mlp_hidden = mlp_hidden or int(dim * 8 / 3 + 0.5)
    n = tokens
    patch = 3 * 16 * 16 * dim * n * 2
    total = patch
    for i in range(depth):
        is_global = (i + 1) % global_every == 0
        t = n if is_global else win_tokens
        qkv_proj = 4 * dim * dim * n * 2
        attn = 2 * n * t * dim * 2
        mlp = 3 * dim * mlp_hidden * n * 2
        total += qkv_proj + attn + mlp
    return total


def sfp_neck_flops(level_tokens, backbone_dim):
    """SimpleFeaturePyramid (per-level convs to 256) + ChannelMapper."""
    total = 0
    for n in level_tokens:
        # SFP: 1x1 (dim->256) + 3x3 (256->256); ChannelMapper 1x1 256->256.
        # Deconv ladders / maxpool are minor next to the 3x3 and are folded
        # into the same estimate (they operate at backbone_dim/2..4).
        total += n * (backbone_dim * 256 + 9 * 256 * 256 + 256 * 256) * 2
    return total


def encoder_flops(n_tokens, layers=6, dim=256, ffn=2048, heads=8, levels=5,
                  points=4, vl=False, num_text=0, vl_dim=2048, l_dim=1024):
    per_tok = (
        2 * dim * dim  # value_proj + output_proj
        + dim * (heads * levels * points * 3)  # sampling offsets (2) + weights
        + 2 * dim * ffn  # FFN
    ) * 2
    total = layers * n_tokens * per_tok
    if vl:
        k = num_text
        n = n_tokens
        per_layer = (
            n * (dim * vl_dim * 2) * 2  # v->q proj + out proj back to 256
            + k * (l_dim * vl_dim * 3) * 2  # l k/v projs + out proj to 1024
            + 3 * n * k * vl_dim * 2  # scores, attn @ v_l, attn^T @ v_v
        )
        total += layers * per_layer
    return total


def msda_gather_flops(n_tokens, layers=6, heads=8, levels=5, points=4, head_dim=32):
    """The custom-op 4-corner bilinear gather (NOT in the fvcore count)."""
    return layers * n_tokens * heads * levels * points * 4 * head_dim * 2


def decoder_flops(n_tokens, queries=900, layers=6, dim=256, ffn=2048,
                  heads=8, levels=5, points=4):
    per_layer = (
        queries * (4 * dim * dim + dim * (heads * levels * points * 3)) * 2
        + 2 * queries * queries * dim * 2  # self-attention
        + n_tokens * dim * dim * 2  # cross-attn value_proj over memory
        + queries * dim * dim * 2  # cross-attn output_proj
        + 2 * queries * dim * ffn * 2  # FFN
    )
    return layers * per_layer


def heads_flops(n_tokens, queries=900, layers=6, dim=256, num_text=80,
                mask_on=False, p2_tokens=0):
    total = layers * queries * (dim * num_text + 3 * dim * dim) * 2  # align+bbox MLP
    total += n_tokens * dim * (1 + 4 + dim) * 2  # enc binary head + proposals+pos_trans
    if mask_on:
        total += 3 * 9 * dim * dim * p2_tokens * 2  # maskdino pixel decoder convs
        total += queries * dim * p2_tokens * 2  # mask einsum bqc,bchw
    return total


def mode_tokens(img=1024, protocol=True):
    if protocol:
        hw = [img // 8, img // 16, img // 32, img // 64, img // 128]
    else:
        hw = [img // 4, img // 8, img // 16, img // 32, img // 64]
    return [h * h for h in hw]


def main():
    img = 1024
    vit_tokens = (img // 16) ** 2
    out = {}
    for model, (dim, depth, win, num_text) in {
        "ti": (192, 12, 14 * 14, 80),
        "l_d": (1024, 24, 32 * 32, 1203),
    }.items():
        for mode in ("protocol", "full"):
            lvl = mode_tokens(img, protocol=(mode == "protocol"))
            n = sum(lvl)
            bb = vit_flops(vit_tokens, dim, depth, win)
            neck = sfp_neck_flops(lvl, dim)
            enc = encoder_flops(
                n, vl=(model == "l_d"), num_text=num_text
            )
            dec = decoder_flops(n)
            hd = heads_flops(
                n, num_text=num_text, mask_on=(mode == "full"), p2_tokens=lvl[0]
            )
            gather = msda_gather_flops(n) + msda_gather_flops(900, layers=6) // 900 * 900
            total = bb + neck + enc + dec + hd
            rec = {
                "backbone_gf": round(bb / 1e9, 1),
                "neck_gf": round(neck / 1e9, 1),
                "encoder_gf": round(enc / 1e9, 1),
                "decoder_gf": round(dec / 1e9, 1),
                "heads_gf": round(hd / 1e9, 1),
                "total_gf": round(total / 1e9, 1),
                "msda_gather_gf_not_counted": round(gather / 1e9, 1),
                "tokens": n,
            }
            out[f"{model}-{mode}"] = rec
            print(json.dumps({"key": f"{model}-{mode}", **rec}))
    with open("REF_FLOPS.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")


if __name__ == "__main__":
    main()
