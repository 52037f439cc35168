"""torch-checkpoint -> flax params converter for released APE weights.

Capability match: DetectionCheckpointer's tolerant load + the
``?matching_heuristics=True`` EVA-pretrain remapping and the offline
patch-14->16 / pos-embed interpolation (reference ape/checkpoint/
detection_checkpoint.py:16-47, tools/eva_interpolate_patch_14to16.py:18-121).

The reference state dict roots at ``model_vision.*`` (the SomeThing wrapper
deletes its own prefix) with the detrex/torch module names; this maps them onto
the ape_tpu flax tree. Layout rules:
  Linear  weight (out,in)        -> kernel (in,out)           [transpose]
  Conv2d  weight (out,in,kh,kw)  -> kernel (kh,kw,in,out)     [transpose 2,3,1,0]
  ConvT2d weight (in,out,kh,kw)  -> kernel (kh,kw,in,out)     [transpose 2,3,0,1]
  LayerNorm/GroupNorm weight/bias -> scale/bias
  packed in_proj (3C,C)          -> qkv kernel / q,k,v splits
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Sequence

import numpy as np

logger = logging.getLogger("ape_tpu")


def _t_linear(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _t_conv(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _t_convT(w):
    # torch ConvTranspose2d (in, out, kH, kW) -> flax ConvTranspose
    # (kH, kW, in, out) with a SPATIAL FLIP: flax lowers through
    # lax.conv_transpose(transpose_kernel=False), which correlates the kernel
    # as-is, while torch's transposed conv scatters it unflipped — verified by
    # direct A/B (the full-model parity harness caught p2/p3 diverging while
    # the deconv-free p4/p5/p6 matched at 1e-6)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1])


def flatten_tree(tree: Dict, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = v
    return out


def unflatten_tree(flat: Dict[str, Any]) -> Dict:
    tree: Dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


# rule table: (regex on torch name, target template, transform)
# Torch names are the reference's `model_vision.`-stripped keys.
_RULES = [
    # ---- ViT backbone ----
    (r"backbone\.net\.patch_embed\.proj\.weight", "backbone/net/patch_embed/kernel", _t_conv),
    (r"backbone\.net\.patch_embed\.proj\.bias", "backbone/net/patch_embed/bias", None),
    (r"backbone\.net\.pos_embed", "backbone/net/pos_embed", None),
    (r"backbone\.net\.blocks\.(\d+)\.norm(\d)\.weight", r"backbone/net/blocks_\1/norm\2/scale", None),
    (r"backbone\.net\.blocks\.(\d+)\.norm(\d)\.bias", r"backbone/net/blocks_\1/norm\2/bias", None),
    (r"backbone\.net\.blocks\.(\d+)\.attn\.qkv\.weight", r"backbone/net/blocks_\1/attn/qkv/kernel", _t_linear),
    (r"backbone\.net\.blocks\.(\d+)\.attn\.([qkv])_proj\.weight", r"backbone/net/blocks_\1/attn/\2_proj/kernel", _t_linear),
    (r"backbone\.net\.blocks\.(\d+)\.attn\.q_bias", r"backbone/net/blocks_\1/attn/q_bias", None),
    (r"backbone\.net\.blocks\.(\d+)\.attn\.v_bias", r"backbone/net/blocks_\1/attn/v_bias", None),
    (r"backbone\.net\.blocks\.(\d+)\.attn\.inner_attn_ln\.weight", r"backbone/net/blocks_\1/attn/inner_attn_ln/scale", None),
    (r"backbone\.net\.blocks\.(\d+)\.attn\.inner_attn_ln\.bias", r"backbone/net/blocks_\1/attn/inner_attn_ln/bias", None),
    (r"backbone\.net\.blocks\.(\d+)\.attn\.proj\.weight", r"backbone/net/blocks_\1/attn/proj/kernel", _t_linear),
    (r"backbone\.net\.blocks\.(\d+)\.attn\.proj\.bias", r"backbone/net/blocks_\1/attn/proj/bias", None),
    (r"backbone\.net\.blocks\.(\d+)\.mlp\.w12\.weight", r"backbone/net/blocks_\1/mlp/w12/kernel", _t_linear),
    (r"backbone\.net\.blocks\.(\d+)\.mlp\.w12\.bias", r"backbone/net/blocks_\1/mlp/w12/bias", None),
    (r"backbone\.net\.blocks\.(\d+)\.mlp\.w(\d)\.weight", r"backbone/net/blocks_\1/mlp/w\2/kernel", _t_linear),
    (r"backbone\.net\.blocks\.(\d+)\.mlp\.w(\d)\.bias", r"backbone/net/blocks_\1/mlp/w\2/bias", None),
    (r"backbone\.net\.blocks\.(\d+)\.mlp\.ffn_ln\.weight", r"backbone/net/blocks_\1/mlp/ffn_ln/scale", None),
    (r"backbone\.net\.blocks\.(\d+)\.mlp\.ffn_ln\.bias", r"backbone/net/blocks_\1/mlp/ffn_ln/bias", None),
    # EVA-01: plain MLP + decomposed rel-pos tables (vit_eva.py:102-147)
    (r"backbone\.net\.blocks\.(\d+)\.mlp\.fc(\d)\.weight", r"backbone/net/blocks_\1/mlp/fc\2/kernel", _t_linear),
    (r"backbone\.net\.blocks\.(\d+)\.mlp\.fc(\d)\.bias", r"backbone/net/blocks_\1/mlp/fc\2/bias", None),
    (r"backbone\.net\.blocks\.(\d+)\.attn\.rel_pos_([hw])", r"backbone/net/blocks_\1/attn/rel_pos_\2", None),
    # ---- SimpleFeaturePyramid (Sequential indices per scale) ----
    # scale 4.0 (simfp_2): 0 deconv1, 1 LN, 3 deconv2, 4 conv1x1, 5 conv3x3
    (r"backbone\.simfp_2\.0\.weight", "backbone/simfp_2_deconv1/kernel", _t_convT),
    (r"backbone\.simfp_2\.0\.bias", "backbone/simfp_2_deconv1/bias", None),
    (r"backbone\.simfp_2\.1\.weight", "backbone/simfp_2_ln/scale", None),
    (r"backbone\.simfp_2\.1\.bias", "backbone/simfp_2_ln/bias", None),
    (r"backbone\.simfp_2\.3\.weight", "backbone/simfp_2_deconv2/kernel", _t_convT),
    (r"backbone\.simfp_2\.3\.bias", "backbone/simfp_2_deconv2/bias", None),
    (r"backbone\.simfp_2\.4\.weight", "backbone/simfp_2_conv1x1/conv/kernel", _t_conv),
    (r"backbone\.simfp_2\.4\.norm\.weight", "backbone/simfp_2_conv1x1/norm/scale", None),
    (r"backbone\.simfp_2\.4\.norm\.bias", "backbone/simfp_2_conv1x1/norm/bias", None),
    (r"backbone\.simfp_2\.5\.weight", "backbone/simfp_2_conv3x3/conv/kernel", _t_conv),
    (r"backbone\.simfp_2\.5\.norm\.weight", "backbone/simfp_2_conv3x3/norm/scale", None),
    (r"backbone\.simfp_2\.5\.norm\.bias", "backbone/simfp_2_conv3x3/norm/bias", None),
    # scale 2.0 (simfp_3): 0 deconv1, 1 conv1x1, 2 conv3x3
    (r"backbone\.simfp_3\.0\.weight", "backbone/simfp_3_deconv1/kernel", _t_convT),
    (r"backbone\.simfp_3\.0\.bias", "backbone/simfp_3_deconv1/bias", None),
    (r"backbone\.simfp_3\.1\.weight", "backbone/simfp_3_conv1x1/conv/kernel", _t_conv),
    (r"backbone\.simfp_3\.1\.norm\.weight", "backbone/simfp_3_conv1x1/norm/scale", None),
    (r"backbone\.simfp_3\.1\.norm\.bias", "backbone/simfp_3_conv1x1/norm/bias", None),
    (r"backbone\.simfp_3\.2\.weight", "backbone/simfp_3_conv3x3/conv/kernel", _t_conv),
    (r"backbone\.simfp_3\.2\.norm\.weight", "backbone/simfp_3_conv3x3/norm/scale", None),
    (r"backbone\.simfp_3\.2\.norm\.bias", "backbone/simfp_3_conv3x3/norm/bias", None),
    # scale 1.0 (simfp_4): 0 conv1x1, 1 conv3x3
    (r"backbone\.simfp_4\.0\.weight", "backbone/simfp_4_conv1x1/conv/kernel", _t_conv),
    (r"backbone\.simfp_4\.0\.norm\.weight", "backbone/simfp_4_conv1x1/norm/scale", None),
    (r"backbone\.simfp_4\.0\.norm\.bias", "backbone/simfp_4_conv1x1/norm/bias", None),
    (r"backbone\.simfp_4\.1\.weight", "backbone/simfp_4_conv3x3/conv/kernel", _t_conv),
    (r"backbone\.simfp_4\.1\.norm\.weight", "backbone/simfp_4_conv3x3/norm/scale", None),
    (r"backbone\.simfp_4\.1\.norm\.bias", "backbone/simfp_4_conv3x3/norm/bias", None),
    # scale 0.5 (simfp_5): 0 maxpool, 1 conv1x1, 2 conv3x3
    (r"backbone\.simfp_5\.1\.weight", "backbone/simfp_5_conv1x1/conv/kernel", _t_conv),
    (r"backbone\.simfp_5\.1\.norm\.weight", "backbone/simfp_5_conv1x1/norm/scale", None),
    (r"backbone\.simfp_5\.1\.norm\.bias", "backbone/simfp_5_conv1x1/norm/bias", None),
    (r"backbone\.simfp_5\.2\.weight", "backbone/simfp_5_conv3x3/conv/kernel", _t_conv),
    (r"backbone\.simfp_5\.2\.norm\.weight", "backbone/simfp_5_conv3x3/norm/scale", None),
    (r"backbone\.simfp_5\.2\.norm\.bias", "backbone/simfp_5_conv3x3/norm/bias", None),
    # ---- neck (detrex ChannelMapper: convs.{i}.{conv,gn}) ----
    (r"neck\.convs\.(\d+)\.conv\.weight", None, _t_conv),  # handled dynamically (level name)
    # ---- transformer top ----
    (r"transformer\.level_embeds", "transformer/level_embeds", None),
    (r"transformer\.enc_output\.weight", "transformer/enc_output/kernel", _t_linear),
    (r"transformer\.enc_output\.bias", "transformer/enc_output/bias", None),
    (r"transformer\.enc_output_norm\.weight", "transformer/enc_output_norm/scale", None),
    (r"transformer\.enc_output_norm\.bias", "transformer/enc_output_norm/bias", None),
    (r"transformer\.pos_trans\.weight", "transformer/pos_trans/kernel", _t_linear),
    (r"transformer\.pos_trans\.bias", "transformer/pos_trans/bias", None),
    (r"transformer\.pos_trans_norm\.weight", "transformer/pos_trans_norm/scale", None),
    (r"transformer\.pos_trans_norm\.bias", "transformer/pos_trans_norm/bias", None),
    (r"transformer\.pix_trans\.weight", "transformer/pix_trans/kernel", _t_linear),
    (r"transformer\.pix_trans\.bias", "transformer/pix_trans/bias", None),
    (r"transformer\.pix_trans_norm\.weight", "transformer/pix_trans_norm/scale", None),
    (r"transformer\.pix_trans_norm\.bias", "transformer/pix_trans_norm/bias", None),
    # trained "learnable" name-prompt fusion token (segm_vl.py:155-158); the
    # frozen "zero" variant is dropped by the zero-token fast path in the model
    (r"name_prompt_fusion_feature", "name_prompt_fusion_feature", None),
]

_LEVELS = ("p2", "p3", "p4", "p5", "p6")

# detrex BaseTransformerLayer names -> ours, per encoder/decoder layer
_MSDA_PARTS = {
    "sampling_offsets": "sampling_offsets",
    "attention_weights": "attention_weights",
    "value_proj": "value_proj",
    "output_proj": "output_proj",
}


def _convert_enc_dec(name: str, value) -> Dict[str, Any]:
    out = {}
    m = re.match(r"transformer\.encoder\.layers\.(\d+)\.(.*)", name)
    if m:
        i, rest = m.group(1), m.group(2)
        base = f"transformer/encoder/layers_{i}"
        out.update(_convert_layer_rest(base, rest, value, decoder=False))
        return out
    m = re.match(r"transformer\.encoder\.vl_layers\.(\d+)\.(.*)", name)
    if m:
        i, rest = m.group(1), m.group(2)
        base = f"transformer/encoder/vl_layers_{i}"
        rest = rest.replace("b_attn.", "")
        if rest.startswith("attn."):
            sub = rest[len("attn.") :]
            pname, kind = sub.rsplit(".", 1)
            tgt = f"{base}/attn/{pname}/{'kernel' if kind == 'weight' else 'bias'}"
            out[tgt] = _t_linear(value) if kind == "weight" else np.asarray(value)
        elif rest in ("gamma_v", "gamma_l"):
            out[f"{base}/{rest}"] = np.asarray(value)
        elif rest.startswith("layer_norm"):
            pname, kind = rest.rsplit(".", 1)
            out[f"{base}/{pname}/{'scale' if kind == 'weight' else 'bias'}"] = np.asarray(value)
        return out
    m = re.match(r"transformer\.decoder\.layers\.(\d+)\.(.*)", name)
    if m:
        i, rest = m.group(1), m.group(2)
        base = f"transformer/decoder/layers_{i}"
        out.update(_convert_layer_rest(base, rest, value, decoder=True))
        return out
    m = re.match(r"transformer\.decoder\.bbox_embed\.(\d+)\.layers\.(\d+)\.(weight|bias)", name)
    if m:
        i, j, kind = m.groups()
        tgt = f"transformer/decoder/bbox_embed_{i}/layer{j}/{'kernel' if kind == 'weight' else 'bias'}"
        out[tgt] = _t_linear(value) if kind == "weight" else np.asarray(value)
        return out
    # proposal_ambiguous head copies (deformable_detr.py:188-201)
    m = re.match(
        r"transformer\.decoder\.bbox_embed_ambiguous\.(\d+)\.layers\.(\d+)\.(weight|bias)",
        name,
    )
    if m:
        i, j, kind = m.groups()
        tgt = (
            f"transformer/decoder/bbox_embed_ambiguous_{i}/layer{j}/"
            f"{'kernel' if kind == 'weight' else 'bias'}"
        )
        out[tgt] = _t_linear(value) if kind == "weight" else np.asarray(value)
        return out
    m = re.match(
        r"transformer\.decoder\.class_embed_ambiguous\.(\d+)\.(weight|bias)", name
    )
    if m:
        i, kind = m.groups()
        tgt = (
            f"transformer/decoder/class_embed_ambiguous_{i}/"
            f"{'kernel' if kind == 'weight' else 'bias'}"
        )
        out[tgt] = _t_linear(value) if kind == "weight" else np.asarray(value)
        return out
    return out


def _convert_layer_rest(base: str, rest: str, value, decoder: bool) -> Dict[str, Any]:
    """detrex BaseTransformerLayer: attentions.{0,1}, ffns.0, norms.{i}."""
    out = {}
    v = np.asarray(value)
    m = re.match(r"attentions\.(\d)\.(.*)", rest)
    if m:
        ai, sub = int(m.group(1)), m.group(2)
        if decoder and ai == 0:  # self MHA
            if sub == "attn.in_proj_weight":
                q, k, kv = np.split(v, 3, axis=0)
                for nm, w in zip(("q_proj", "k_proj", "v_proj"), (q, k, kv)):
                    out[f"{base}/self_attn/{nm}/kernel"] = _t_linear(w)
            elif sub == "attn.in_proj_bias":
                q, k, kv = np.split(v, 3, axis=0)
                for nm, w in zip(("q_proj", "k_proj", "v_proj"), (q, k, kv)):
                    out[f"{base}/self_attn/{nm}/bias"] = w
            elif sub == "attn.out_proj.weight":
                out[f"{base}/self_attn/out_proj/kernel"] = _t_linear(v)
            elif sub == "attn.out_proj.bias":
                out[f"{base}/self_attn/out_proj/bias"] = v
        else:  # MSDA (encoder attentions.0 / decoder attentions.1)
            dst = "attn" if not decoder else "cross_attn"
            pm = re.match(r"(\w+)\.(weight|bias)", sub)
            if pm and pm.group(1) in _MSDA_PARTS:
                kind = pm.group(2)
                tgt = f"{base}/{dst}/{pm.group(1)}/{'kernel' if kind == 'weight' else 'bias'}"
                out[tgt] = _t_linear(v) if kind == "weight" else v
        return out
    m = re.match(r"ffns\.0\.layers\.0\.0\.(weight|bias)", rest)
    if m:
        kind = m.group(1)
        out[f"{base}/ffn/fc1/{'kernel' if kind == 'weight' else 'bias'}"] = (
            _t_linear(v) if kind == "weight" else v
        )
        return out
    m = re.match(r"ffns\.0\.layers\.1\.(weight|bias)", rest)
    if m:
        kind = m.group(1)
        out[f"{base}/ffn/fc2/{'kernel' if kind == 'weight' else 'bias'}"] = (
            _t_linear(v) if kind == "weight" else v
        )
        return out
    m = re.match(r"norms\.(\d)\.(weight|bias)", rest)
    if m:
        ni, kind = int(m.group(1)), m.group(2)
        out[f"{base}/norm{ni + 1}/{'scale' if kind == 'weight' else 'bias'}"] = v
        return out
    return out


def _convert_heads(name: str, value) -> Dict[str, Any]:
    out = {}
    v = np.asarray(value)
    m = re.match(r"class_embed\.(\d+)\.(.*)", name)
    if m:
        i, rest = m.group(1), m.group(2)
        base = f"class_embed_{i}"
        if rest == "dot_product_projection_text.weight":
            out[f"{base}/dot_product_projection_text/kernel"] = _t_linear(v)
        elif rest == "dot_product_projection_text.bias":
            out[f"{base}/dot_product_projection_text/bias"] = v
        elif rest in ("log_scale", "bias_lang", "bias0"):
            out[f"{base}/{rest}"] = v
        elif rest == "weight":  # the binary Linear head (last class_embed)
            out["enc_class_head_linear/kernel"] = _t_linear(v)
        elif rest == "bias":
            out["enc_class_head_linear/bias"] = v
        return out
    m = re.match(r"mask_embed(?:\.(\d+))?\.layers\.(\d+)\.(weight|bias)", name)
    if m:
        i, j, kind = m.groups()
        base = f"mask_embed_{i}" if i is not None else "mask_embed"
        out[f"{base}/layer{j}/{'kernel' if kind == 'weight' else 'bias'}"] = (
            _t_linear(v) if kind == "weight" else v
        )
        return out
    for conv in ("lateral_conv", "output_conv", "mask_conv"):
        if name == f"{conv}.weight":
            out[f"{conv}/kernel"] = _t_conv(v)
            return out
        if name == f"{conv}.norm.weight":
            out[f"{conv.replace('_conv', '_norm')}/scale"] = v
            return out
        if name == f"{conv}.norm.bias":
            out[f"{conv.replace('_conv', '_norm')}/bias"] = v
            return out
    return out


_BN_PARTS = {"weight": "scale", "bias": "bias", "running_mean": "mean", "running_var": "var"}


def _convert_resnet(name: str, value) -> Dict[str, Any]:
    """d2 ResNet names (reference models/ape_deta_r50.py backbone) -> ours.

    backbone.stem.conv1.{weight,norm.*}            -> backbone/stem_{conv,norm}
    backbone.res{s}.{i}.conv{j}.{weight,norm.*}    -> backbone/res{s}_block{i}/…
    backbone.res{s}.{i}.shortcut.{weight,norm.*}   -> …/shortcut{,_norm}
    """
    out = {}
    v = np.asarray(value)
    m = re.match(r"backbone\.stem\.conv1\.weight$", name)
    if m:
        out["backbone/stem_conv/kernel"] = _t_conv(v)
        return out
    m = re.match(r"backbone\.stem\.conv1\.norm\.(\w+)$", name)
    if m and m.group(1) in _BN_PARTS:
        out[f"backbone/stem_norm/{_BN_PARTS[m.group(1)]}"] = v
        return out
    m = re.match(r"backbone\.(res\d)\.(\d+)\.conv(\d)\.weight$", name)
    if m:
        out[f"backbone/{m.group(1)}_block{m.group(2)}/conv{m.group(3)}/kernel"] = _t_conv(v)
        return out
    m = re.match(r"backbone\.(res\d)\.(\d+)\.conv(\d)\.norm\.(\w+)$", name)
    if m and m.group(4) in _BN_PARTS:
        out[f"backbone/{m.group(1)}_block{m.group(2)}/norm{m.group(3)}/{_BN_PARTS[m.group(4)]}"] = v
        return out
    m = re.match(r"backbone\.(res\d)\.(\d+)\.shortcut\.weight$", name)
    if m:
        out[f"backbone/{m.group(1)}_block{m.group(2)}/shortcut/kernel"] = _t_conv(v)
        return out
    m = re.match(r"backbone\.(res\d)\.(\d+)\.shortcut\.norm\.(\w+)$", name)
    if m and m.group(3) in _BN_PARTS:
        out[f"backbone/{m.group(1)}_block{m.group(2)}/shortcut_norm/{_BN_PARTS[m.group(3)]}"] = v
        return out
    # detrex ChannelMapper extra convs (num_outs > len(in_features))
    m = re.match(r"neck\.extra_convs\.(\d+)\.conv\.(weight|bias)$", name)
    if m:
        kind = "kernel" if m.group(2) == "weight" else "bias"
        out[f"neck/extra_conv_{m.group(1)}/{kind}"] = _t_conv(v) if kind == "kernel" else v
        return out
    m = re.match(r"neck\.extra_convs\.(\d+)\.gn\.(weight|bias)$", name)
    if m:
        out[f"neck/extra_gn_{m.group(1)}/{'scale' if m.group(2) == 'weight' else 'bias'}"] = v
        return out
    return out


def convert_torch_state_dict(
    state_dict: Dict[str, Any], neck_levels: Sequence[str] = _LEVELS
) -> Dict[str, Any]:
    """Convert a reference torch state dict (numpy values) to a flat flax dict.

    neck_levels: the neck's in_features names in order, i.e. what
    `neck.convs.{i}` maps (ViT configs: p2..p6; r50 configs: res3..res5).
    """
    flat: Dict[str, Any] = {}
    unmatched = []
    for name, value in state_dict.items():
        name = name.removeprefix("model.").removeprefix("model_vision.")
        # neck: convs.{i} -> conv_{level} (+ gn)
        m = re.match(r"neck\.convs\.(\d+)\.conv\.(weight|bias)", name)
        if m:
            lvl = neck_levels[int(m.group(1))]
            kind = m.group(2)
            flat[f"neck/conv_{lvl}/{'kernel' if kind == 'weight' else 'bias'}"] = (
                _t_conv(value) if kind == "weight" else np.asarray(value)
            )
            continue
        m = re.match(r"neck\.convs\.(\d+)\.gn\.(weight|bias)", name)
        if m:
            lvl = neck_levels[int(m.group(1))]
            kind = m.group(2)
            flat[f"neck/gn_{lvl}/{'scale' if kind == 'weight' else 'bias'}"] = np.asarray(value)
            continue
        out = _convert_resnet(name, value)
        if out:
            flat.update(out)
            continue

        done = False
        for pattern, target, tf in _RULES:
            m = re.fullmatch(pattern, name)
            if m and target is not None:
                flat[m.expand(target)] = tf(value) if tf else np.asarray(value)
                done = True
                break
        if done:
            continue
        out = _convert_enc_dec(name, value)
        if not out:
            out = _convert_heads(name, value)
        if out:
            flat.update(out)
        else:
            unmatched.append(name)
    if unmatched:
        logger.warning(
            f"convert: {len(unmatched)} unmatched keys (first 10): {unmatched[:10]}"
        )
    return flat


def convert_language_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """EVA-CLIP text tower torch keys -> flat flax dict for CLIPTextTransformer.

    Reference layout (ape/modeling/text/eva02_clip/transformer.py:642-700,
    checkpoint root ``model_language.net.``): token_embedding.weight,
    positional_embedding, transformer.resblocks.{i}.{ln_1,attn.in_proj_*,
    attn.out_proj,ls_2?,ln_2,mlp.c_fc,mlp.c_proj}, ln_final, text_projection.
    """
    flat: Dict[str, Any] = {}
    unmatched = []
    for name, value in state_dict.items():
        for pref in ("model_language.", "net.", "text."):
            name = name.removeprefix(pref)
        v = np.asarray(value)
        if name == "token_embedding.weight":
            flat["token_embedding/embedding"] = v
        elif name == "positional_embedding":
            flat["positional_embedding"] = v
        elif name == "text_projection":
            flat["text_projection"] = v  # used as x @ P in both frameworks
        elif name in ("ln_final.weight", "ln_final.bias"):
            flat[f"ln_final/{'scale' if name.endswith('weight') else 'bias'}"] = v
        else:
            m = re.match(r"transformer\.resblocks\.(\d+)\.(.*)", name)
            if not m:
                if "attn_mask" not in name and "logit_scale" not in name:
                    unmatched.append(name)
                continue
            base, rest = f"resblocks_{m.group(1)}", m.group(2)
            if rest == "attn.in_proj_weight":
                flat[f"{base}/in_proj/kernel"] = _t_linear(v)
            elif rest == "attn.in_proj_bias":
                flat[f"{base}/in_proj/bias"] = v
            elif rest == "attn.out_proj.weight":
                flat[f"{base}/out_proj/kernel"] = _t_linear(v)
            elif rest == "attn.out_proj.bias":
                flat[f"{base}/out_proj/bias"] = v
            elif rest in ("ln_1.weight", "ln_1.bias", "ln_2.weight", "ln_2.bias"):
                ln, kind = rest.split(".")
                flat[f"{base}/{ln}/{'scale' if kind == 'weight' else 'bias'}"] = v
            elif rest == "mlp.c_fc.weight":
                flat[f"{base}/mlp_fc/kernel"] = _t_linear(v)
            elif rest == "mlp.c_fc.bias":
                flat[f"{base}/mlp_fc/bias"] = v
            elif rest == "mlp.c_proj.weight":
                flat[f"{base}/mlp_proj/kernel"] = _t_linear(v)
            elif rest == "mlp.c_proj.bias":
                flat[f"{base}/mlp_proj/bias"] = v
            else:
                unmatched.append(name)
    if unmatched:
        logger.warning(f"convert_language: unmatched keys: {unmatched[:10]}")
    return flat


def interpolate_patch_embed(kernel_hwio: np.ndarray, new_hw) -> np.ndarray:
    """Bicubic-resize a (kh, kw, in, out) patch kernel (torch-exact bicubic,
    reference tools/eva_interpolate_patch_14to16.py:83-88)."""
    from ape_tpu.modeling.backbone.vit_utils import bicubic_resize_matrix

    kh, kw, cin, cout = kernel_hwio.shape
    mh = bicubic_resize_matrix(kh, new_hw[0]).astype(np.float64)
    mw = bicubic_resize_matrix(kw, new_hw[1]).astype(np.float64)
    out = np.einsum("Hh,hwio->Hwio", mh, kernel_hwio.astype(np.float64))
    out = np.einsum("Ww,Hwio->HWio", mw, out)
    return out.astype(kernel_hwio.dtype)


def interpolate_pos_embed_np(pos: np.ndarray, new_len: int, num_extra: int = 1) -> np.ndarray:
    """Bicubic-resize a (1, N+extra, C) abs pos embed to (1, new_len, C)
    (reference tools/eva_interpolate_patch_14to16.py:18-50)."""
    from ape_tpu.modeling.backbone.vit_utils import bicubic_resize_matrix

    squeeze = pos.ndim == 2
    if squeeze:
        pos = pos[None]
    extra = pos[:, :num_extra]
    grid = pos[:, num_extra:]
    n = grid.shape[1]
    size = int(round(n**0.5))
    new_n = new_len - num_extra
    new_size = int(round(new_n**0.5))
    assert size * size == n and new_size * new_size == new_n, (n, new_n)
    g = grid.reshape(size, size, -1).astype(np.float64)
    m = bicubic_resize_matrix(size, new_size).astype(np.float64)
    g = np.einsum("Hh,hwc->Hwc", m, g)
    g = np.einsum("Ww,Hwc->HWc", m, g)
    out = np.concatenate([extra.astype(np.float64), g.reshape(1, new_n, -1)], axis=1)
    out = out.astype(pos.dtype)
    return out[0] if squeeze else out


def adapt_shapes(flat_src: Dict[str, Any], flat_dst: Dict[str, Any]) -> Dict[str, Any]:
    """Auto-apply patch-14->16 and pos-embed grid surgery where shapes differ
    (the offline tools/eva_interpolate_patch_14to16.py step, folded in)."""
    out = dict(flat_src)
    for k, v in list(out.items()):
        if k not in flat_dst:
            continue
        dst_shape = tuple(np.asarray(flat_dst[k]).shape)
        if tuple(v.shape) == dst_shape:
            continue
        if k.endswith("patch_embed/kernel") and v.ndim == 4 and v.shape[2:] == dst_shape[2:]:
            out[k] = interpolate_patch_embed(v, dst_shape[:2])
            logger.info(f"adapt: {k} {v.shape} -> {dst_shape} (bicubic patch kernel)")
        elif "pos_embed" in k and v.ndim == dst_shape.__len__() and v.shape[-1] == dst_shape[-1]:
            out[k] = interpolate_pos_embed_np(v, dst_shape[-2])
            logger.info(f"adapt: {k} {v.shape} -> {dst_shape} (bicubic pos embed)")
    return out


def load_params_tolerant(path: str, params_template) -> Any:
    """Load a torch .pth/.pkl or orbax dir into the given param tree, keeping
    template values for missing keys and skipping shape mismatches (d2's
    tolerant-load semantics)."""
    import jax

    if path.endswith((".pth", ".pt", ".pkl")):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if "model" in sd:
            sd = sd["model"]
        sd = {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "shape")}
        flat_src = convert_torch_state_dict(sd)
    else:
        raise ValueError(f"unsupported checkpoint: {path}")

    flat_dst = flatten_tree(params_template)
    flat_src = adapt_shapes(flat_src, flat_dst)
    loaded, skipped = 0, []
    for k, v in flat_src.items():
        if k in flat_dst:
            if tuple(flat_dst[k].shape) == tuple(v.shape):
                flat_dst[k] = v.astype(np.asarray(flat_dst[k]).dtype)
                loaded += 1
            else:
                skipped.append((k, v.shape, tuple(flat_dst[k].shape)))
    logger.info(f"loaded {loaded}/{len(flat_dst)} params from {path}")
    if skipped:
        logger.warning(f"shape-skipped: {skipped[:10]}")
    return jax.tree.map(lambda x: x, unflatten_tree(flat_dst))
