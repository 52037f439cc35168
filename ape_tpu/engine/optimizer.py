"""Optimizer construction: AdamW with layerwise LR decay and per-parameter
multipliers.

Capability match: the reference optimizer recipe (COCO 12ep config:32-48 +
get_vit_lr_decay_rate, ape/modeling/backbone/vit.py:8-33): AdamW lr 2e-4,
wd 0.05, layerwise decay 0.8 over ViT blocks (pos/patch embed = layer 0), 0.1x
lr for reference_points/sampling_offsets, grad clip 0.1, MultiStep schedule.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence

import jax
import optax


def vit_layer_id(path: str, num_layers: int) -> int:
    """Layer id for lr decay: patch/pos embed -> 0, blocks.i -> i+1, rest -> L+1."""
    if "backbone" in path:
        if "pos_embed" in path or "patch_embed" in path:
            return 0
        m = re.search(r"blocks_(\d+)", path)
        if m:
            return int(m.group(1)) + 1
    return num_layers + 1


def lr_multiplier_tree(
    params, num_layers: int = 12, decay: float = 0.8, backbone_lr_mult: float = 1.0
):
    """Per-leaf lr multiplier: decay^(L+1-layer_id), x0.1 for sampling offsets /
    reference points (reference config base_lr_multipliers). backbone_lr_mult
    is the r50 family's flat 0.1x backbone factor (reference r50 12ep config
    lr_factor_func: 0.1 if "backbone" in module_name) — ViT configs use the
    layerwise decay instead and leave it at 1."""

    def mult(path_tuple, _):
        path = "/".join(str(getattr(p, "key", p)) for p in path_tuple)
        m = decay ** (num_layers + 1 - vit_layer_id(path, num_layers))
        if "sampling_offsets" in path or "reference_points" in path:
            m *= 0.1
        if path.startswith("backbone"):
            m *= backbone_lr_mult
        return m

    return jax.tree_util.tree_map_with_path(mult, params)


def multistep_schedule(base_lr: float, milestones: Sequence[int], gamma: float = 0.1):
    """detectron2 WarmupMultiStepLR (without warmup by default)."""
    boundaries = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_lr_schedule(
    base_lr: float = 2e-4,
    milestones: Sequence[int] = (),
    warmup_steps: int = 0,
):
    """The LR schedule alone (for logging next to the optimizer that uses it)."""
    sched = (
        multistep_schedule(base_lr, milestones) if milestones else lambda _: base_lr
    )
    if warmup_steps:
        warm = optax.linear_schedule(base_lr * 1e-3, base_lr, warmup_steps)
        base = sched
        sched = lambda step: jax.numpy.where(
            step < warmup_steps, warm(step), base(step - warmup_steps)
        )
    return sched


def build_optimizer(
    params,
    base_lr: float = 2e-4,
    weight_decay: float = 0.05,
    grad_clip: float = 0.1,
    vit_num_layers: int = 12,
    layer_decay: float = 0.8,
    milestones: Sequence[int] = (),
    warmup_steps: int = 0,
    frozen_regex: Optional[str] = None,  # e.g. frozen language tower
    backbone_lr_mult: float = 1.0,  # r50 family: flat 0.1x backbone lr
) -> optax.GradientTransformation:
    sched = make_lr_schedule(base_lr, milestones, warmup_steps)

    mults = lr_multiplier_tree(params, vit_num_layers, layer_decay, backbone_lr_mult)

    def no_decay_mask(p):
        def f(path_tuple, leaf):
            path = "/".join(str(getattr(x, "key", x)) for x in path_tuple)
            is_norm_or_bias = (
                leaf.ndim <= 1
                or "bias" in path
                or "scale" in path
                or "pos_embed" in path
                or "level_embeds" in path
            )
            return not is_norm_or_bias

        return jax.tree_util.tree_map_with_path(f, p)

    def scale_by_tree(multipliers):
        def init(params):
            del params
            return optax.EmptyState()

        def update(updates, state, params=None):
            del params
            return jax.tree.map(lambda u, m: u * m, updates, multipliers), state

        return optax.GradientTransformation(init, update)

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(b1=0.9, b2=0.999),
        optax.add_decayed_weights(weight_decay, mask=no_decay_mask),
        scale_by_tree(mults),
        optax.scale_by_learning_rate(sched),
    )
    if frozen_regex:
        def trainable(path_tuple, _):
            path = "/".join(str(getattr(x, "key", x)) for x in path_tuple)
            return "trainable" if not re.search(frozen_regex, path) else "frozen"

        labels = jax.tree_util.tree_map_with_path(trainable, params)
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, param_labels=labels
        )
    return tx
