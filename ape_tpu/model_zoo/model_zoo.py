"""Model zoo: released-APE checkpoint lookup + one-call model construction.

Capability match: /root/reference/ape/model_zoo/model_zoo.py (config-path ->
checkpoint-URL table + ``get_config_file``/``get_checkpoint_url``/``get_config``
/``get``; the reference table is the detectron2 zoo, and APE's own released
checkpoints are resolved ad hoc by the demo,
/root/reference/demo/app.py:528-545 + README.md:282-331).  This rebuild keys
the zoo on APE's OWN five released models (HF repo ``shenyunhang/APE``) and
resolves them against this repo's config tree; ``get`` builds the flax model
and, when the torch checkpoint is available locally (or downloadable via a
locally-installed ``huggingface_hub``), loads it through the production
torch->flax converter (``checkpoint/convert.load_params_tolerant``).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

logger = logging.getLogger(__name__)

HF_REPO_ID = "shenyunhang/APE"

# name -> (repo-relative config path, HF-repo-relative checkpoint file).
# Checkpoint filenames per /root/reference/README.md:296-331.
MODELS = {
    "APE-L_A": (
        "LVISCOCOCOCOSTUFF_O365_OID_VG/ape_deta/"
        "ape_deta_vitl_eva02_clip_vlf_lsj1024_cp_720k_mdl.py",
        "configs/LVISCOCOCOCOSTUFF_O365_OID_VG/ape_deta/"
        "ape_deta_vitl_eva02_lsj_cp_720k_20230504_002019/model_final.pth",
    ),
    "APE-L_B": (
        "LVISCOCOCOCOSTUFF_O365_OID_VGR_REFCOCO/ape_deta/"
        "ape_deta_vitl_eva02_clip_vlf_lsj1024_cp_720k_mdl.py",
        "configs/LVISCOCOCOCOSTUFF_O365_OID_VGR_REFCOCO/ape_deta/"
        "ape_deta_vitl_eva02_vlf_lsj_cp_1080k_20230702_225418/model_final.pth",
    ),
    "APE-L_C": (
        "LVISCOCOCOCOSTUFF_O365_OID_VGR_SA1B_REFCOCO/ape_deta/"
        "ape_deta_vitl_eva02_clip_vlf_lsj1024_cp_1080k_mdl.py",
        "configs/LVISCOCOCOCOSTUFF_O365_OID_VGR_SA1B_REFCOCO/ape_deta/"
        "ape_deta_vitl_eva02_vlf_lsj_cp_1080k_20230702_210950/model_final.pth",
    ),
    "APE-L_D": (
        "LVISCOCOCOCOSTUFF_O365_OID_VGR_SA1B_REFCOCO_GQA_PhraseCut_Flickr30k/"
        "ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024_cp_16x4_1080k_mdl.py",
        "configs/LVISCOCOCOCOSTUFF_O365_OID_VGR_SA1B_REFCOCO_GQA_PhraseCut_Flickr30k/"
        "ape_deta/ape_deta_vitl_eva02_clip_vlf_lsj1024_cp_16x4_1080k_mdl_20230829_162438/"
        "model_final.pth",
    ),
    "APE-Ti": (
        "LVISCOCOCOCOSTUFF_O365_OID_VGR_SA1B_REFCOCO_GQA_PhraseCut_Flickr30k/"
        "ape_deta/ape_deta_vitt_eva02_vlf_lsj1024_cp_16x4_1080k_mdl.py",
        "configs/LVISCOCOCOCOSTUFF_O365_OID_VGR_SA1B_REFCOCO_GQA_PhraseCut_Flickr30k/"
        "ape_deta/ape_deta_vitt_eva02_vlf_lsj1024_cp_16x4_1080k_mdl_20240203_230000/"
        "model_final.pth",
    ),
}

_CONFIGS_ROOT = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "configs")
)


def _resolve_name(name_or_path: str) -> str:
    """Accept a zoo name ('APE-L_D') or a config-relative path and return the
    config-relative path."""
    if name_or_path in MODELS:
        return MODELS[name_or_path][0]
    return name_or_path


def get_config_file(config_path: str) -> str:
    """Return the on-disk path of a builtin config.

    ``config_path`` is a zoo name (``"APE-L_D"``) or a path relative to this
    repo's ``configs/`` directory (reference semantics:
    /root/reference/ape/model_zoo/model_zoo.py:129-145).
    """
    rel = _resolve_name(config_path)
    cfg_file = os.path.join(_CONFIGS_ROOT, rel)
    if not os.path.exists(cfg_file):
        raise RuntimeError(f"{config_path} not available in Model Zoo!")
    return cfg_file


def get_checkpoint_url(config_path: str) -> str:
    """Return the HF download URL for a released model (by zoo name or its
    config path)."""
    rel = _resolve_name(config_path)
    for name, (cfg, ckpt) in MODELS.items():
        if config_path == name or rel == cfg:
            return f"https://huggingface.co/{HF_REPO_ID}/resolve/main/{ckpt}"
    raise RuntimeError(f"Pretrained model for {config_path} is not available!")


def _local_checkpoint(config_path: str) -> Optional[str]:
    """Resolve the checkpoint to a local file: $APE_CHECKPOINT_DIR mirror of the
    HF layout first, then a huggingface_hub download if the package exists."""
    rel = _resolve_name(config_path)
    ckpt_rel = None
    for name, (cfg, ckpt) in MODELS.items():
        if config_path == name or rel == cfg:
            ckpt_rel = ckpt
            break
    if ckpt_rel is None:
        return None
    root = os.environ.get("APE_CHECKPOINT_DIR", "")
    if root:
        p = os.path.join(root, ckpt_rel)
        if os.path.exists(p):
            return p
    try:
        from huggingface_hub import hf_hub_download  # optional dependency

        try:  # already-downloaded cache first (skips network retries offline)
            return hf_hub_download(
                repo_id=HF_REPO_ID, filename=ckpt_rel, local_files_only=True
            )
        except Exception:
            return hf_hub_download(repo_id=HF_REPO_ID, filename=ckpt_rel)
    except Exception as e:  # no hub / no network: caller decides how to proceed
        logger.info(f"checkpoint for {config_path} not resolvable locally: {e}")
        return None


def get_config(config_path: str, trained: bool = False):
    """Load a zoo config; with ``trained=True`` point ``train.init_checkpoint``
    at the released checkpoint (local mirror when present, else the HF URL —
    reference semantics: model_zoo.py:148-178)."""
    from ape_tpu.config import LazyConfig

    cfg = LazyConfig.load(get_config_file(config_path))
    if trained:
        local = _local_checkpoint(config_path)
        cfg.train["init_checkpoint"] = local or get_checkpoint_url(config_path)
    return cfg


def get(config_path: str, trained: bool = False, rng: Any = None):
    """Build the flax model for a zoo entry and return ``(model, params)``.

    With ``trained=True`` the released torch checkpoint is converted and loaded
    through ``load_params_tolerant`` when it can be resolved to a local file;
    otherwise params stay at random init with a warning (this environment has
    no network egress — reference equivalent: model_zoo.py:181-214).
    """
    import jax
    import jax.numpy as jnp

    from ape_tpu.config import instantiate

    cfg = get_config(config_path, trained=False)
    model = instantiate(cfg.model)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    size = int(cfg.train.get("image_size", 1024))
    num_text = int(cfg.train.get("num_text", 256))
    text_dim = int(cfg.train.get("text_dim", 1024))
    # jit the init: eager init traces op-by-op through the device transport
    params = jax.jit(model.init)(
        rng,
        jnp.zeros((1, size, size, 3), jnp.float32),
        jnp.asarray([[size, size]], jnp.int32),
        jnp.zeros((1, num_text, text_dim), jnp.float32),
        jnp.ones((1, num_text), bool),
    )["params"]
    if trained:
        local = _local_checkpoint(config_path)
        if local is not None:
            from ape_tpu.checkpoint.convert import load_params_tolerant

            params = load_params_tolerant(local, params)
        else:
            logger.warning(
                f"trained=True but checkpoint for {config_path} is not available "
                "locally (no APE_CHECKPOINT_DIR mirror, no huggingface_hub); "
                "returning random-init params"
            )
    return model, params
