"""Model zoo lookup (capability match: /root/reference/ape/model_zoo/model_zoo.py)."""

import os

import pytest

from ape_tpu import model_zoo


@pytest.mark.parametrize("name", sorted(model_zoo.MODELS))
def test_config_file_resolves(name):
    p = model_zoo.get_config_file(name)
    assert os.path.exists(p) and p.endswith(".py")
    # the raw config-relative path resolves to the same file
    assert model_zoo.get_config_file(model_zoo.MODELS[name][0]) == p


@pytest.mark.parametrize("name", sorted(model_zoo.MODELS))
def test_checkpoint_url(name):
    url = model_zoo.get_checkpoint_url(name)
    assert url.startswith("https://huggingface.co/shenyunhang/APE/")
    assert url.endswith("model_final.pth")


def test_unknown_name_raises():
    with pytest.raises(RuntimeError):
        model_zoo.get_config_file("APE-XXL")
    with pytest.raises(RuntimeError):
        model_zoo.get_checkpoint_url("not-a-model")


def test_get_config_trained_points_at_checkpoint(tmp_path, monkeypatch):
    # with a local mirror present, trained=True prefers the local file
    ckpt_rel = model_zoo.MODELS["APE-Ti"][1]
    local = tmp_path / ckpt_rel
    local.parent.mkdir(parents=True)
    local.write_bytes(b"")
    monkeypatch.setenv("APE_CHECKPOINT_DIR", str(tmp_path))
    cfg = model_zoo.get_config("APE-Ti", trained=True)
    assert cfg.train["init_checkpoint"] == str(local)

    # without a mirror (and no huggingface_hub in this env) it falls back to the URL
    monkeypatch.delenv("APE_CHECKPOINT_DIR")
    cfg = model_zoo.get_config("APE-Ti", trained=True)
    assert cfg.train["init_checkpoint"].startswith("https://")
