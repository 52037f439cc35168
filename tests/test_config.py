"""Lazy config system tests: L/instantiate, interpolation, overrides, file load."""

import os
import textwrap

from ape_tpu.config import L, LazyConfig, ConfigDict, instantiate


class Leaf:
    def __init__(self, x=0, name=""):
        self.x = x
        self.name = name


class Node:
    def __init__(self, child, scale=1.0, tags=()):
        self.child = child
        self.scale = scale
        self.tags = tags


def test_instantiate_nested():
    cfg = L(Node)(child=L(Leaf)(x=3, name="a"), scale=2.0, tags=[L(Leaf)(x=1)])
    obj = instantiate(cfg)
    assert isinstance(obj, Node) and isinstance(obj.child, Leaf)
    assert obj.child.x == 3 and obj.scale == 2.0
    assert isinstance(obj.tags[0], Leaf) and obj.tags[0].x == 1


def test_interpolation_relative_and_absolute():
    cfg = ConfigDict(
        dim=256,
        model=L(Node)(
            child=L(Leaf)(x="${dim}", name="leaf"),
            scale="${.child.x}",
        ),
    )
    obj = instantiate(cfg.model, _root=None) if False else instantiate(cfg)["model"]
    assert obj.child.x == 256
    assert obj.scale == 256


def test_apply_overrides():
    cfg = ConfigDict(model=L(Node)(child=L(Leaf)(x=1), scale=1.0), train=ConfigDict(iters=10))
    LazyConfig.apply_overrides(
        cfg, ["model.child.x=42", "train.iters=99", "train.name=hello", "model.scale=0.5"]
    )
    assert cfg.model.child.x == 42
    assert cfg.train.iters == 99
    assert cfg.train.name == "hello"
    obj = instantiate(cfg.model)
    assert obj.child.x == 42 and obj.scale == 0.5


def test_load_config_file(tmp_path):
    p = tmp_path / "cfg_a.py"
    p.write_text(
        textwrap.dedent(
            """
            from ape_tpu.config import L
            from tests.test_config import Leaf, Node

            dim = 8
            model = L(Node)(child=L(Leaf)(x="${dim}"), scale=3.0)
            train = dict(max_iter=100)
            """
        )
    )
    cfg = LazyConfig.load(str(p))
    assert cfg.train.max_iter == 100
    obj = instantiate(cfg)["model"]
    assert obj.child.x == 8


def test_config_inheritance(tmp_path):
    base = tmp_path / "base.py"
    base.write_text(
        "from ape_tpu.config import L\n"
        "from tests.test_config import Leaf\n"
        "model = L(Leaf)(x=5, name='base')\n"
        "train = dict(lr=0.1)\n"
    )
    child = tmp_path / "child.py"
    child.write_text(
        "from ape_tpu.config import LazyConfig\n"
        f"_base = LazyConfig.load({str(base)!r})\n"
        "model = _base.model\n"
        "train = _base.train\n"
        "model.x = 7\n"
    )
    cfg = LazyConfig.load(str(child))
    assert instantiate(cfg.model).x == 7
    assert cfg.train.lr == 0.1
