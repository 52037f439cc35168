"""Lazy configuration system.

Plain-Python lazy config trees, mirroring the public behavior of detectron2's
LazyConfig/L/instantiate (the reference's entire `configs/` surface is built on it —
/root/reference/tools/train_net.py:611-612, configs/**/*.py), but implemented from
scratch on plain dicts so there is no OmegaConf/detectron2 dependency.

Usage (identical ergonomics to the reference):

    from ape_tpu.config import LazyCall as L, instantiate
    cfg.model = L(MyModel)(depth=12, width="${..embed_dim}")
    model = instantiate(cfg.model)

* ``LazyCall``/``L`` wraps a callable into a :class:`LazyNode` dict holding
  ``_target_`` plus kwargs.
* ``instantiate`` recursively builds the object tree.
* ``LazyConfig.load`` executes a config .py file and collects its module-level
  names into a :class:`ConfigDict`.
* ``LazyConfig.apply_overrides`` applies ``a.b.c=value`` dotted CLI overrides
  (values parsed as Python literals when possible).
* ``"${path}"`` string interpolation resolves relative (``${..sibling}``) and
  absolute (``${model.embed_dim}``) references at instantiate time.
"""

from __future__ import annotations

import ast
import importlib.util
import os
import sys
import uuid
from collections import abc
from typing import Any, Callable


class ConfigDict(dict):
    """A dict with attribute access, used for every mapping node in a config tree."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def clone(self) -> "ConfigDict":
        return _deep_copy(self)


class LazyNode(ConfigDict):
    """A deferred call: ``_target_`` plus keyword arguments."""


def _deep_copy(node: Any) -> Any:
    if isinstance(node, LazyNode):
        return LazyNode({k: _deep_copy(v) for k, v in node.items()})
    if isinstance(node, ConfigDict):
        return ConfigDict({k: _deep_copy(v) for k, v in node.items()})
    if isinstance(node, dict):
        return ConfigDict({k: _deep_copy(v) for k, v in node.items()})
    if isinstance(node, (list, tuple)):
        t = type(node)
        return t(_deep_copy(v) for v in node)
    return node


class LazyCall:
    """``L(Class)(a=1, b=2)`` produces a LazyNode recording the deferred call."""

    def __init__(self, target: Callable):
        if not (callable(target) or isinstance(target, str)):
            raise TypeError(f"LazyCall target must be callable or str, got {target!r}")
        self._target = target

    def __call__(self, **kwargs: Any) -> LazyNode:
        node = LazyNode({k: _wrap(v) for k, v in kwargs.items()})
        node["_target_"] = self._target
        return node


L = LazyCall


def _wrap(value: Any) -> Any:
    """Convert plain dicts to ConfigDict recursively so attribute access works."""
    if isinstance(value, (LazyNode, ConfigDict)):
        return value
    if isinstance(value, dict):
        return ConfigDict({k: _wrap(v) for k, v in value.items()})
    if isinstance(value, list):
        return [_wrap(v) for v in value]
    if isinstance(value, tuple):
        return tuple(_wrap(v) for v in value)
    return value


def _locate(name: str) -> Any:
    """Import a dotted name ``pkg.mod.Class``."""
    parts = name.split(".")
    for i in range(len(parts), 0, -1):
        try:
            mod = importlib.import_module(".".join(parts[:i]))
        except ImportError:
            continue
        obj = mod
        try:
            for p in parts[i:]:
                obj = getattr(obj, p)
        except AttributeError:
            continue
        return obj
    raise ImportError(f"Cannot locate {name!r}")


def _resolve_interp(path: str, node_stack: list) -> Any:
    """Resolve an interpolation path against the config tree.

    ``${..name}`` walks up one level per extra leading dot (one dot = current node).
    ``${a.b.c}`` resolves from the root.
    """
    root = node_stack[0]
    if path.startswith("."):
        # count leading dots: ".x" = sibling in current node, "..x" = parent's, etc.
        n = len(path) - len(path.lstrip("."))
        rest = path[n:]
        # node_stack[-1] is the node holding the interpolated value; `.x` refers to it
        base = node_stack[-n] if n <= len(node_stack) else root
    else:
        rest = path
        base = root
    cur = base
    for part in rest.split("."):
        if part == "":
            continue
        if isinstance(cur, (list, tuple)):
            cur = cur[int(part)]
        else:
            cur = cur[part]
    return cur


def _contains_interp(value: Any) -> bool:
    return isinstance(value, str) and value.startswith("${") and value.endswith("}")


def resolve_interpolations(cfg: Any) -> Any:
    """Resolve all ``${...}`` string references in-place (returns the tree)."""

    def walk(node: Any, stack: list) -> Any:
        if isinstance(node, dict):
            for k, v in list(node.items()):
                node[k] = walk(v, stack + [node])
            return node
        if isinstance(node, list):
            for i, v in enumerate(node):
                node[i] = walk(v, stack + [node])
            return node
        if isinstance(node, tuple):
            return tuple(walk(v, stack + [list(node)]) for v in node)
        if _contains_interp(node):
            resolved = _resolve_interp(node[2:-1], stack)
            # resolved value may itself be an interpolation
            if _contains_interp(resolved):
                resolved = walk(resolved, stack)
            return resolved
        return node

    return walk(cfg, [cfg])


def instantiate(cfg: Any, _root: Any = None, _stack: list = None) -> Any:
    """Recursively build objects from a lazy config tree.

    LazyNodes become ``target(**kwargs)``; ConfigDicts/lists recurse; everything
    else passes through. Interpolations are resolved against the outermost tree
    passed to the first ``instantiate`` call.
    """
    if _root is None:
        cfg = _deep_copy(cfg)
        resolve_interpolations(cfg)
        _root = cfg
    if isinstance(cfg, LazyNode):
        target = cfg["_target_"]
        if isinstance(target, str):
            target = _locate(target)
        kwargs = {
            k: instantiate(v, _root) for k, v in cfg.items() if k != "_target_"
        }
        return target(**kwargs)
    if isinstance(cfg, dict):
        return {k: instantiate(v, _root) for k, v in cfg.items()}
    if isinstance(cfg, list):
        return [instantiate(v, _root) for v in cfg]
    if isinstance(cfg, tuple):
        return tuple(instantiate(v, _root) for v in cfg)
    return cfg


class LazyConfig:
    """Load/override/save plain-Python config files (reference: d2 LazyConfig)."""

    @staticmethod
    def load(path: str) -> ConfigDict:
        path = os.path.abspath(path)
        if not path.endswith(".py"):
            raise ValueError(f"Config file must be .py, got {path}")
        module_name = "ape_tpu._cfg_" + uuid.uuid4().hex[:8]
        spec = importlib.util.spec_from_file_location(module_name, path)
        module = importlib.util.module_from_spec(spec)
        sys.modules[module_name] = module
        try:
            spec.loader.exec_module(module)
        finally:
            sys.modules.pop(module_name, None)
        cfg = ConfigDict()
        for name in dir(module):
            if name.startswith("_"):
                continue
            value = getattr(module, name)
            if isinstance(value, (dict, list, tuple, int, float, str, bool, type(None))):
                cfg[name] = _wrap(value)
        return cfg

    @staticmethod
    def load_rel(path: str, caller_file: str = None) -> ConfigDict:
        """Load a config relative to the calling config file (for inheritance)."""
        if caller_file is None:
            import inspect

            caller_file = inspect.stack()[1].filename
        base = os.path.dirname(os.path.abspath(caller_file))
        return LazyConfig.load(os.path.join(base, path))

    @staticmethod
    def apply_overrides(cfg: ConfigDict, overrides: list) -> ConfigDict:
        """Apply ``a.b.c=value`` strings; values parsed with ast.literal_eval."""
        for ov in overrides:
            if "=" not in ov:
                raise ValueError(f"Override must be key=value, got {ov!r}")
            key, value = ov.split("=", 1)
            try:
                value = ast.literal_eval(value)
            except (ValueError, SyntaxError):
                pass  # keep as string
            node = cfg
            parts = key.split(".")
            for p in parts[:-1]:
                if isinstance(node, (list, tuple)):
                    node = node[int(p)]
                elif p not in node:
                    node[p] = ConfigDict()
                    node = node[p]
                else:
                    node = node[p]
            last = parts[-1]
            if isinstance(node, (list, tuple)):
                node[int(last)] = value
            else:
                node[last] = value
        return cfg

    @staticmethod
    def save(cfg: ConfigDict, path: str) -> None:
        import pickle

        with open(path, "wb") as f:
            pickle.dump(cfg, f)

    @staticmethod
    def to_py(cfg: Any, prefix: str = "cfg.") -> str:
        """Render the tree as python-ish text for logging."""
        lines = []

        def rep(v: Any) -> str:
            if isinstance(v, LazyNode):
                t = v["_target_"]
                tn = t if isinstance(t, str) else f"{t.__module__}.{getattr(t, '__qualname__', t)}"
                inner = ", ".join(f"{k}={rep(x)}" for k, x in v.items() if k != "_target_")
                return f"L({tn})({inner})"
            if isinstance(v, dict):
                return "{" + ", ".join(f"{k!r}: {rep(x)}" for k, x in v.items()) + "}"
            if isinstance(v, (list, tuple)):
                inner = ", ".join(rep(x) for x in v)
                return f"[{inner}]" if isinstance(v, list) else f"({inner})"
            return repr(v)

        if isinstance(cfg, dict):
            for k, v in cfg.items():
                lines.append(f"{prefix}{k} = {rep(v)}")
        else:
            lines.append(f"{prefix[:-1]} = {rep(cfg)}")
        return "\n".join(lines)
