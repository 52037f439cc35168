"""Minimal detectron2/fvcore/timm stubs so reference torch modules can be
loaded as *test oracles* (executed, never copied). Only what the EVA ViT
backbone touches: d2's Conv2d-with-norm, channels-first LayerNorm ("LN" norm),
CNNBlockBase, Backbone, the FPN stride assert, weight-init no-ops, DropPath."""

import importlib.util
import sys
import types


def install_reference_stubs():
    import torch
    import torch.nn as nn

    if "detectron2" in sys.modules:
        return

    class Conv2d(nn.Conv2d):
        def __init__(self, *args, **kwargs):
            norm = kwargs.pop("norm", None)
            activation = kwargs.pop("activation", None)
            super().__init__(*args, **kwargs)
            self.norm = norm
            self.activation = activation

        def forward(self, x):
            x = super().forward(x)
            if self.norm is not None:
                x = self.norm(x)
            if self.activation is not None:
                x = self.activation(x)
            return x

    class LayerNormCF(nn.Module):
        """detectron2's channels-first LayerNorm (layers/batch_norm.py semantics)."""

        def __init__(self, normalized_shape, eps=1e-6):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(normalized_shape))
            self.bias = nn.Parameter(torch.zeros(normalized_shape))
            self.eps = eps

        def forward(self, x):
            u = x.mean(1, keepdim=True)
            s = (x - u).pow(2).mean(1, keepdim=True)
            x = (x - u) / torch.sqrt(s + self.eps)
            return self.weight[:, None, None] * x + self.bias[:, None, None]

    def get_norm(norm, out_channels):
        if norm is None or norm == "":
            return None
        if norm == "LN":
            return LayerNormCF(out_channels)
        if norm == "GN":
            return nn.GroupNorm(32, out_channels)
        raise NotImplementedError(norm)

    class CNNBlockBase(nn.Module):
        def __init__(self, in_channels, out_channels, stride):
            super().__init__()
            self.in_channels = in_channels
            self.out_channels = out_channels
            self.stride = stride

    class ShapeSpec:
        def __init__(self, **kw):
            kw.setdefault("channels", None)
            kw.setdefault("stride", None)
            self.__dict__.update(kw)

    class Backbone(nn.Module):
        """d2 Backbone API surface used by the ViT/SFP reference code."""

        @property
        def size_divisibility(self):
            return getattr(self, "_size_divisibility", 0)

        @property
        def padding_constraints(self):
            return {}

        def output_shape(self):
            return {
                name: ShapeSpec(
                    channels=self._out_feature_channels[name],
                    stride=self._out_feature_strides[name],
                )
                for name in self._out_features
            }

    d2 = types.ModuleType("detectron2")
    layers = types.ModuleType("detectron2.layers")
    layers.Conv2d = Conv2d
    layers.get_norm = get_norm
    layers.CNNBlockBase = CNNBlockBase
    layers.ShapeSpec = ShapeSpec
    modeling = types.ModuleType("detectron2.modeling")
    backbone_mod = types.ModuleType("detectron2.modeling.backbone")
    backbone_mod.Backbone = Backbone
    fpn = types.ModuleType("detectron2.modeling.backbone.fpn")

    def _assert_strides_are_log2_contiguous(strides):
        for i, s in enumerate(strides[1:], 1):
            assert s == 2 * strides[i - 1], strides

    fpn._assert_strides_are_log2_contiguous = _assert_strides_are_log2_contiguous
    backbone_mod.fpn = fpn
    modeling.backbone = backbone_mod
    d2.layers = layers
    d2.modeling = modeling
    sys.modules["detectron2"] = d2
    sys.modules["detectron2.layers"] = layers
    sys.modules["detectron2.modeling"] = modeling
    sys.modules["detectron2.modeling.backbone"] = backbone_mod
    sys.modules["detectron2.modeling.backbone.fpn"] = fpn

    fvcore = types.ModuleType("fvcore")
    fnn = types.ModuleType("fvcore.nn")
    wi = types.ModuleType("fvcore.nn.weight_init")
    wi.c2_xavier_fill = lambda m: None
    wi.c2_msra_fill = lambda m: None
    fnn.weight_init = wi
    fvcore.nn = fnn
    sys.modules["fvcore"] = fvcore
    sys.modules["fvcore.nn"] = fnn
    sys.modules["fvcore.nn.weight_init"] = wi

    if "fairscale" not in sys.modules:
        fs = types.ModuleType("fairscale")
        fsn = types.ModuleType("fairscale.nn")
        fsc = types.ModuleType("fairscale.nn.checkpoint")
        fsc.checkpoint_wrapper = lambda m, **k: m
        fsn.checkpoint = fsc
        fs.nn = fsn
        sys.modules["fairscale"] = fs
        sys.modules["fairscale.nn"] = fsn
        sys.modules["fairscale.nn.checkpoint"] = fsc

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tml = types.ModuleType("timm.models.layers")

        class DropPath(nn.Module):  # identity at drop_prob=0 / eval
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                return x

        class Mlp(nn.Module):
            """timm Mlp semantics: fc1 -> act -> fc2 (drop=0 in eval oracles)."""

            def __init__(self, in_features, hidden_features=None, out_features=None,
                         act_layer=nn.GELU, drop=0.0):
                super().__init__()
                out_features = out_features or in_features
                hidden_features = hidden_features or in_features
                self.fc1 = nn.Linear(in_features, hidden_features)
                self.act = act_layer()
                self.fc2 = nn.Linear(hidden_features, out_features)
                self.drop = nn.Dropout(drop)

            def forward(self, x):
                return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

        tml.DropPath = DropPath
        tml.Mlp = Mlp
        tml.trunc_normal_ = lambda *a, **k: None
        tm = types.ModuleType("timm.models")
        tm.layers = tml
        timm.models = tm
        timm.layers = tml
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tm
        sys.modules["timm.models.layers"] = tml
        sys.modules["timm.layers"] = tml


def load_reference_module(relpath: str, name: str):
    """Load /root/reference/ape/modeling/... as an importable module with the
    package context its relative imports need."""
    install_reference_stubs()
    base = "/root/reference/ape/modeling/backbone"
    pkg = sys.modules.get("refbackbone")
    if pkg is None:
        pkg = types.ModuleType("refbackbone")
        pkg.__path__ = [base]
        sys.modules["refbackbone"] = pkg
    full = f"refbackbone.{name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, f"{base}/{relpath}", submodule_search_locations=[base]
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod
