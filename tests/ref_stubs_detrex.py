"""detrex/detectron2/torchvision stubs sufficient to run the reference's full
task-model stack (DeformableDETRSegmVL + DeformableDetrTransformerVL) on CPU
with `pytorch_attn=True` as an end-to-end parity ORACLE.

The reference pins detrex@776058e and detectron2@017abbf (requirements.txt);
neither installs here, so the *generic glue* they provide is reimplemented
below with the documented upstream semantics (mmcv-style BaseTransformerLayer
operation_order execution, detrex FFN/MultiheadAttention residual wrappers,
d2 Boxes/Instances/ImageList containers). All APE-specific logic — the MSDA
module, transformer, heads, criterion — is the reference's own code, loaded
from /root/reference and executed, never copied.

State-dict naming matters: ape_tpu/checkpoint/convert.py was written against
the real detrex/d2 checkpoint names (attentions.{i}.attn.in_proj_weight,
ffns.0.layers.0.0.weight, norms.{i}.weight, neck.convs.{i}.{conv,gn}); the
stubs reproduce those names exactly so the converter is tested unmodified.
"""

import importlib.util
import math
import sys
import types

from tests.ref_stubs import install_reference_stubs


def _nms(boxes, scores, iou_threshold):
    """Greedy NMS (torchvision.ops.nms semantics)."""
    import torch

    if boxes.numel() == 0:
        return torch.zeros((0,), dtype=torch.int64)
    x1, y1, x2, y2 = boxes.unbind(1)
    areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    order = scores.argsort(descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0].item()
        keep.append(i)
        if order.numel() == 1:
            break
        rest = order[1:]
        xx1 = torch.maximum(x1[i], x1[rest])
        yy1 = torch.maximum(y1[i], y1[rest])
        xx2 = torch.minimum(x2[i], x2[rest])
        yy2 = torch.minimum(y2[i], y2[rest])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas[rest] - inter).clamp(min=1e-12)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.int64)


def _batched_nms(boxes, scores, idxs, iou_threshold):
    """torchvision.ops.boxes.batched_nms: per-class NMS via coordinate offset."""
    import torch

    if boxes.numel() == 0:
        return torch.zeros((0,), dtype=torch.int64)
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
    boxes_for_nms = boxes + offsets[:, None]
    return _nms(boxes_for_nms, scores, iou_threshold)


def install_detrex_stubs():
    """Install detrex/torchvision stubs + extend the d2 stub with structures,
    postprocessing and catalog. Idempotent."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    install_reference_stubs()
    if "detrex" in sys.modules:
        return

    # ---------------- torchvision ----------------
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.13.1"
    tv_ops = types.ModuleType("torchvision.ops")
    tv_boxes = types.ModuleType("torchvision.ops.boxes")
    tv_boxes.batched_nms = _batched_nms
    tv_boxes.nms = _nms
    tv_ops.boxes = tv_boxes
    tv_ops.nms = _nms
    tv_ops.batched_nms = _batched_nms
    tv_misc = types.ModuleType("torchvision.ops.misc")

    class _FrozenBatchNorm2d:  # imported (never used) by eva02_clip/utils.py
        pass

    tv_misc.FrozenBatchNorm2d = _FrozenBatchNorm2d
    tv_ops.misc = tv_misc
    tv.ops = tv_ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv_ops
    sys.modules["torchvision.ops.boxes"] = tv_boxes
    sys.modules["torchvision.ops.misc"] = tv_misc

    # ---------------- detrex.layers ----------------
    def inverse_sigmoid(x, eps=1e-3):
        x = x.clamp(min=0, max=1)
        x1 = x.clamp(min=eps)
        x2 = (1 - x).clamp(min=eps)
        return torch.log(x1 / x2)

    def box_cxcywh_to_xyxy(x):
        cx, cy, w, h = x.unbind(-1)
        return torch.stack(
            [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], dim=-1
        )

    def box_xyxy_to_cxcywh(x):
        x0, y0, x1, y1 = x.unbind(-1)
        return torch.stack(
            [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], dim=-1
        )

    def box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def box_iou(boxes1, boxes2):
        area1 = box_area(boxes1)
        area2 = box_area(boxes2)
        lt = torch.max(boxes1[:, None, :2], boxes2[:, :2])
        rb = torch.min(boxes1[:, None, 2:], boxes2[:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, :, 0] * wh[:, :, 1]
        union = area1[:, None] + area2 - inter
        return inter / union, union

    def generalized_box_iou(boxes1, boxes2):
        iou, union = box_iou(boxes1, boxes2)
        lt = torch.min(boxes1[:, None, :2], boxes2[:, :2])
        rb = torch.max(boxes1[:, None, 2:], boxes2[:, 2:])
        wh = (rb - lt).clamp(min=0)
        area = wh[:, :, 0] * wh[:, :, 1]
        return iou - (area - union) / area

    class MLP(nn.Module):
        """detrex MLP: num_layers Linears with ReLU between."""

        def __init__(self, input_dim, hidden_dim, output_dim, num_layers):
            super().__init__()
            self.num_layers = num_layers
            h = [hidden_dim] * (num_layers - 1)
            self.layers = nn.ModuleList(
                nn.Linear(n, k) for n, k in zip([input_dim] + h, h + [output_dim])
            )

        def forward(self, x):
            for i, layer in enumerate(self.layers):
                x = F.relu(layer(x)) if i < self.num_layers - 1 else layer(x)
            return x

    class FFN(nn.Module):
        """detrex FFN: Sequential(Sequential(Linear, act, Drop) x (num_fcs-1),
        Linear, Drop) with residual add."""

        def __init__(self, embed_dim=256, feedforward_dim=1024, output_dim=None,
                     num_fcs=2, activation=None, ffn_drop=0.0, fc_bias=True,
                     add_identity=True):
            super().__init__()
            activation = activation if activation is not None else nn.ReLU(inplace=True)
            output_dim = embed_dim if output_dim is None else output_dim
            layers = []
            in_channels = embed_dim
            for _ in range(num_fcs - 1):
                layers.append(
                    nn.Sequential(
                        nn.Linear(in_channels, feedforward_dim, bias=fc_bias),
                        activation,
                        nn.Dropout(ffn_drop),
                    )
                )
                in_channels = feedforward_dim
            layers.append(nn.Linear(feedforward_dim, output_dim, bias=fc_bias))
            layers.append(nn.Dropout(ffn_drop))
            self.layers = nn.Sequential(*layers)
            self.add_identity = add_identity

        def forward(self, x, identity=None):
            out = self.layers(x)
            if not self.add_identity:
                return out
            if identity is None:
                identity = x
            return identity + out

    class MultiheadAttention(nn.Module):
        """detrex MultiheadAttention: nn.MultiheadAttention + residual identity
        + positional-embedding add on q/k."""

        def __init__(self, embed_dim, num_heads, attn_drop=0.0, proj_drop=0.0,
                     batch_first=False):
            super().__init__()
            self.embed_dim = embed_dim
            self.num_heads = num_heads
            self.batch_first = batch_first
            self.attn = nn.MultiheadAttention(
                embed_dim, num_heads, attn_drop, batch_first=batch_first
            )
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, query, key=None, value=None, identity=None,
                    query_pos=None, key_pos=None, attn_mask=None,
                    key_padding_mask=None, **kwargs):
            if key is None:
                key = query
            if value is None:
                value = key
            if identity is None:
                identity = query
            if key_pos is None and query_pos is not None:
                if query_pos.shape == key.shape:
                    key_pos = query_pos
            if query_pos is not None:
                query = query + query_pos
            if key_pos is not None:
                key = key + key_pos
            out = self.attn(query=query, key=key, value=value,
                            attn_mask=attn_mask,
                            key_padding_mask=key_padding_mask)[0]
            return identity + self.proj_drop(out)

    class BaseTransformerLayer(nn.Module):
        """mmcv/detrex operation_order executor. Submodule names match the real
        library (attentions / ffns / norms) for state-dict compatibility."""

        def __init__(self, attn=None, ffn=None, norm=None, operation_order=None):
            super().__init__()
            num_attn = operation_order.count("self_attn") + operation_order.count(
                "cross_attn"
            )
            if not isinstance(attn, (list, tuple)):
                attn = [attn] * num_attn
            assert len(attn) == num_attn
            self.attentions = nn.ModuleList(attn)
            self.ffns = nn.ModuleList([ffn])
            num_norms = operation_order.count("norm")
            import copy as _copy

            self.norms = nn.ModuleList(
                [_copy.deepcopy(norm) for _ in range(num_norms)]
            )
            self.operation_order = operation_order
            self.pre_norm = operation_order[0] == "norm"
            self.embed_dim = getattr(attn[0], "embed_dim", None)

        def forward(self, query, key=None, value=None, query_pos=None,
                    key_pos=None, attn_masks=None, query_key_padding_mask=None,
                    key_padding_mask=None, **kwargs):
            norm_index = attn_index = ffn_index = 0
            identity = query
            if attn_masks is None:
                attn_masks = [None] * len(self.attentions)
            elif not isinstance(attn_masks, (list, tuple)):
                attn_masks = [attn_masks] * len(self.attentions)
            for op in self.operation_order:
                if op == "self_attn":
                    temp_key = temp_value = query
                    query = self.attentions[attn_index](
                        query, temp_key, temp_value,
                        identity if self.pre_norm else None,
                        query_pos=query_pos, key_pos=query_pos,
                        attn_mask=attn_masks[attn_index],
                        key_padding_mask=query_key_padding_mask, **kwargs,
                    )
                    attn_index += 1
                    identity = query
                elif op == "norm":
                    query = self.norms[norm_index](query)
                    norm_index += 1
                elif op == "cross_attn":
                    query = self.attentions[attn_index](
                        query, key, value,
                        identity if self.pre_norm else None,
                        query_pos=query_pos, key_pos=key_pos,
                        attn_mask=attn_masks[attn_index],
                        key_padding_mask=key_padding_mask, **kwargs,
                    )
                    attn_index += 1
                    identity = query
                elif op == "ffn":
                    query = self.ffns[ffn_index](
                        query, identity if self.pre_norm else None
                    )
                    ffn_index += 1
                else:
                    raise ValueError(op)
            return query

    class TransformerLayerSequence(nn.Module):
        def __init__(self, transformer_layers=None, num_layers=None):
            super().__init__()
            import copy as _copy

            self.num_layers = num_layers
            self.layers = nn.ModuleList(
                [_copy.deepcopy(transformer_layers) for _ in range(num_layers)]
            )

    class PositionEmbeddingSine(nn.Module):
        """detrex sine position embedding over a padding mask."""

        def __init__(self, num_pos_feats=64, temperature=10000, scale=None,
                     normalize=False, offset=0.0, eps=1e-6):
            super().__init__()
            if scale is not None and normalize is False:
                raise ValueError("normalize should be True if scale is passed")
            if scale is None:
                scale = 2 * math.pi
            self.num_pos_feats = num_pos_feats
            self.temperature = temperature
            self.normalize = normalize
            self.scale = scale
            self.offset = offset
            self.eps = eps

        def forward(self, mask):
            not_mask = ~mask
            y_embed = not_mask.cumsum(1, dtype=torch.float32)
            x_embed = not_mask.cumsum(2, dtype=torch.float32)
            if self.normalize:
                y_embed = (y_embed + self.offset) / (
                    y_embed[:, -1:, :] + self.eps
                ) * self.scale
                x_embed = (x_embed + self.offset) / (
                    x_embed[:, :, -1:] + self.eps
                ) * self.scale
            dim_t = torch.arange(self.num_pos_feats, dtype=torch.float32)
            dim_t = self.temperature ** (
                2 * torch.div(dim_t, 2, rounding_mode="floor") / self.num_pos_feats
            )
            pos_x = x_embed[:, :, :, None] / dim_t
            pos_y = y_embed[:, :, :, None] / dim_t
            pos_x = torch.stack(
                (pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4
            ).flatten(3)
            pos_y = torch.stack(
                (pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4
            ).flatten(3)
            return torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)

    detrex = types.ModuleType("detrex")
    dlayers = types.ModuleType("detrex.layers")
    for name, obj in [
        ("MLP", MLP), ("FFN", FFN), ("BaseTransformerLayer", BaseTransformerLayer),
        ("MultiheadAttention", MultiheadAttention),
        ("TransformerLayerSequence", TransformerLayerSequence),
        ("PositionEmbeddingSine", PositionEmbeddingSine),
        ("box_cxcywh_to_xyxy", box_cxcywh_to_xyxy),
        ("box_xyxy_to_cxcywh", box_xyxy_to_cxcywh),
        ("box_iou", box_iou), ("generalized_box_iou", generalized_box_iou),
    ]:
        setattr(dlayers, name, obj)
    dutils = types.ModuleType("detrex.utils")
    dutils.inverse_sigmoid = inverse_sigmoid
    dutils.get_world_size = lambda: 1
    dutils.is_dist_avail_and_initialized = lambda: False

    # detrex ChannelMapper: convs.{i}.{conv,gn} naming (converter contract)
    class _ConvGN(nn.Module):
        def __init__(self, in_ch, out_ch, kernel_size, norm_layer, bias):
            super().__init__()
            self.conv = nn.Conv2d(
                in_ch, out_ch, kernel_size, padding=kernel_size // 2, bias=bias
            )
            self.gn = norm_layer

        def forward(self, x):
            x = self.conv(x)
            if self.gn is not None:
                x = self.gn(x)
            return x

    class ChannelMapper(nn.Module):
        def __init__(self, input_shapes, in_features, out_channels,
                     kernel_size=3, bias=True, norm_layer=None, activation=None,
                     num_outs=None, **kwargs):
            super().__init__()
            import copy as _copy

            self.in_features = in_features
            self.convs = nn.ModuleList(
                _ConvGN(input_shapes[f].channels, out_channels, kernel_size,
                        _copy.deepcopy(norm_layer), bias)
                for f in in_features
            )
            self.extra_convs = None
            if num_outs is not None and num_outs > len(in_features):
                self.extra_convs = nn.ModuleList()
                in_ch = input_shapes[in_features[-1]].channels
                for i in range(num_outs - len(in_features)):
                    self.extra_convs.append(
                        nn.Sequential(
                            nn.Conv2d(in_ch if i == 0 else out_channels,
                                      out_channels, 3, stride=2, padding=1,
                                      bias=bias),
                            _copy.deepcopy(norm_layer),
                        )
                    )

        def forward(self, inputs):
            outs = [conv(inputs[f]) for f, conv in zip(self.in_features, self.convs)]
            if self.extra_convs:
                x = inputs[self.in_features[-1]]
                for i, extra in enumerate(self.extra_convs):
                    outs.append(extra(x if i == 0 else outs[-1]))
            return outs

    dmodeling = types.ModuleType("detrex.modeling")
    dneck = types.ModuleType("detrex.modeling.neck")
    dneck.ChannelMapper = ChannelMapper
    dmodeling.neck = dneck
    detrex.layers = dlayers
    detrex.utils = dutils
    detrex.modeling = dmodeling
    sys.modules["detrex"] = detrex
    sys.modules["detrex.layers"] = dlayers
    sys.modules["detrex.utils"] = dutils
    sys.modules["detrex.modeling"] = dmodeling
    sys.modules["detrex.modeling.neck"] = dneck

    # ---------------- detectron2 extensions ----------------
    d2 = sys.modules["detectron2"]
    layers = sys.modules["detectron2.layers"]
    layers.batched_nms = _batched_nms
    layers.move_device_like = lambda x, ref: x.to(ref.device)

    class Boxes:
        def __init__(self, tensor):
            self.tensor = tensor.reshape(-1, 4)

        def __len__(self):
            return self.tensor.shape[0]

        def clone(self):
            return Boxes(self.tensor.clone())

        def to(self, device):
            return Boxes(self.tensor.to(device))

        def clip(self, box_size):
            h, w = box_size
            self.tensor[:, 0].clamp_(min=0, max=w)
            self.tensor[:, 1].clamp_(min=0, max=h)
            self.tensor[:, 2].clamp_(min=0, max=w)
            self.tensor[:, 3].clamp_(min=0, max=h)

        def area(self):
            b = self.tensor
            return (b[:, 2] - b[:, 0]).clamp(min=0) * (b[:, 3] - b[:, 1]).clamp(min=0)

        def nonempty(self, threshold=0.0):
            b = self.tensor
            return ((b[:, 2] - b[:, 0]) > threshold) & ((b[:, 3] - b[:, 1]) > threshold)

        def scale(self, scale_x, scale_y):
            self.tensor[:, 0::2] *= scale_x
            self.tensor[:, 1::2] *= scale_y

        def __getitem__(self, item):
            return Boxes(self.tensor[item])

        @property
        def device(self):
            return self.tensor.device

    class Instances:
        def __init__(self, image_size, **kwargs):
            self._image_size = image_size
            self._fields = {}
            for k, v in kwargs.items():
                self.set(k, v)

        @property
        def image_size(self):
            return self._image_size

        def set(self, name, value):
            self._fields[name] = value

        def has(self, name):
            return name in self._fields

        def get(self, name):
            return self._fields[name]

        def get_fields(self):
            return self._fields

        def __setattr__(self, name, val):
            if name.startswith("_"):
                super().__setattr__(name, val)
            else:
                self.set(name, val)

        def __getattr__(self, name):
            if name.startswith("_") or name not in self._fields:
                raise AttributeError(name)
            return self._fields[name]

        def __len__(self):
            for v in self._fields.values():
                return len(v)
            return 0

        def __getitem__(self, item):
            ret = Instances(self._image_size)
            for k, v in self._fields.items():
                ret.set(k, v[item])
            return ret

        def to(self, device):
            ret = Instances(self._image_size)
            for k, v in self._fields.items():
                ret.set(k, v.to(device) if hasattr(v, "to") else v)
            return ret

    class ImageList:
        def __init__(self, tensor, image_sizes):
            self.tensor = tensor
            self.image_sizes = image_sizes

        def __len__(self):
            return len(self.image_sizes)

        @staticmethod
        def from_tensors(tensors, size_divisibility=0, pad_value=0.0,
                         padding_constraints=None):
            image_sizes = [(t.shape[-2], t.shape[-1]) for t in tensors]
            max_h = max(s[0] for s in image_sizes)
            max_w = max(s[1] for s in image_sizes)
            if padding_constraints is not None:
                square_size = padding_constraints.get("square_size", 0)
                if square_size > 0:
                    max_h = max_w = square_size
                if "size_divisibility" in padding_constraints:
                    size_divisibility = padding_constraints["size_divisibility"]
            if size_divisibility > 1:
                stride = size_divisibility
                max_h = (max_h + stride - 1) // stride * stride
                max_w = (max_w + stride - 1) // stride * stride
            batched = tensors[0].new_full(
                (len(tensors), *tensors[0].shape[:-2], max_h, max_w), pad_value
            )
            for i, t in enumerate(tensors):
                batched[i, ..., : t.shape[-2], : t.shape[-1]].copy_(t)
            return ImageList(batched.contiguous(), image_sizes)

    class BitMasks:
        def __init__(self, tensor):
            self.tensor = tensor

        def __len__(self):
            return self.tensor.shape[0]

        def crop_and_resize(self, boxes, mask_size):
            """d2 semantics (ROIAlign aligned=True on float masks >= 0.5),
            reproduced with grid_sample for the CPU oracle."""
            n = len(self)
            if n == 0:
                return self.tensor.new_zeros((0, mask_size, mask_size)).bool()
            masks = self.tensor.to(torch.float32)[:, None]
            x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
            h, w = masks.shape[-2:]
            # sample mask_size points at pixel centers of each roi cell
            ys = torch.linspace(0.5 / mask_size, 1 - 0.5 / mask_size, mask_size)
            xs = torch.linspace(0.5 / mask_size, 1 - 0.5 / mask_size, mask_size)
            gy = y1[:, None] + (y2 - y1)[:, None] * ys[None]
            gx = x1[:, None] + (x2 - x1)[:, None] * xs[None]
            # to normalized grid_sample coords (align_corners=False)
            gy = gy / h * 2 - 1
            gx = gx / w * 2 - 1
            grid = torch.stack(
                [gx[:, None, :].expand(n, mask_size, mask_size),
                 gy[:, :, None].expand(n, mask_size, mask_size)], dim=-1
            )
            out = F.grid_sample(masks, grid, mode="bilinear", align_corners=False)
            return out[:, 0] >= 0.5

    structures = types.ModuleType("detectron2.structures")
    structures.Boxes = Boxes
    structures.Instances = Instances
    structures.ImageList = ImageList
    structures.BitMasks = BitMasks
    d2.structures = structures
    sys.modules["detectron2.structures"] = structures

    def detector_postprocess(results, output_height, output_width,
                             mask_threshold=0.5):
        scale_x = output_width / results.image_size[1]
        scale_y = output_height / results.image_size[0]
        results = Instances((output_height, output_width),
                            **results.get_fields())
        if results.has("pred_boxes"):
            boxes = results.pred_boxes
            boxes.scale(scale_x, scale_y)
            boxes.clip(results.image_size)
            results = results[boxes.nonempty()]
        return results

    def sem_seg_postprocess(result, img_size, output_height, output_width):
        result = result[:, : img_size[0], : img_size[1]].expand(1, -1, -1, -1)
        return F.interpolate(
            result, size=(output_height, output_width), mode="bilinear",
            align_corners=False,
        )[0]

    modeling = sys.modules["detectron2.modeling"]

    class GeneralizedRCNN(nn.Module):
        pass

    modeling.GeneralizedRCNN = GeneralizedRCNN
    modeling.detector_postprocess = detector_postprocess
    postproc = types.ModuleType("detectron2.modeling.postprocessing")
    postproc.detector_postprocess = detector_postprocess
    postproc.sem_seg_postprocess = sem_seg_postprocess
    modeling.postprocessing = postproc
    sys.modules["detectron2.modeling.postprocessing"] = postproc

    roi_heads = types.ModuleType("detectron2.modeling.roi_heads")
    fr = types.ModuleType("detectron2.modeling.roi_heads.fast_rcnn")

    def _d2_fast_rcnn_inference(*a, **k):  # only the ape-local copy is used
        raise NotImplementedError("d2 fast_rcnn_inference stub")

    fr.fast_rcnn_inference = _d2_fast_rcnn_inference
    roi_heads.fast_rcnn = fr
    modeling.roi_heads = roi_heads
    sys.modules["detectron2.modeling.roi_heads"] = roi_heads
    sys.modules["detectron2.modeling.roi_heads.fast_rcnn"] = fr

    meta_arch = types.ModuleType("detectron2.modeling.meta_arch")
    pfpn = types.ModuleType("detectron2.modeling.meta_arch.panoptic_fpn")

    def combine_semantic_and_instance_outputs(*a, **k):
        raise NotImplementedError("panoptic combine stub")

    pfpn.combine_semantic_and_instance_outputs = combine_semantic_and_instance_outputs
    meta_arch.panoptic_fpn = pfpn
    modeling.meta_arch = meta_arch
    sys.modules["detectron2.modeling.meta_arch"] = meta_arch
    sys.modules["detectron2.modeling.meta_arch.panoptic_fpn"] = pfpn

    utils_mod = types.ModuleType("detectron2.utils")
    events = types.ModuleType("detectron2.utils.events")

    class _Storage:
        iter = 0

    events.get_event_storage = lambda: _Storage()
    memory = types.ModuleType("detectron2.utils.memory")
    memory.retry_if_cuda_oom = lambda fn: fn
    utils_mod.events = events
    utils_mod.memory = memory
    d2.utils = utils_mod
    sys.modules["detectron2.utils"] = utils_mod
    sys.modules["detectron2.utils.events"] = events
    sys.modules["detectron2.utils.memory"] = memory

    data_mod = types.ModuleType("detectron2.data")
    det_utils = types.ModuleType("detectron2.data.detection_utils")
    det_utils.convert_image_to_rgb = lambda img, fmt: img
    catalog = types.ModuleType("detectron2.data.catalog")

    class _Metadata:
        def __init__(self, name):
            self.name = name

        def get(self, key, default=None):
            return getattr(self, key, default)

        def set(self, **kwargs):
            for k, v in kwargs.items():
                setattr(self, k, v)
            return self

    class _MetadataCatalog:
        _store = {}

        @classmethod
        def get(cls, name):
            if name not in cls._store:
                cls._store[name] = _Metadata(name)
            return cls._store[name]

    catalog.MetadataCatalog = _MetadataCatalog
    catalog.Metadata = _Metadata
    data_mod.detection_utils = det_utils
    data_mod.catalog = catalog
    d2.data = data_mod
    sys.modules["detectron2.data"] = data_mod
    sys.modules["detectron2.data.detection_utils"] = det_utils
    sys.modules["detectron2.data.catalog"] = catalog


def load_reference_ape():
    """Import the real /root/reference/ape layers + ape_deta task modules under
    the canonical 'ape' name, skipping the heavy package __init__ chain
    (ape/__init__.py pulls the full detectron2 data machinery).

    Returns the dict of loaded modules keyed by short name."""
    install_detrex_stubs()
    if "ape.modeling.ape_deta.deformable_detr_segm_vl" in sys.modules:
        return sys.modules["_refape_cache"].mods

    base = "/root/reference/ape"
    # namespace packages (no __init__ execution)
    for name, path in [
        ("ape", base),
        ("ape.modeling", f"{base}/modeling"),
        ("ape.modeling.text", f"{base}/modeling/text"),
        ("ape.modeling.backbone", f"{base}/modeling/backbone"),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod
    # fake CUDA extension so the import guard keeps the real module class
    # (multi_scale_deform_attn.py:405-423 swaps in a dummy when ape._C is
    # missing; pytorch_attn=True never calls into it)
    if "ape._C" not in sys.modules:
        _c = types.ModuleType("ape._C")
        _c.ms_deform_attn_forward = None
        _c.ms_deform_attn_backward = None
        sys.modules["ape._C"] = _c
        sys.modules["ape"]._C = _c

    def _load(name, path):
        if name in sys.modules:
            return sys.modules[name]
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    # real ape.layers package (its __init__ imports only layer modules)
    layers_pkg = types.ModuleType("ape.layers")
    layers_pkg.__path__ = [f"{base}/layers"]
    sys.modules["ape.layers"] = layers_pkg
    for sub in ["fuse_helper", "multi_scale_deform_attn", "vision_language_align",
                "vision_language_fusion", "zero_shot_fc"]:
        m = _load(f"ape.layers.{sub}", f"{base}/layers/{sub}.py")
        for k in dir(m):
            if not k.startswith("_"):
                setattr(layers_pkg, k, getattr(m, k))

    _load("ape.modeling.text.utils", f"{base}/modeling/text/utils.py")
    sys.modules["ape.modeling.text"].utils = sys.modules["ape.modeling.text.utils"]

    deta_pkg = types.ModuleType("ape.modeling.ape_deta")
    deta_pkg.__path__ = [f"{base}/modeling/ape_deta"]
    sys.modules["ape.modeling.ape_deta"] = deta_pkg
    mods = {}
    for sub in ["segmentation", "fast_rcnn", "deformable_detr",
                "deformable_detr_segm_vl", "deformable_transformer_vl"]:
        mods[sub] = _load(
            f"ape.modeling.ape_deta.{sub}", f"{base}/modeling/ape_deta/{sub}.py"
        )
        setattr(deta_pkg, sub, mods[sub])

    cache = types.ModuleType("_refape_cache")
    cache.mods = mods
    sys.modules["_refape_cache"] = cache
    return mods
