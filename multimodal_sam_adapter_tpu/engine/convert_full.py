"""Full trained MM-SAM checkpoint ingestion (torch -> this framework).

Maps every parameter of the reference's trained EncoderDecoder state dict
(backbone SAMAdapterbimodal... + SegformerHead) onto this package's flax
tree, enabling logit-parity evaluation of published checkpoints before any
training. Complements convert.py (SAM / ConvNeXt pretrained ingestion).

Key sources for the torch-side names:
- backbone: reference image_encoder_adapter_bimodal_mix_mod_new_in_twin_convnext_new_with_cp.py
- spm/fusion neck: adapter_modules...py:72-434, 901-1076
- twin ConvNeXt: base/twin_convnext.py (_x/_y branch keys)
- decode head: mmseg SegformerHead (convs.N.conv/bn, fusion_conv, conv_seg)

Returns {'params': ..., 'batch_stats': ...} (BN running stats split out).
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np

from .convert import (
    _set,
    _vit_block_stage,
    _map_vit_block,
    convert_convnext_branch,
    t_conv,
    t_conv_transpose,
    t_linear,
)


def _map_msda(params, base, rest, v):
    m = re.match(r"(sampling_offsets|attention_weights|value_proj|output_proj)"
                 r"\.(weight|bias)", rest)
    if not m:
        raise KeyError(rest)
    name, wb = m.group(1), m.group(2)
    if wb == "weight":
        _set(params, base + (name, "kernel"), t_linear(v))
    else:
        _set(params, base + (name, "bias"), v)


def _map_extractor(params, base, rest, v):
    ln = {
        "query_norm.weight": ("query_norm", "ln", "scale"),
        "query_norm.bias": ("query_norm", "ln", "bias"),
        "feat_norm.weight": ("feat_norm", "ln", "scale"),
        "feat_norm.bias": ("feat_norm", "ln", "bias"),
        "ffn_norm.weight": ("ffn_norm", "ln", "scale"),
        "ffn_norm.bias": ("ffn_norm", "ln", "bias"),
    }
    if rest in ln:
        _set(params, base + ln[rest], v)
    elif rest == "gamma":
        _set(params, base + ("gamma",), v)
    elif rest.startswith("attn."):
        _map_msda(params, base + ("attn",), rest[5:], v)
    elif rest == "ffn.fc1.weight":
        _set(params, base + ("ffn", "fc1", "kernel"), t_linear(v))
    elif rest == "ffn.fc1.bias":
        _set(params, base + ("ffn", "fc1", "bias"), v)
    elif rest == "ffn.fc2.weight":
        _set(params, base + ("ffn", "fc2", "kernel"), t_linear(v))
    elif rest == "ffn.fc2.bias":
        _set(params, base + ("ffn", "fc2", "bias"), v)
    elif rest == "ffn.dwconv.dwconv.weight":
        _set(params, base + ("ffn", "dwconv", "dwconv", "kernel"), t_conv(v))
    elif rest == "ffn.dwconv.dwconv.bias":
        _set(params, base + ("ffn", "dwconv", "dwconv", "bias"), v)
    else:
        raise KeyError(rest)


def _map_neck(params, stats, rest, v):
    """spm.smart_fusion.<rest> -> smart_fusion subtree."""

    def conv(path, w):
        _set(params, path + ("kernel",), t_conv(w))

    m = re.match(r"enhance_blocks\.(\d+)\.conv_atten\.conv\.weight", rest)
    if m:
        return conv((f"enhance{m.group(1)}", "conv_atten"), v)
    m = re.match(r"enhance_blocks\.(\d+)\.conv_atten\.gn\.(weight|bias)", rest)
    if m:
        leaf = "scale" if m.group(2) == "weight" else "bias"
        return _set(params, (f"enhance{m.group(1)}", "norm", "gn", leaf), v)
    m = re.match(
        r"global_feature_encoder_(rgb|sne)\.(\d+)\.norm1\.body\.(weight|bias)",
        rest,
    )
    if m:
        leaf = "scale" if m.group(3) == "weight" else "bias"
        return _set(params, (f"gfe_{m.group(1)}{m.group(2)}", "norm1", leaf), v)
    m = re.match(r"global_feature_encoder_(rgb|sne)\.(\d+)\.attn\.(.+)", rest)
    if m:
        base = (f"gfe_{m.group(1)}{m.group(2)}", "attn")
        sub = m.group(3)
        if sub == "scale":
            return _set(params, base + ("scale",), v)
        if sub == "scale2":
            return _set(params, base + ("scale2",), v)
        mm = re.match(r"(qkv1|qkv2|proj)\.weight", sub)
        if mm:
            return conv(base + (mm.group(1),), v)
        raise KeyError(rest)
    m = re.match(
        r"local_feature_encoder_(rgb|sne)\.(\d+)\.bottleneckBlock\.(\d)\.weight",
        rest,
    )
    if m:
        name = {0: "expand", 2: "dw", 4: "project"}[int(m.group(3))]
        return conv((f"local_{m.group(1)}{m.group(2)}", name), v)
    m = re.match(r"local_feature_encoder_(rgb|sne)\.(\d+)\.scale", rest)
    if m:
        return _set(params, (f"local_{m.group(1)}{m.group(2)}", "scale"), v)
    m = re.match(r"fuse_blocks\.(\d+)\.gamma([xy])\.scale", rest)
    if m:
        return _set(params, (f"fuse{m.group(1)}", f"gamma{m.group(2)}",
                             "scale"), v)
    m = re.match(r"fuse_blocks\.(\d+)\.norm\.(weight|bias)", rest)
    if m:
        leaf = "scale" if m.group(2) == "weight" else "bias"
        return _set(params, (f"fuse{m.group(1)}", "norm", leaf), v)
    m = re.match(
        r"detail_feature_extractions\.(\d+)\.(project_in|dwconv|project_out)"
        r"\.weight", rest)
    if m:
        i, which = m.group(1), m.group(2)
        if which == "project_out":
            return conv((f"detail{i}", "project_out"), v)
        # the fused 2*hidden expand/dwconv run as two half-branches on TPU
        # (GatedDWConvMlp: gate = out channels [0:h], val = [h:2h]; the
        # dwconv 2-ch groups never straddle the halves) — slice the
        # reference's fused weight along its HWIO output axis
        w = t_conv(v)
        assert w.shape[-1] % 2 == 0, (
            f"detail_feature_extractions.{i}.{which}: fused width "
            f"{w.shape[-1]} must be even to split into gate/val halves")
        h = w.shape[-1] // 2
        sub = {"project_in": "project_in", "dwconv": "dwconv"}[which]
        _set(params, (f"detail{i}", f"{sub}_gate", "kernel"), w[..., :h])
        return _set(params, (f"detail{i}", f"{sub}_val", "kernel"),
                    w[..., h:])
    m = re.match(r"ca_blocks\.(\d+)\.coord_atten\.(conv1|conv_h|conv_w)"
                 r"\.(weight|bias)", rest)
    if m:
        i, name, wb = m.group(1), m.group(2), m.group(3)
        if wb == "weight":
            return conv((f"ca{i}", name), v)
        return _set(params, (f"ca{i}", name, "bias"), v)
    m = re.match(r"ca_blocks\.(\d+)\.coord_atten\.bn1\.(.+)", rest)
    if m:
        i, leaf = m.group(1), m.group(2)
        if leaf == "weight":
            return _set(params, (f"ca{i}", "bn1", "bn", "scale"), v)
        if leaf == "bias":
            return _set(params, (f"ca{i}", "bn1", "bn", "bias"), v)
        if leaf == "running_mean":
            return _set(stats, (f"ca{i}", "bn1", "bn", "mean"), v)
        if leaf == "running_var":
            return _set(stats, (f"ca{i}", "bn1", "bn", "var"), v)
        if leaf == "num_batches_tracked":
            return None
        raise KeyError(rest)
    m = re.match(r"scale_layers\.(\d+)\.scale([12])", rest)
    if m:
        return _set(params, (f"blend{m.group(1)}", f"scale{m.group(2)}"), v)
    raise KeyError(f"unmapped neck key: {rest}")


def _map_head(params, stats, rest, v):
    def bn(path, leaf, val):
        if leaf == "weight":
            _set(params, path + ("norm", "bn", "scale"), val)
        elif leaf == "bias":
            _set(params, path + ("norm", "bn", "bias"), val)
        elif leaf == "running_mean":
            _set(stats, path + ("norm", "bn", "mean"), val)
        elif leaf == "running_var":
            _set(stats, path + ("norm", "bn", "var"), val)

    m = re.match(r"convs\.(\d+)\.conv\.weight", rest)
    if m:
        return _set(params, (f"convs_{m.group(1)}", "conv", "kernel"),
                    t_conv(v))
    m = re.match(r"convs\.(\d+)\.bn\.(\w+)", rest)
    if m:
        return bn((f"convs_{m.group(1)}",), m.group(2), v)
    m = re.match(r"fusion_conv\.conv\.weight", rest)
    if m:
        return _set(params, ("fusion_conv", "conv", "kernel"), t_conv(v))
    m = re.match(r"fusion_conv\.bn\.(\w+)", rest)
    if m:
        return bn(("fusion_conv",), m.group(1), v)
    if rest == "conv_seg.weight":
        return _set(params, ("conv_seg", "kernel"), t_conv(v))
    if rest == "conv_seg.bias":
        return _set(params, ("conv_seg", "bias"), v)
    if rest.endswith("num_batches_tracked"):
        return None
    raise KeyError(f"unmapped head key: {rest}")


def convert_full_checkpoint(
    state_dict: Dict[str, np.ndarray],
    interaction_indexes=((0, 5), (6, 11), (12, 17), (18, 23)),
) -> dict:
    params: dict = {"backbone": {}, "decode_head": {}}
    stats: dict = {"backbone": {}, "decode_head": {}}
    bb = params["backbone"]
    bb_stats = stats["backbone"]
    twin_sd = {}

    for key, v in state_dict.items():
        v = np.asarray(v)
        if key.endswith("num_batches_tracked"):
            continue
        if key.startswith("decode_head."):
            _map_head(params["decode_head"], stats["decode_head"],
                      key[len("decode_head."):], v)
            continue
        if key.startswith("backbone."):
            key = key[len("backbone."):]
        if key == "pos_embed":
            _set(bb, ("pos_embed",), v)
        elif key == "level_embed":
            _set(bb, ("level_embed",), v)
        elif key == "patch_embed.proj.weight":
            _set(bb, ("patch_embed", "proj", "kernel"), t_conv(v))
        elif key == "patch_embed.proj.bias":
            _set(bb, ("patch_embed", "proj", "bias"), v)
        elif key.startswith("blocks."):
            m = re.match(r"blocks\.(\d+)\.(.+)", key)
            idx, rest = int(m.group(1)), m.group(2)
            s = _vit_block_stage(idx, interaction_indexes)
            _map_vit_block(bb, (f"interactions_{s}", f"vit_block_{idx}"),
                           rest, v)
        elif key.startswith("interactions."):
            m = re.match(r"interactions\.(\d+)\.(injector|extractor)\.(.+)",
                         key)
            if m:
                s, which, rest = m.group(1), m.group(2), m.group(3)
                _map_extractor(bb, (f"interactions_{s}", which), rest, v)
                continue
            m = re.match(r"interactions\.(\d+)\.extra_extractors\.(\d)\.(.+)",
                         key)
            if m:
                s, j, rest = m.group(1), m.group(2), m.group(3)
                _map_extractor(bb, (f"interactions_{s}",
                                    f"extra_extractor{j}"), rest, v)
                continue
            raise KeyError(f"unmapped interactions key: {key}")
        elif key == "up.weight":
            # PixelShuffleUp stores the 2x2-stride-2 ConvTranspose kernel
            # dot-ready as (C, kh, kw, O): the flax flip and the
            # stride==kernel depth-to-space flip cancel, leaving a pure
            # transpose of torch's (I, O, kh, kw)
            _set(bb, ("up", "kernel"),
                 np.ascontiguousarray(v.transpose(0, 2, 3, 1)))
        elif key == "up.bias":
            _set(bb, ("up", "bias"), v)
        elif re.match(r"norm([1-4])\.(\w+)", key):
            m = re.match(r"norm([1-4])\.(\w+)", key)
            i, leaf = m.group(1), m.group(2)
            if leaf == "weight":
                _set(bb, (f"norm{i}", "bn", "scale"), v)
            elif leaf == "bias":
                _set(bb, (f"norm{i}", "bn", "bias"), v)
            elif leaf == "running_mean":
                _set(bb_stats, (f"norm{i}", "bn", "mean"), v)
            elif leaf == "running_var":
                _set(bb_stats, (f"norm{i}", "bn", "var"), v)
        elif key.startswith("spm.twin_conv."):
            twin_sd[key[len("spm.twin_conv."):]] = v
        elif key.startswith("spm.smart_fusion."):
            _map_neck(
                bb.setdefault("spm", {}).setdefault("smart_fusion", {}),
                bb_stats.setdefault("spm", {}).setdefault("smart_fusion", {}),
                key[len("spm.smart_fusion."):], v,
            )
        elif re.match(r"spm\.fc([1-4])\.(weight|bias)", key):
            m = re.match(r"spm\.fc([1-4])\.(weight|bias)", key)
            i, wb = m.group(1), m.group(2)
            spm = bb.setdefault("spm", {})
            if wb == "weight":
                _set(spm, (f"fc{i}", "kernel"), t_conv(v))
            else:
                _set(spm, (f"fc{i}", "bias"), v)
        else:
            raise KeyError(f"unmapped backbone key: {key}")

    if twin_sd:
        bb.setdefault("spm", {})["twin_conv"] = _convert_twin_branches(twin_sd)
    return {"params": params, "batch_stats": stats}


def _convert_twin_branches(sd: Dict[str, np.ndarray]) -> dict:
    """TwinConvNeXt keys carry _x/_y branch markers
    (downsample_layers_x.0.0..., stages_y.2.5..., norm_x3)."""
    per_branch = {"x": {}, "y": {}}
    for k, v in sd.items():
        m = re.match(r"(downsample_layers|stages|norm)_([xy])(.*)", k)
        if not m:
            raise KeyError(f"unmapped twin_conv key: {k}")
        base, branch, rest = m.group(1), m.group(2), m.group(3)
        per_branch[branch][base + rest] = v
    return {
        "branch_x": convert_convnext_branch(per_branch["x"], None),
        "branch_y": convert_convnext_branch(per_branch["y"], None),
    }
