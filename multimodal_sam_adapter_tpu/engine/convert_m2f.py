"""Mask2Former head checkpoint conversion: reference torch layout
(mmseg_custom/models/decode_heads/mask2former_head.py:579 +
mmseg_custom/models/plugins/msdeformattn_pixel_decoder.py) -> this
framework's flax tree (models/mask2former/head.py Mask2FormerHead).

Key geometric remaps:
- conv weights OIHW -> HWIO, linear weights transposed (flax kernel);
- torch nn.MultiheadAttention packed in_proj (3C, C) -> separate
  q/k/v Dense kernels;
- BaseTransformerLayer index conventions: attentions.0 = cross_attn,
  attentions.1 = self_attn (canonical Mask2Former operation_order
  ('cross_attn','norm','self_attn','norm','ffn','norm')); norms.{0,1,2} ->
  norm{1,2,3}; ffns.0.layers.0.0/layers.1 -> ffn1/ffn2.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _t(v):
    return np.asarray(v).T


def _conv(v):
    return np.asarray(v).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _set(tree, path, v):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(v)


def _dense(tree, path, sd, tname):
    _set(tree, path + ("kernel",), _t(sd[tname + ".weight"]))
    if tname + ".bias" in sd:
        _set(tree, path + ("bias",), sd[tname + ".bias"])


def _ln(tree, path, sd, tname):
    _set(tree, path + ("ln", "scale"), sd[tname + ".weight"])
    _set(tree, path + ("ln", "bias"), sd[tname + ".bias"])


def _mha(tree, path, sd, tname):
    """torch nn.MultiheadAttention -> q/k/v/out Dense."""
    w = np.asarray(sd[tname + ".attn.in_proj_weight"])
    b = np.asarray(sd[tname + ".attn.in_proj_bias"])
    C = w.shape[1]
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        _set(tree, path + (name, "kernel"), w[i * C:(i + 1) * C].T)
        _set(tree, path + (name, "bias"), b[i * C:(i + 1) * C])
    _dense(tree, path + ("out_proj",), sd, tname + ".attn.out_proj")


def convert_mask2former_head(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference Mask2FormerHead state dict -> flax params subtree for
    models/mask2former/head.py:Mask2FormerHead (no leading 'decode_head.'
    prefix expected)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    tree: Dict = {}
    consumed = set()

    def take(name):
        consumed.add(name)
        return sd[name]

    # ---- queries / embeds / prediction heads (decoder submodule)
    _set(tree, ("decoder", "query_embed"), take("query_embed.weight"))
    _set(tree, ("decoder", "query_feat"), take("query_feat.weight"))
    _set(tree, ("decoder", "level_embed"), take("level_embed.weight"))
    _set(tree, ("decoder", "cls_head", "kernel"), _t(take("cls_embed.weight")))
    _set(tree, ("decoder", "cls_head", "bias"), take("cls_embed.bias"))
    for i, j in enumerate((0, 2, 4)):
        _set(tree, ("decoder", f"mask_mlp{i}", "kernel"),
             _t(take(f"mask_embed.{j}.weight")))
        _set(tree, ("decoder", f"mask_mlp{i}", "bias"),
             take(f"mask_embed.{j}.bias"))
    _ln(tree, ("decoder", "decoder_norm"), sd,
        "transformer_decoder.post_norm")
    consumed |= {"transformer_decoder.post_norm.weight",
                 "transformer_decoder.post_norm.bias"}

    # ---- decoder layers
    nlayers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"transformer_decoder\.layers\.(\d+)\.", k))
    )
    for i in range(nlayers):
        t = f"transformer_decoder.layers.{i}"
        p = ("decoder", f"layer{i}")
        _mha(tree, p + ("cross_attn",), sd, f"{t}.attentions.0")
        _mha(tree, p + ("self_attn",), sd, f"{t}.attentions.1")
        for k in list(sd):
            if k.startswith(f"{t}.attentions."):
                consumed.add(k)
        for n in range(3):
            _ln(tree, p + (f"norm{n + 1}",), sd, f"{t}.norms.{n}")
            consumed |= {f"{t}.norms.{n}.weight", f"{t}.norms.{n}.bias"}
        _dense(tree, p + ("ffn1",), sd, f"{t}.ffns.0.layers.0.0")
        _dense(tree, p + ("ffn2",), sd, f"{t}.ffns.0.layers.1")
        consumed |= {f"{t}.ffns.0.layers.0.0.weight",
                     f"{t}.ffns.0.layers.0.0.bias",
                     f"{t}.ffns.0.layers.1.weight",
                     f"{t}.ffns.0.layers.1.bias"}

    # ---- pixel decoder
    pd = ("pixel_decoder",)
    _set(tree, pd + ("level_encoding",),
         take("pixel_decoder.level_encoding.weight"))
    nconvs = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"pixel_decoder\.input_convs\.(\d+)\.", k))
    )
    for i in range(nconvs):
        t = f"pixel_decoder.input_convs.{i}"
        _set(tree, pd + (f"input_conv{i}", "kernel"),
             _conv(take(f"{t}.conv.weight")))
        _set(tree, pd + (f"input_conv{i}", "bias"), take(f"{t}.conv.bias"))
        _set(tree, pd + (f"input_norm{i}", "gn", "scale"),
             take(f"{t}.gn.weight"))
        _set(tree, pd + (f"input_norm{i}", "gn", "bias"),
             take(f"{t}.gn.bias"))
    nenc = 1 + max(
        (int(m.group(1)) for k in sd
         if (m := re.match(r"pixel_decoder\.encoder\.layers\.(\d+)\.", k))),
        default=-1,
    )
    for i in range(nenc):
        t = f"pixel_decoder.encoder.layers.{i}"
        p = pd + (f"encoder{i}",)
        for proj in ("sampling_offsets", "attention_weights", "value_proj",
                     "output_proj"):
            _dense(tree, p + ("self_attn", proj), sd,
                   f"{t}.attentions.0.{proj}")
            consumed |= {f"{t}.attentions.0.{proj}.weight",
                         f"{t}.attentions.0.{proj}.bias"}
        _dense(tree, p + ("ffn1",), sd, f"{t}.ffns.0.layers.0.0")
        _dense(tree, p + ("ffn2",), sd, f"{t}.ffns.0.layers.1")
        for n in range(2):
            _ln(tree, p + (f"norm{n + 1}",), sd, f"{t}.norms.{n}")
            consumed |= {f"{t}.norms.{n}.weight", f"{t}.norms.{n}.bias"}
        consumed |= {f"{t}.ffns.0.layers.0.0.weight",
                     f"{t}.ffns.0.layers.0.0.bias",
                     f"{t}.ffns.0.layers.1.weight",
                     f"{t}.ffns.0.layers.1.bias"}
    _set(tree, pd + ("lateral4", "kernel"),
         _conv(take("pixel_decoder.lateral_convs.0.conv.weight")))
    _set(tree, pd + ("lateral4_norm", "gn", "scale"),
         take("pixel_decoder.lateral_convs.0.gn.weight"))
    _set(tree, pd + ("lateral4_norm", "gn", "bias"),
         take("pixel_decoder.lateral_convs.0.gn.bias"))
    _set(tree, pd + ("output4", "kernel"),
         _conv(take("pixel_decoder.output_convs.0.conv.weight")))
    _set(tree, pd + ("output4_norm", "gn", "scale"),
         take("pixel_decoder.output_convs.0.gn.weight"))
    _set(tree, pd + ("output4_norm", "gn", "bias"),
         take("pixel_decoder.output_convs.0.gn.bias"))
    _set(tree, pd + ("mask_feature", "kernel"),
         _conv(take("pixel_decoder.mask_feature.weight")))
    _set(tree, pd + ("mask_feature", "bias"),
         take("pixel_decoder.mask_feature.bias"))

    return tree
