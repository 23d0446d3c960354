"""torch -> JAX checkpoint ingestion.

Replaces the reference's three checkpoint mechanisms (SURVEY.md section 5):
1. SAM ViT-L encoder ingestion (tools/SAM_checkpoint_convert.py +
   mmcv_custom/checkpoint.py:364-470 geometric remaps: 2-D bicubic pos-embed
   resize, 1-D linear rel-pos resize)
2. ConvNeXt ImageNet ingestion, one checkpoint dual-loaded into both twin
   branches (base/twin_convnext.py:398-443)
3. full trained MM-SAM checkpoint ingestion for logit-parity evaluation

All outputs are numpy pytrees shaped for this package's flax modules
({'params': ..., 'batch_stats': ...}); engine/checkpoint.py persists them
with orbax.

Layout transforms (torch -> flax):
- Linear (out, in)            -> kernel (in, out)
- Conv2d (O, I/g, kh, kw)     -> kernel (kh, kw, I/g, O)
- ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose kernel (kh, kw, I, O),
  with the spatial taps FLIPPED (torch's transposed conv scatters the kernel;
  flax's conv_transpose correlates it) — verified in tests/test_convert.py.
- BatchNorm running stats -> the 'batch_stats' collection
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# tensor layout transforms
# ---------------------------------------------------------------------------

def t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def t_conv_transpose(w: np.ndarray) -> np.ndarray:
    # torch (I, O, kh, kw) -> flax (kh, kw, I, O), flipping taps
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


# ---------------------------------------------------------------------------
# geometric remaps (reference mmcv_custom/checkpoint.py:364-470)
# ---------------------------------------------------------------------------

def resize_pos_embed_np(pos: np.ndarray, new_grid: Tuple[int, int]) -> np.ndarray:
    """Bicubic (torch a=-0.75) resize of a (1, H, W, C) pos embed, in numpy
    via torch for exactness."""
    import torch
    import torch.nn.functional as F

    if pos.shape[1:3] == tuple(new_grid):
        return pos
    t = torch.from_numpy(pos).permute(0, 3, 1, 2).double()
    t = F.interpolate(t, size=new_grid, mode="bicubic", align_corners=False)
    return t.permute(0, 2, 3, 1).float().numpy()


def resize_rel_pos_np(table: np.ndarray, new_len: int) -> np.ndarray:
    """Linear resize of a (L, C) rel-pos table (torch F.interpolate linear)."""
    import torch
    import torch.nn.functional as F

    if table.shape[0] == new_len:
        return table
    t = torch.from_numpy(table).double().T[None]
    t = F.interpolate(t, size=new_len, mode="linear")
    return t[0].T.float().numpy()


# ---------------------------------------------------------------------------
# ViT block key mapping
# ---------------------------------------------------------------------------

def _vit_block_stage(block_idx: int, interaction_indexes) -> int:
    for s, span in enumerate(interaction_indexes):
        if span[0] <= block_idx <= span[-1]:
            return s
    raise ValueError(f"block {block_idx} not covered by {interaction_indexes}")


def _map_vit_block(params, prefix_path, key_rest, value):
    """Map one `blocks.N.<rest>` torch entry into a ViTBlock param subtree.

    prefix_path: path of the ViTBlock in the flax tree.
    """
    m = {
        "norm1.weight": ("norm1", "ln", "scale"),
        "norm1.bias": ("norm1", "ln", "bias"),
        "norm2.weight": ("norm2", "ln", "scale"),
        "norm2.bias": ("norm2", "ln", "bias"),
        "attn.rel_pos_h": ("attn", "rel_pos_h"),
        "attn.rel_pos_w": ("attn", "rel_pos_w"),
    }
    if key_rest in m:
        _set(params, prefix_path + m[key_rest], value)
    elif key_rest == "attn.qkv.weight":
        _set(params, prefix_path + ("attn", "qkv", "kernel"), t_linear(value))
    elif key_rest == "attn.qkv.bias":
        _set(params, prefix_path + ("attn", "qkv", "bias"), value)
    elif key_rest == "attn.proj.weight":
        _set(params, prefix_path + ("attn", "proj", "kernel"), t_linear(value))
    elif key_rest == "attn.proj.bias":
        _set(params, prefix_path + ("attn", "proj", "bias"), value)
    elif key_rest == "mlp.lin1.weight":
        _set(params, prefix_path + ("mlp", "lin1", "kernel"), t_linear(value))
    elif key_rest == "mlp.lin1.bias":
        _set(params, prefix_path + ("mlp", "lin1", "bias"), value)
    elif key_rest == "mlp.lin2.weight":
        _set(params, prefix_path + ("mlp", "lin2", "kernel"), t_linear(value))
    elif key_rest == "mlp.lin2.bias":
        _set(params, prefix_path + ("mlp", "lin2", "bias"), value)
    else:
        raise KeyError(f"unmapped ViT block key: {key_rest}")


def convert_sam_encoder(
    state_dict: Dict[str, np.ndarray],
    interaction_indexes=((0, 5), (6, 11), (12, 17), (18, 23)),
    standalone: bool = False,
) -> dict:
    """Convert a SAM image-encoder state dict (already stripped of the
    'image_encoder.' prefix and 'neck.*' keys, as produced by the reference
    tools/SAM_checkpoint_convert.py) into adapter-backbone params.

    standalone=True targets models.sam_vit.ImageEncoderViT instead (blocks_i
    at top level) for parity tests.
    """
    params: dict = {}
    for key, v in state_dict.items():
        v = np.asarray(v)
        if key == "pos_embed":
            _set(params, ("pos_embed",), v)
        elif key == "patch_embed.proj.weight":
            _set(params, ("patch_embed", "proj", "kernel"), t_conv(v))
        elif key == "patch_embed.proj.bias":
            _set(params, ("patch_embed", "proj", "bias"), v)
        elif key.startswith("blocks."):
            m = re.match(r"blocks\.(\d+)\.(.+)", key)
            idx, rest = int(m.group(1)), m.group(2)
            if standalone:
                path = (f"blocks_{idx}",)
            else:
                s = _vit_block_stage(idx, interaction_indexes)
                path = (f"interactions_{s}", f"vit_block_{idx}")
            _map_vit_block(params, path, rest, v)
        elif key.startswith("neck."):
            continue
        else:
            raise KeyError(f"unmapped SAM encoder key: {key}")
    return params


# ---------------------------------------------------------------------------
# ConvNeXt ImageNet checkpoint -> twin branches
# ---------------------------------------------------------------------------

def convert_convnext_branch(state_dict: Dict[str, np.ndarray], depths) -> dict:
    """Convert one ConvNeXt (mmpretrain layout) state dict into a
    _ConvNeXtBranch param subtree. Keys may carry a 'backbone.' prefix.

    mmpretrain layout: downsample_layers.{i}.{0,1}, stages.{i}.{j}.*,
    norm{i} out-norms.
    """
    params: dict = {}
    for key, v in state_dict.items():
        v = np.asarray(v)
        key = key[9:] if key.startswith("backbone.") else key
        if key.startswith("downsample_layers."):
            m = re.match(r"downsample_layers\.(\d+)\.(\d+)\.(weight|bias)", key)
            i, sub, wb = int(m.group(1)), int(m.group(2)), m.group(3)
            if i == 0:
                # stem: [conv, norm]
                if sub == 0:
                    name, leaf = "stem_conv", ("kernel" if wb == "weight" else "bias")
                    v = t_conv(v) if wb == "weight" else v
                    _set(params, (name, leaf), v)
                else:
                    _set(params, ("stem_norm", "ln",
                                  "scale" if wb == "weight" else "bias"), v)
            else:
                # [norm, conv]
                if sub == 0:
                    _set(params, (f"down_norm{i}", "ln",
                                  "scale" if wb == "weight" else "bias"), v)
                else:
                    v = t_conv(v) if wb == "weight" else v
                    _set(params, (f"down_conv{i}",
                                  "kernel" if wb == "weight" else "bias"), v)
        elif key.startswith("stages."):
            m = re.match(r"stages\.(\d+)\.(\d+)\.(.+)", key)
            i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            base = (f"stage{i}_block{j}",)
            if rest == "depthwise_conv.weight":
                _set(params, base + ("dwconv", "kernel"), t_conv(v))
            elif rest == "depthwise_conv.bias":
                _set(params, base + ("dwconv", "bias"), v)
            elif rest == "norm.weight":
                _set(params, base + ("norm", "ln", "scale"), v)
            elif rest == "norm.bias":
                _set(params, base + ("norm", "ln", "bias"), v)
            elif rest == "pointwise_conv1.weight":
                _set(params, base + ("pwconv1", "kernel"), t_linear(v))
            elif rest == "pointwise_conv1.bias":
                _set(params, base + ("pwconv1", "bias"), v)
            elif rest == "pointwise_conv2.weight":
                _set(params, base + ("pwconv2", "kernel"), t_linear(v))
            elif rest == "pointwise_conv2.bias":
                _set(params, base + ("pwconv2", "bias"), v)
            elif rest == "gamma":
                _set(params, base + ("gamma",), v)
            else:
                raise KeyError(f"unmapped ConvNeXt stage key: {key}")
        elif re.match(r"norm(\d)\.(weight|bias)", key):
            m = re.match(r"norm(\d)\.(weight|bias)", key)
            i, wb = int(m.group(1)), m.group(2)
            _set(params, (f"out_norm{i}", "ln",
                          "scale" if wb == "weight" else "bias"), v)
        elif key.startswith(("head.", "norm.")) or key.startswith("gap"):
            continue  # classifier head / final gap norm: unused
        else:
            raise KeyError(f"unmapped ConvNeXt key: {key}")
    return params


def convert_twin_convnext(state_dict: Dict[str, np.ndarray], depths=None) -> dict:
    """One ImageNet ConvNeXt checkpoint loaded into BOTH twin branches
    (reference twin_convnext.py:423-443 rewrites keys to _x/_y)."""
    branch = convert_convnext_branch(state_dict, depths)
    import copy

    return {"branch_x": branch, "branch_y": copy.deepcopy(branch)}


__all__ = [
    "t_linear",
    "t_conv",
    "t_conv_transpose",
    "resize_pos_embed_np",
    "resize_rel_pos_np",
    "convert_sam_encoder",
    "convert_convnext_branch",
    "convert_twin_convnext",
]
