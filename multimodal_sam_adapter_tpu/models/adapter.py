"""ViT-Adapter interaction modules + bimodal spatial prior module.

Re-design of reference
mmseg_custom/models/backbones/adapter_modules_multimodal_mix_mod_new_in_twin_convnext_new_with_cp.py:437-621, 901-1076:
- reference points / spatial shapes are *static* functions of the input
  geometry, so they live in module fields and numpy, not in traced args —
  this keeps every remat/jit boundary tensor-only (TPU-friendly, no
  retraces)
- `Injector`: pyramid -> ViT cross-attention with a zero-ish (1e-6) gamma
- `Extractor`: ViT -> pyramid cross-attention + ConvFFN with multi-scale
  depthwise conv over the 16n/4n/n token split
- `InteractionBlock`: injector, a span of SAM ViT blocks, extractor(s);
  owns its ViT blocks so the whole stage can be rematerialized as one unit
  (the reference's `with_cp=True`)
- `SpatialPriorModuleBimodal`: TwinConvNeXt + RoadFormer2Neck + per-level
  1x1 projections to the ViT width, flattened to token streams
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.layers import (DropPath, LayerNorm, fan_out_conv_init, gelu,
                         trunc_normal_init)
from ..ops.msda import MSDeformAttention
from .fusion_neck import RoadFormer2Neck
from .sam_vit import ViTBlock
from .twin_convnext import TwinConvNeXt


def reference_points(spatial_shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    """Pixel-center reference points, normalized per level, concatenated.

    Mirrors reference adapter_modules...:437-449. Returns (1, sum(HW), 1, 2)
    as (x, y).
    """
    pts = []
    for H, W in spatial_shapes:
        ys = (np.arange(H, dtype=np.float32) + 0.5) / H
        xs = (np.arange(W, dtype=np.float32) + 0.5) / W
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1))
    out = np.concatenate(pts, axis=0)[None, :, None, :]
    return out


def deform_inputs(h: int, w: int):
    """Static deformable-attention geometry for an (h, w) input image.

    Returns (inputs1, inputs2); each is (reference_points, spatial_shapes):
    - inputs1 (injector): queries = ViT tokens at 1/16; values = pyramid
      levels (1/8, 1/16, 1/32)
    - inputs2 (extractor): queries = pyramid tokens; values = ViT 1/16 grid
    (reference adapter_modules...:452-471)
    """
    pyr_shapes = ((h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32))
    vit_shape = ((h // 16, w // 16),)
    inputs1 = (jnp.asarray(reference_points(vit_shape)), pyr_shapes)
    inputs2 = (jnp.asarray(reference_points(pyr_shapes)), vit_shape)
    return inputs1, inputs2


class DWConvMS(nn.Module):
    """Multi-scale depthwise 3x3 over the 16n/4n/n token split.

    The pyramid token stream c = [c2 (2Hx2W), c3 (HxW), c4 (H/2xW/2)] is
    sliced, reshaped to its grid, depthwise-convolved with SHARED weights,
    and re-flattened (reference adapter_modules...:496-511).
    """

    dim: int
    hw: Tuple[int, int]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        H, W = self.hw
        B, N, C = x.shape
        n = N // 21
        conv = nn.Conv(
            self.dim, (3, 3), padding=[(1, 1), (1, 1)],
            feature_group_count=self.dim, use_bias=True, dtype=self.dtype,
            kernel_init=fan_out_conv_init, name="dwconv",
        )
        x1 = conv(x[:, : 16 * n].reshape(B, H * 2, W * 2, C)).reshape(B, 16 * n, C)
        x2 = conv(x[:, 16 * n : 20 * n].reshape(B, H, W, C)).reshape(B, 4 * n, C)
        x3 = conv(x[:, 20 * n :].reshape(B, H // 2, W // 2, C)).reshape(B, n, C)
        return jnp.concatenate([x1, x2, x3], axis=1)


class ConvFFN(nn.Module):
    """fc1 -> multi-scale dwconv -> GELU -> fc2 (reference :474-493)."""

    dim: int
    hidden: int
    hw: Tuple[int, int]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype,
                     kernel_init=trunc_normal_init(0.02), name="fc1")(x)
        x = DWConvMS(dim=self.hidden, hw=self.hw, dtype=self.dtype,
                     name="dwconv")(x)
        x = gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init(0.02), name="fc2")(x)
        return x


class Injector(nn.Module):
    """query(ViT) + gamma * MSDA(query_norm(ViT) <- feat_norm(pyramid))."""

    dim: int
    query_hw: Tuple[int, int]  # ViT token grid (H/16, W/16)
    value_shapes: Tuple[Tuple[int, int], ...]  # pyramid level grids
    num_heads: int = 6
    n_points: int = 4
    deform_ratio: float = 1.0
    init_values: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query, feat):
        n_levels = len(self.value_shapes)
        refs = jnp.asarray(reference_points([self.query_hw]))
        refs = jnp.broadcast_to(
            refs, (1, refs.shape[1], n_levels, 2)
        ).astype(query.dtype)
        q = LayerNorm(eps=1e-6, dtype=self.dtype, name="query_norm")(query)
        f = LayerNorm(eps=1e-6, dtype=self.dtype, name="feat_norm")(feat)
        attn = MSDeformAttention(
            d_model=self.dim, n_levels=n_levels, n_heads=self.num_heads,
            n_points=self.n_points, ratio=self.deform_ratio, dtype=self.dtype,
            name="attn",
        )(q, refs, f, self.value_shapes)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_values), (self.dim,)
        )
        return query + gamma.astype(attn.dtype) * attn


class Extractor(nn.Module):
    """query(pyramid) + MSDA(<- ViT), then ConvFFN with drop-path."""

    dim: int
    query_shapes: Tuple[Tuple[int, int], ...]  # pyramid level grids
    value_shapes: Tuple[Tuple[int, int], ...]  # ViT grid (single level)
    hw: Tuple[int, int]
    num_heads: int = 6
    n_points: int = 4
    deform_ratio: float = 1.0
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    drop_path: float = 0.0
    deterministic: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query, feat):
        n_levels = len(self.value_shapes)
        refs = jnp.asarray(reference_points(self.query_shapes))
        refs = jnp.broadcast_to(
            refs, (1, refs.shape[1], n_levels, 2)
        ).astype(query.dtype)
        q = LayerNorm(eps=1e-6, dtype=self.dtype, name="query_norm")(query)
        f = LayerNorm(eps=1e-6, dtype=self.dtype, name="feat_norm")(feat)
        attn = MSDeformAttention(
            d_model=self.dim, n_levels=n_levels, n_heads=self.num_heads,
            n_points=self.n_points, ratio=self.deform_ratio, dtype=self.dtype,
            name="attn",
        )(q, refs, f, self.value_shapes)
        query = query + attn
        if self.with_cffn:
            y = LayerNorm(eps=1e-6, dtype=self.dtype, name="ffn_norm")(query)
            y = ConvFFN(
                dim=self.dim, hidden=int(self.dim * self.cffn_ratio),
                hw=self.hw, dtype=self.dtype, name="ffn",
            )(y)
            y = DropPath(self.drop_path, name="drop_path")(y, self.deterministic)
            query = query + y
        return query


class SpatialPriorModule(nn.Module):
    """Single-modality conv-stem SPM (reference adapter_modules...:665-726),
    used when only RGB is given: stem (3 convs + maxpool) then 3 stride-2
    conv stages, each BN+ReLU, projected to embed_dim by 1x1 convs."""

    embed_dim: int = 1024
    inplanes: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        from ..nn.layers import ConvNormAct

        def block(feats, k, s, name):
            return ConvNormAct(
                features=feats, kernel_size=(k, k), strides=(s, s),
                padding=1, norm="bn", act="relu", dtype=self.dtype, name=name,
            )

        c1 = block(self.inplanes, 3, 2, "stem1")(x, train=train)
        c1 = block(self.inplanes, 3, 1, "stem2")(c1, train=train)
        c1 = block(self.inplanes, 3, 1, "stem3")(c1, train=train)
        c1 = nn.max_pool(c1, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        c2 = block(2 * self.inplanes, 3, 2, "conv2")(c1, train=train)
        c3 = block(4 * self.inplanes, 3, 2, "conv3")(c2, train=train)
        c4 = block(4 * self.inplanes, 3, 2, "conv4")(c3, train=train)
        outs = []
        for i, f in enumerate((c1, c2, c3, c4)):
            p = nn.Conv(self.embed_dim, (1, 1), use_bias=True,
                        dtype=self.dtype, kernel_init=fan_out_conv_init,
                        name=f"fc{i + 1}")(f)
            B, Hl, Wl, C = p.shape
            # c1 never joins the interaction token stream (only c2..c4
            # do): return it SPATIAL — tokenizing it forced a 134 MB
            # layout copy the backbone immediately undid (r5 HLO audit)
            outs.append(p if i == 0 else p.reshape(B, Hl * Wl, C))
        return tuple(outs)


class SpatialPriorModuleBimodal(nn.Module):
    """TwinConvNeXt + fusion neck + 1x1 projections to ViT width.

    Returns (c1, c2, c3, c4) at strides 4/8/16/32: c1 SPATIAL
    (B, H, W, embed_dim) — it never joins the interaction token stream —
    and c2..c4 as token streams (B, HW_level, embed_dim).
    Reference adapter_modules...:901-1076.
    """

    embed_dim: int = 1024
    conv_inplane: int = 48  # branch stem width / 2 of stage-0 concat
    arch: str = "small"
    conv_drop_path_rate: float = 0.4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_aux, train: bool = False,
                 deterministic: bool = True):
        feats = TwinConvNeXt(
            arch=self.arch,
            drop_path_rate=self.conv_drop_path_rate,
            layer_scale_init_value=1.0,
            dtype=self.dtype,
            name="twin_conv",
        )(x, x_aux, deterministic)
        # concat channels per stage: [2*c0, 2*c1, 2*c2, 2*c3]; configs choose
        # conv_inplane so that these equal [4, 8, 16, 32] * conv_inplane
        in_channels = [f.shape[-1] for f in feats]
        feats = RoadFormer2Neck(
            in_channels=in_channels, dtype=self.dtype, name="smart_fusion",
        )(feats, train=train)
        outs = []
        for i, f in enumerate(feats):
            p = nn.Conv(
                self.embed_dim, (1, 1), use_bias=True, dtype=self.dtype,
                kernel_init=fan_out_conv_init, name=f"fc{i + 1}",
            )(f)
            B, Hl, Wl, C = p.shape
            # c1 spatial, c2..c4 tokens — see SpatialPriorModule
            outs.append(p if i == 0 else p.reshape(B, Hl * Wl, C))
        return tuple(outs)


class InteractionBlock(nn.Module):
    """Injector -> span of SAM ViT blocks -> extractor (+2 extra, last stage).

    Owns its ViT block span (`block_ids` select which global block indices
    this stage covers; each gets its configured window size). Call signature
    is tensor-only so the whole stage is one remat unit.
    """

    dim: int
    hw: Tuple[int, int]  # ViT token grid (H/16, W/16)
    pyramid_shapes: Tuple[Tuple[int, int], ...]
    block_ids: Tuple[int, ...]
    block_windows: Tuple[int, ...]  # per block: 0 = global attention
    vit_num_heads: int = 16
    vit_mlp_ratio: float = 4.0
    vit_input_size: Tuple[int, int] = (64, 64)
    num_heads: int = 6
    n_points: int = 4
    init_values: float = 0.0
    drop_path: float = 0.0
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    deform_ratio: float = 1.0
    extra_extractor: bool = False
    deterministic: bool = True
    remat_blocks: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, c):
        H, W = self.hw
        inj_cls = Injector
        ext_cls = Extractor
        block_cls = ViTBlock
        if self.remat_blocks:
            # nested remat: the stage remat bounds cross-stage liveness, the
            # per-unit remat bounds the backward working set to one block /
            # one deformable-attention call
            block_cls = nn.remat(ViTBlock,
                                 static_argnums=(2, 3))
            inj_cls = nn.remat(Injector)
            ext_cls = nn.remat(Extractor)
        x = inj_cls(
            dim=self.dim, query_hw=self.hw, value_shapes=self.pyramid_shapes,
            num_heads=self.num_heads, n_points=self.n_points,
            deform_ratio=self.deform_ratio, init_values=self.init_values,
            dtype=self.dtype, name="injector",
        )(x, c)
        for bid, win in zip(self.block_ids, self.block_windows):
            x = block_cls(
                dim=self.dim,
                num_heads=self.vit_num_heads,
                mlp_ratio=self.vit_mlp_ratio,
                window_size=win,
                input_size=self.vit_input_size,
                dtype=self.dtype,
                name=f"vit_block_{bid}",
            )(x, H, W)
        ext_kw = dict(
            dim=self.dim, query_shapes=self.pyramid_shapes,
            value_shapes=(self.hw,), hw=self.hw, num_heads=self.num_heads,
            n_points=self.n_points, deform_ratio=self.deform_ratio,
            with_cffn=self.with_cffn, cffn_ratio=self.cffn_ratio,
            drop_path=self.drop_path, deterministic=self.deterministic,
            dtype=self.dtype,
        )
        c = ext_cls(**ext_kw, name="extractor")(c, x)
        if self.extra_extractor:
            for i in range(2):
                c = ext_cls(**ext_kw, name=f"extra_extractor{i}")(c, x)
        return x, c
