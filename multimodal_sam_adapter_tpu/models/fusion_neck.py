"""RoadFormer2-style cross-modal fusion neck (NHWC, flax).

Re-design of the neck in reference
mmseg_custom/models/backbones/adapter_modules_multimodal_mix_mod_new_in_twin_convnext_new_with_cp.py:62-434.
Per pyramid level, the twin-branch concat feature is split back into RGB/aux
halves; each half goes through a global channel-attention encoder (GFE) and
a MobileNetV2-style local encoder; the global halves are fused by a
bidirectional cross-modal channel attention (GFFM) and recalibrated (FFRM);
local halves pass a gated-dwconv MLP; the two paths blend via learnable
scalars (Scale2) and a coordinate attention (CA) finishes each level.

All attention here is *channel* attention (CxC matrices) — tiny matmuls that
XLA maps straight onto the MXU; the spatial extent only enters GFFM's
LayerNorm over H*W (so the neck is tied to a static feature scale, as in the
reference where `img_scale` fixes `num_feats`).
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import (BatchNorm, GroupNorm, LayerNorm, Scale, Scale2, gelu,
                         _LNCore, h_swish)


class _GroupedKernel(nn.Module):
    """Bare grouped-conv kernel param (reference layout (kh, kw, Cin/G,
    Cout)) — lets callers compose kernels while keeping the checkpoint
    param tree (<name>/kernel) identical to a conv module's."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class GroupedConvDense(nn.Module):
    """Grouped conv executed as a block-diagonal DENSE conv.

    XLA-TPU lowers grouped convs with few channels per group (here 32 groups
    of 3..12 channels) into many tiny convs — measured as the fusion neck's
    dominant cost. A dense conv whose kernel is the grouped kernel scattered
    onto a block-diagonal full kernel does ~G x more MACs but runs as ONE
    MXU-shaped conv; at these sizes the dense FLOPs are negligible while the
    wall-clock improves by an order of magnitude. Parameters keep the grouped
    (kh, kw, Cin/G, Cout) shape for checkpoint parity.
    """

    features: int
    kernel_size: Tuple[int, int]
    groups: int
    padding: int = 0
    use_bias: bool = False
    kernel_override: Optional[jnp.ndarray] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        Cin = x.shape[-1]
        kh, kw = self.kernel_size
        G = self.groups
        if self.kernel_override is not None:
            kernel = self.kernel_override
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (kh, kw, Cin // G, self.features),
            )
        cin_g = Cin // G
        cout_g = self.features // G
        pad = [(self.padding, self.padding)] * 2
        H, W = x.shape[1:3]
        # at small spatial extents, a chunked expansion wins: split the
        # block-diagonal into fgc chunks of K=288 output channels (multi-
        # group blocks), cutting MACs by C/K while each chunk stays
        # MXU-sized. Measured (tpu_neck_chunk_probe, v5e): 32x32 x 2304ch
        # 3x3 G32: 0.36 ms chunked vs 0.79 dense; at >=64x64 dense wins.
        K = 288
        if (H * W <= 1024 and self.features % K == 0 and K % cout_g == 0
                and self.features > K):
            gpc = K // cout_g
            fgc = self.features // K
            kin = gpc * cin_g
            krc = kernel.reshape(kh, kw, cin_g, fgc, gpc, cout_g)
            eyec = jnp.eye(gpc, dtype=kernel.dtype)
            kc = jnp.einsum("hwifxo,gx->hwgifxo", krc, eyec)
            kc = kc.reshape(kh, kw, kin, self.features)
            if self.dtype is not None:
                kc = kc.astype(self.dtype)
                x = x.astype(self.dtype)
            out = jax.lax.conv_general_dilated(
                x, kc, (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=fgc,
            )
            if self.use_bias:
                out = out + self.param(
                    "bias", nn.initializers.zeros, (self.features,)
                ).astype(out.dtype)
            return out
        # vectorized block-diagonal expansion: scatter each group's
        # (cin_g, cout_g) block onto the (Cin, Cout) diagonal
        kr = kernel.reshape(kh, kw, cin_g, G, cout_g)
        eye = jnp.eye(G, dtype=kernel.dtype)
        dense = jnp.einsum("hwixo,gx->hwgixo", kr, eye)
        dense = dense.reshape(kh, kw, Cin, self.features)
        if self.dtype is not None:
            dense = dense.astype(self.dtype)
            x = x.astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            x, dense, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.features,)
            ).astype(out.dtype)
        return out


class ChannelAttention(nn.Module):
    """AttentionBase (reference :72-106): transposed (channel) attention.

    qkv via grouped 1x1 then grouped 3x3 convs; per head, q/k are
    L2-normalized over the spatial axis and attention is (C/head x C/head).
    Residual is applied with a learnable scalar (scale2).
    """

    dim: int
    num_heads: int = 8
    groups: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # The reference computes qkv2(qkv1(x)) with NO bias or nonlinearity
        # between the two grouped convs (adapter_modules...:84-89,
        # qkv_bias=False) — so they compose EXACTLY into one grouped 3x3
        # conv whose per-group kernel is k1 @ k2. One composed conv does
        # dim*3dim*9 dense-expanded MACs instead of (dim*3dim + 9*(3dim)^2):
        # ~3x fewer at the shipped widths, and one conv launch instead of
        # two. Params keep the reference qkv1/qkv2 shapes.
        G = self.groups
        cg1 = self.dim // G
        ocg = self.dim * 3 // G
        k1 = _GroupedKernel((1, 1, cg1, self.dim * 3), name="qkv1")()
        k2 = _GroupedKernel((3, 3, ocg, self.dim * 3), name="qkv2")()
        k1r = k1.reshape(cg1, G, ocg)                 # (i, g, m)
        k2r = k2.reshape(3, 3, ocg, G, ocg)           # (kh, kw, m, g, o)
        kc = jnp.einsum("igm,hwmgo->hwigo", k1r, k2r)
        kc = kc.reshape(3, 3, cg1, self.dim * 3)      # grouped composite
        qkv = GroupedConvDense(
            self.dim * 3, (3, 3), groups=G, padding=1,
            dtype=self.dtype, kernel_override=kc, name="qkv12",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            # (B, H, W, C) -> (B, heads, C/heads, HW)
            t = t.reshape(B, H * W, self.num_heads, C // self.num_heads)
            return t.transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        scale = self.param("scale", nn.initializers.ones, (self.num_heads, 1, 1))
        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * scale.astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn.astype(v.dtype), v)
        out = out.transpose(0, 3, 1, 2).reshape(B, H, W, C)
        out = nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                      name="proj")(out)
        scale2 = self.param("scale2", nn.initializers.ones, ())
        return x + out * scale2.astype(x.dtype)


class GFE(nn.Module):
    """Global feature encoder: x + ChannelAttention(RestormerLN(x))."""

    dim: int
    num_heads: int = 8
    groups: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = _LNCore(eps=1e-5, use_bias=True, use_scale=True,
                    dtype=self.dtype, name="norm1")(x)
        y = ChannelAttention(
            dim=self.dim, num_heads=self.num_heads, groups=self.groups,
            dtype=self.dtype, name="attn",
        )(y)
        return x + y


class PairedDWConv(nn.Module):
    """Grouped 3x3 conv with 2 channels per group (Cin = Cout = 2G), executed
    as FOUR true depthwise convs (XLA's optimized depthwise path) instead of
    a block-diagonal dense conv whose expanded kernel would be huge at wide
    levels. Group g: out[2g+o] = sum_i dw_{i,o}(x[2g+i]).
    Parameter keeps the grouped (kh, kw, 2, 2G) layout for checkpoint parity.
    """

    features: int  # = 2G
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        G = C // 2
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 2, C)
        )
        k = kernel.reshape(3, 3, 2, G, 2)  # (kh, kw, ci, g, co)
        if self.dtype is not None:
            k = k.astype(self.dtype)
        xr = x.reshape(B, H, W, G, 2)
        xs = [xr[..., 0], xr[..., 1]]  # each (B, H, W, G)
        outs = []
        for co in range(2):
            acc = None
            for ci in range(2):
                dw = jax.lax.conv_general_dilated(
                    xs[ci], k[:, :, ci, :, co][..., None, :],
                    (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=G,
                )
                acc = dw if acc is None else acc + dw
            outs.append(acc)
        return jnp.stack(outs, axis=-1).reshape(B, H, W, C)


class GatedDWConvMlp(nn.Module):
    """Mlp (reference :107-129): 1x1 expand(2x hidden) -> dwconv 3x3 (2 ch per
    group) -> gelu(x1)*x2 gate -> 1x1 project.

    The expand + dwconv run as two independent half-branches (gate = output
    channels [0:hidden], val = [hidden:2*hidden]) instead of one 2*hidden
    conv + split. Identical math — the dwconv's 2-ch groups (2g, 2g+1) never
    straddle the contiguous halves — but on TPU the stage-4 monolithic
    (1536 -> 3072) kernel is a 9.4 MB parameter that XLA's memory-space
    assignment prefetches into VMEM with a measured ~24 ms/forward
    device-idle stall (two starved copies of one giant weight); two 4.7 MB
    half-weights with separate consumers schedule cleanly, and the halved
    dots are also faster on the MXU (0.018 vs 0.053 ms isolated). Checkpoint
    conversion slices the reference's fused project_in/dwconv weights
    (engine/convert_full.py)."""

    in_features: int
    ffn_expansion_factor: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        hidden = int(self.in_features * self.ffn_expansion_factor)
        # the gate/val half-split is only math-identical to the reference's
        # fused (2*hidden) conv when no dwconv 2-ch group straddles the
        # halves, i.e. hidden must be even (all shipped configs: factor 1.0,
        # even channels)
        assert hidden % 2 == 0, (
            f"GatedDWConvMlp requires even hidden dim for the half-split "
            f"rewrite, got {hidden}")
        g = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_in_gate")(x)
        g = PairedDWConv(hidden, dtype=self.dtype, name="dwconv_gate")(g)
        v = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_in_val")(x)
        v = PairedDWConv(hidden, dtype=self.dtype, name="dwconv_val")(v)
        x = gelu(g) * v
        return nn.Conv(self.in_features, (1, 1), use_bias=False,
                       dtype=self.dtype, name="project_out")(x)


class MobileNetV2Block(nn.Module):
    """Local encoder (reference :313-334): inverted bottleneck scaled by a
    zero-init scalar, residual."""

    channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        hidden = self.channels * 2
        y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                    name="expand")(x)
        y = jnp.clip(y, 0.0, 6.0)
        y = nn.Conv(hidden, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=hidden, use_bias=False,
                    dtype=self.dtype, name="dw")(y)
        y = jnp.clip(y, 0.0, 6.0)
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(y)
        s = self.param("scale", nn.initializers.zeros, ())
        return y * s.astype(x.dtype) + x


class GFFM(nn.Module):
    """Heterogeneous fusion (reference :259-299): bidirectional cross-modal
    channel attention with zero-init residual scales, then LayerNorm over the
    flattened spatial axis (weight shape = H*W, tied to feat_scale)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xy):
        B, H, W, C2 = xy.shape
        C = C2 // 2
        x, y = jnp.split(xy, 2, axis=-1)
        # (B, C, HW)
        fx = x.reshape(B, H * W, C).transpose(0, 2, 1)
        fy = y.reshape(B, H * W, C).transpose(0, 2, 1)
        ex = jnp.einsum("bcn,bdn->bcd", fx, fy, preferred_element_type=jnp.float32)
        ey = jnp.einsum("bcn,bdn->bcd", fy, fx, preferred_element_type=jnp.float32)
        ax = jax.nn.softmax(ex, axis=-1).astype(fy.dtype)
        ay = jax.nn.softmax(ey, axis=-1).astype(fx.dtype)
        outx = jnp.einsum("bcd,bdn->bcn", ax, fy)
        outy = jnp.einsum("bcd,bdn->bcn", ay, fx)
        outx = Scale(0.0, name="gammax")(outx) + fx
        outy = Scale(0.0, name="gammay")(outy) + fy
        out = jnp.concatenate([outx, outy], axis=1)  # (B, 2C, HW)
        out = _LNCore(eps=1e-5, use_bias=True, use_scale=True,
                      dtype=self.dtype, name="norm")(out)
        return out.transpose(0, 2, 1).reshape(B, H, W, C2)


class FFRM(nn.Module):
    """Fused feature recalibration (reference :153-177): squeeze-excite with
    conv+GN+ReLU on the pooled vector, sigmoid gate, residual add."""

    channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        a = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_atten")(pooled)
        a = GroupNorm(num_groups=math.gcd(32, self.channels),
                      dtype=self.dtype, name="norm")(a)
        a = nn.relu(a)
        a = nn.sigmoid(a)
        return x + x * a


class CoordinateAttention(nn.Module):
    """CA block (reference :191-246): pooled-axis attention with h-swish."""

    channels: int
    reduction: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        mip = max(8, self.channels // self.reduction)
        x_h = jnp.mean(x, axis=2)  # (B, H, C) — pool over W
        x_w = jnp.mean(x, axis=1)  # (B, W, C) — pool over H
        y = jnp.concatenate([x_h, x_w], axis=1)[:, :, None, :]  # (B, H+W, 1, C)
        y = nn.Conv(mip, (1, 1), dtype=self.dtype, name="conv1")(y)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, train=train)
        y = h_swish(y)
        a_h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="conv_h")(
            y[:, :H]
        )  # (B, H, 1, C)
        a_w = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="conv_w")(
            y[:, H:]
        )  # (B, W, 1, C)
        a_h = nn.sigmoid(a_h).reshape(B, H, 1, C)
        a_w = nn.sigmoid(a_w).reshape(B, 1, W, C)
        return x + x * a_w * a_h


class RoadFormer2Neck(nn.Module):
    """Per-level fusion of twin-branch pyramid features (reference :336-434)."""

    in_channels: Sequence[int]  # per-level concat channels (2x branch width)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        assert len(feats) == len(self.in_channels)
        outs = []
        for i, feat in enumerate(feats):
            ch = self.in_channels[i]
            half = ch // 2
            rgb, sne = jnp.split(feat, 2, axis=-1)
            # groups=32 in all shipped configs (channels are multiples of
            # 32); gcd keeps tiny test configs valid
            groups = math.gcd(32, half)
            rgb_g = GFE(dim=half, num_heads=8, groups=groups, dtype=self.dtype,
                        name=f"gfe_rgb{i}")(rgb)
            sne_g = GFE(dim=half, num_heads=8, groups=groups, dtype=self.dtype,
                        name=f"gfe_sne{i}")(sne)
            rgb_l = MobileNetV2Block(channels=half, dtype=self.dtype,
                                     name=f"local_rgb{i}")(rgb)
            sne_l = MobileNetV2Block(channels=half, dtype=self.dtype,
                                     name=f"local_sne{i}")(sne)
            g = jnp.concatenate([rgb_g, sne_g], axis=-1)
            l = jnp.concatenate([rgb_l, sne_l], axis=-1)
            g = GFFM(dtype=self.dtype, name=f"fuse{i}")(g)
            l = GatedDWConvMlp(in_features=ch, ffn_expansion_factor=1.0,
                               dtype=self.dtype, name=f"detail{i}")(l)
            g = FFRM(channels=ch, dtype=self.dtype, name=f"enhance{i}")(g)
            merged = Scale2(name=f"blend{i}")(g, l)
            merged = CoordinateAttention(channels=ch, dtype=self.dtype,
                                         name=f"ca{i}")(merged, train=train)
            outs.append(merged)
        return outs
