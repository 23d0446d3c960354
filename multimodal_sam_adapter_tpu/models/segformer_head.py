"""SegFormer all-MLP decode head.

Re-design of reference mmseg_custom/models/decode_heads/segformer_head.py:
per level 1x1 ConvModule (conv + BN + ReLU) -> bilinear resize to the 1/4
grid -> concat -> 1x1 fusion ConvModule -> dropout -> 1x1 class conv.
BN is global-batch BN (== the reference's SyncBN) under a sharded jit.

TPU shape of the fusion stage: a 1x1 conv is per-pixel-linear and bilinear
resize is spatial-linear, so conv(concat(resize(y_i))) ==
sum_i resize(conv_i(y_i)) with conv_i the kernel's channel slices. The
distributed form never materializes the (B, H/4, W/4, 4*channels) concat
(256 MB at 1024^2 — the trace showed 0.73 ms of concat+relu padding plus a
1.48 ms full-res fusion matmul) and runs 3 of the 4 slice-convs at their
level's native resolution (64x fewer MACs at stride 32). The BN input is
bit-identical in exact arithmetic, so train-mode stats are unchanged.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import BatchNorm, ConvNormAct
from ..utils.interpolate import resize_bilinear


class _FusionKernel(nn.Module):
    """Param holder named 'conv' so the tree matches ConvNormAct's
    fusion_conv/conv/kernel — checkpoints are layout-agnostic."""

    in_ch: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.in_ch, self.features),
        )


class _DistributedFusion(nn.Module):
    """conv+BN+ReLU over concat(resize(y_i)) computed distributed; the
    param tree is identical to ConvNormAct (conv/kernel, norm/bn/...)."""

    channels: int
    n_inputs: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, outs, target_hw, train: bool = False):
        kern = _FusionKernel(
            in_ch=self.channels * self.n_inputs, features=self.channels,
            name="conv",
        )()[0, 0]
        if self.dtype is not None:
            kern = kern.astype(self.dtype)
        out = None
        for i, y in enumerate(outs):
            u = y @ kern[i * self.channels:(i + 1) * self.channels]
            if u.shape[1:3] != target_hw:
                u = resize_bilinear(u, target_hw)
            out = u if out is None else out + u
        out = BatchNorm(dtype=self.dtype, name="norm")(out, train=train)
        return nn.relu(out)


class SegformerHead(nn.Module):
    num_classes: int
    channels: int = 512
    dropout_ratio: float = 0.1
    align_corners: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        """inputs: 4 NHWC feature maps at strides 4/8/16/32 -> logits NHWC
        at stride 4."""
        target_hw = inputs[0].shape[1:3]
        outs = []
        for i, x in enumerate(inputs):
            y = ConvNormAct(
                features=self.channels, kernel_size=(1, 1), norm="bn",
                act="relu", dtype=self.dtype, name=f"convs_{i}",
            )(x, train=train)
            outs.append(y)
        out = _DistributedFusion(
            channels=self.channels, n_inputs=len(outs), dtype=self.dtype,
            name="fusion_conv",
        )(outs, target_hw, train=train)
        if self.dropout_ratio > 0:
            out = nn.Dropout(self.dropout_ratio)(out, deterministic=not train)
        logits = nn.Conv(
            self.num_classes, (1, 1), use_bias=True, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="conv_seg",
        )(out)
        return logits
