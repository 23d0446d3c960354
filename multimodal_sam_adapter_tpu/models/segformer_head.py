"""SegFormer all-MLP decode head.

Re-design of reference mmseg_custom/models/decode_heads/segformer_head.py:
per level 1x1 ConvModule (conv + BN + ReLU) -> bilinear resize to the 1/4
grid -> concat -> 1x1 fusion ConvModule -> dropout -> 1x1 class conv.
BN is global-batch BN (== the reference's SyncBN) under a sharded jit.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import ConvNormAct
from ..utils.interpolate import resize_bilinear


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
            if y.shape[1:3] != target_hw:
                y = resize_bilinear(y, target_hw)
            outs.append(y)
        out = jnp.concatenate(outs, axis=-1)
        out = ConvNormAct(
            features=self.channels, kernel_size=(1, 1), norm="bn", act="relu",
            dtype=self.dtype, name="fusion_conv",
        )(out, train=train)
        if self.dropout_ratio > 0:
            out = nn.Dropout(self.dropout_ratio)(out, deterministic=not train)
        logits = nn.Conv(
            self.num_classes, (1, 1), use_bias=True, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="conv_seg",
        )(out)
        return logits
