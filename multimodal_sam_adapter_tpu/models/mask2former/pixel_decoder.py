"""MSDeformAttn pixel decoder (reference
mmseg_custom/models/plugins/msdeformattn_pixel_decoder.py:16).

Takes the 4-level backbone pyramid (strides 4/8/16/32); runs a deformable-
attention transformer encoder over the 3 coarse levels (this reuses the
same MSDeformAttention op as the adapter — one kernel, two subsystems), then
FPN-fuses the result top-down into the stride-4 level to produce
mask_features plus the multi-scale memories for the transformer decoder.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import GroupNorm, LayerNorm
from ...ops.msda import MSDeformAttention
from ...utils.interpolate import resize_bilinear
from ..adapter import reference_points
from .positional_encoding import sine_positional_encoding


class DeformableEncoderLayer(nn.Module):
    dim: int = 256
    num_heads: int = 8
    n_points: int = 4
    n_levels: int = 3
    ffn_dim: int = 1024
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, pos, ref_points, spatial_shapes):
        # query_pos semantics (mmcv MultiScaleDeformableAttention, used by
        # reference msdeformattn_pixel_decoder.py:230-243): the sine+level
        # embedding is added to the QUERY at every layer (drives sampling
        # offsets/attention weights) but never to the value path or the
        # residual.
        attn = MSDeformAttention(
            d_model=self.dim, n_levels=self.n_levels, n_heads=self.num_heads,
            n_points=self.n_points, dtype=self.dtype, name="self_attn",
        )(x + pos, ref_points, x, spatial_shapes)
        x = LayerNorm(eps=1e-5, dtype=self.dtype, name="norm1")(x + attn)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(y)
        x = LayerNorm(eps=1e-5, dtype=self.dtype, name="norm2")(x + y)
        return x


class MSDeformAttnPixelDecoder(nn.Module):
    feat_channels: int = 256
    num_encoder_layers: int = 6
    num_heads: int = 8
    n_points: int = 4
    num_outs: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        """feats: 4 NHWC maps, strides 4/8/16/32 ->
        (mask_features (B, H/4, W/4, C), multi_scale [stride32, 16, 8])."""
        C = self.feat_channels
        B = feats[0].shape[0]
        # encoder over the 3 coarse levels (finest last, reference ordering
        # uses stride 32 -> 8)
        enc_feats = feats[1:][::-1]  # [32?, ...] actually [8,16,32] -> rev
        enc_feats = [feats[3], feats[2], feats[1]]
        shapes = tuple((f.shape[1], f.shape[2]) for f in enc_feats)
        lvl = self.param(
            "level_encoding", nn.initializers.normal(1.0), (3, C)
        )
        tokens = []
        pos_tokens = []
        for i, f in enumerate(enc_feats):
            t = nn.Conv(C, (1, 1), dtype=self.dtype, name=f"input_conv{i}")(f)
            t = GroupNorm(num_groups=32, dtype=self.dtype,
                          name=f"input_norm{i}")(t)
            h, w = f.shape[1], f.shape[2]
            pos = sine_positional_encoding(h, w, C // 2, dtype=t.dtype)
            pos = pos[None] + lvl[i].astype(t.dtype)
            tokens.append(t.reshape(B, h * w, C))
            pos_tokens.append(jnp.broadcast_to(pos, t.shape).reshape(
                B, h * w, C))
        x = jnp.concatenate(tokens, axis=1)
        # per-layer query_pos (reference passes query_pos to every encoder
        # layer; the value/residual paths stay positional-encoding-free)
        p = jnp.concatenate(pos_tokens, axis=1)
        refs = jnp.asarray(reference_points(shapes)).astype(x.dtype)
        refs = jnp.broadcast_to(refs, (1, refs.shape[1], len(shapes), 2))
        for i in range(self.num_encoder_layers):
            x = DeformableEncoderLayer(
                dim=C, num_heads=self.num_heads, n_points=self.n_points,
                n_levels=len(shapes), dtype=self.dtype, name=f"encoder{i}",
            )(x, p, refs, shapes)

        # split back to levels
        outs = []
        start = 0
        for (h, w) in shapes:
            outs.append(x[:, start : start + h * w].reshape(B, h, w, C))
            start += h * w
        # top-down FPN into stride-4 (reference ConvModule with norm_cfg=GN
        # -> conv bias disabled, msdeformattn_pixel_decoder.py:105-127)
        y = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype,
                    name="lateral4")(feats[0])
        y = GroupNorm(num_groups=32, dtype=self.dtype, name="lateral4_norm")(y)
        up = resize_bilinear(outs[-1], y.shape[1:3])  # stride8 -> 4
        y = y + up
        y = nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="output4")(y)
        y = GroupNorm(num_groups=32, dtype=self.dtype, name="output4_norm")(y)
        y = nn.relu(y)
        mask_features = nn.Conv(C, (1, 1), dtype=self.dtype,
                                name="mask_feature")(y)
        return mask_features, outs[: self.num_outs]
