"""TwinConvNeXt: two independent ConvNeXt branches (RGB / aux modality).

Re-design of reference mmseg_custom/models/backbones/base/twin_convnext.py:
two weight-independent copies of a ConvNeXt trunk ('small' in all MM-SAM
configs: depths [3,3,27,3], channels [96,192,384,768]), each with its own
4x4 stem, 2x2 downsample layers, per-stage LN2d out-norms; per stage the two
branches' features are channel-concatenated (NHWC) for the fusion neck.

Both branches are initialized from the SAME ImageNet ConvNeXt checkpoint by
the converter (engine/convert.py), mirroring the reference's _x/_y key
rewriting (twin_convnext.py:423-443).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import DropPath, LayerNorm, gelu, trunc_normal_init

CONVNEXT_ARCHS = {
    "atto": {"depths": (2, 2, 6, 2), "channels": (40, 80, 160, 320)},
    "femto": {"depths": (2, 2, 6, 2), "channels": (48, 96, 192, 384)},
    "pico": {"depths": (2, 2, 6, 2), "channels": (64, 128, 256, 512)},
    "nano": {"depths": (2, 2, 8, 2), "channels": (80, 160, 320, 640)},
    "tiny": {"depths": (3, 3, 9, 3), "channels": (96, 192, 384, 768)},
    "small": {"depths": (3, 3, 27, 3), "channels": (96, 192, 384, 768)},
    "base": {"depths": (3, 3, 27, 3), "channels": (128, 256, 512, 1024)},
    "large": {"depths": (3, 3, 27, 3), "channels": (192, 384, 768, 1536)},
    "xlarge": {"depths": (3, 3, 27, 3), "channels": (256, 512, 1024, 2048)},
    "huge": {"depths": (3, 3, 27, 3), "channels": (352, 704, 1408, 2816)},
}


class ConvNeXtBlock(nn.Module):
    """DwConv7x7 -> LN -> Linear(4x) -> GELU -> Linear -> gamma -> droppath.

    NHWC makes the torch channel-permute dance a no-op; the pointwise convs
    are Dense layers straight on the trailing axis (the 'linear_pw_conv'
    variant the reference uses).
    """

    channels: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    impl: str = "auto"  # 'xla' | 'fused' | 'auto' (fused Pallas on TPU)
    dtype: Optional[jnp.dtype] = None

    def _use_fused(self, x) -> bool:
        # measured NEGATIVE on v5e (scripts/tpu_convnext_fused_probe.py +
        # full-model bench, docs/DESIGN.md round-3): fused was only at
        # parity in isolation at stage-3 geometry (0.207 vs 0.203
        # ms/block), WORSE at stage-4 (0.122 vs 0.075), and regressed the
        # full flagship forward 9.10 -> 8.75 img/s when auto-gated to
        # stage 3. XLA's conv+LN+MLP pipeline already overlaps these ops
        # across blocks; the single-grid-step kernel serializes them. Kept
        # as an explicit opt-in only.
        return self.impl == "fused" and self.layer_scale_init_value > 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shortcut = x
        conv = nn.Conv(
            self.channels,
            kernel_size=(7, 7),
            padding=[(3, 3), (3, 3)],
            feature_group_count=self.channels,
            dtype=self.dtype,
            kernel_init=trunc_normal_init(0.02),
            name="dwconv",
        )
        norm = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm")
        fc1 = nn.Dense(
            int(self.mlp_ratio * self.channels),
            dtype=self.dtype,
            kernel_init=trunc_normal_init(0.02),
            name="pwconv1",
        )
        fc2 = nn.Dense(
            self.channels,
            dtype=self.dtype,
            kernel_init=trunc_normal_init(0.02),
            name="pwconv2",
        )
        if self._use_fused(x):
            from ..ops.convnext_block import convnext_block_fused

            # create the IDENTICAL param tree by tracing the submodules on
            # a tiny slice (flax creates params at first call; shapes only
            # depend on the channel dim), then hand the weights to the
            # fused kernel — checkpoints/converter stay impl-agnostic
            # shapes only depend on the channel dim; guard tiny inputs
            probe = x[:1, : min(8, x.shape[1]), : min(8, x.shape[2]), :]
            _ = fc2(fc1(norm(conv(probe))))
            p = {name: m.variables["params"]
                 for name, m in (("dw", conv), ("norm", norm),
                                 ("fc1", fc1), ("fc2", fc2))}
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.channels,),
            )
            delta = convnext_block_fused(
                x,
                p["dw"]["kernel"], p["dw"]["bias"],
                p["norm"]["ln"]["scale"], p["norm"]["ln"]["bias"],
                p["fc1"]["kernel"], p["fc1"]["bias"],
                p["fc2"]["kernel"], p["fc2"]["bias"],
                gamma,
            )
            delta = DropPath(self.drop_path_rate, name="drop_path")(
                delta, deterministic)
            return shortcut + delta
        x = conv(x)
        x = norm(x)
        x = fc1(x)
        x = gelu(x)
        x = fc2(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.channels,),
            )
            x = x * gamma.astype(x.dtype)
        x = DropPath(self.drop_path_rate, name="drop_path")(x, deterministic)
        return shortcut + x


class _ConvNeXtBranch(nn.Module):
    """One ConvNeXt trunk returning per-stage LN2d-normalized features."""

    depths: Sequence[int]
    channels: Sequence[int]
    stem_patch_size: int = 4
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1.0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        total = sum(self.depths)
        dpr = [
            self.drop_path_rate * i / max(total - 1, 1) for i in range(total)
        ]
        outs = []
        block_idx = 0
        for i, (depth, ch) in enumerate(zip(self.depths, self.channels)):
            if i == 0:
                from .sam_vit import PatchifyDense

                x = PatchifyDense(
                    features=ch, patch=self.stem_patch_size,
                    dtype=self.dtype, name="stem_conv",
                )(x)
                x = LayerNorm(eps=1e-6, dtype=self.dtype, name="stem_norm")(x)
            else:
                x = LayerNorm(eps=1e-6, dtype=self.dtype, name=f"down_norm{i}")(x)
                x = nn.Conv(
                    ch,
                    kernel_size=(2, 2),
                    strides=(2, 2),
                    dtype=self.dtype,
                    kernel_init=trunc_normal_init(0.02),
                    name=f"down_conv{i}",
                )(x)
            for j in range(depth):
                x = ConvNeXtBlock(
                    channels=ch,
                    drop_path_rate=dpr[block_idx + j],
                    layer_scale_init_value=self.layer_scale_init_value,
                    dtype=self.dtype,
                    name=f"stage{i}_block{j}",
                )(x, deterministic)
            block_idx += depth
            if i in self.out_indices:
                outs.append(
                    LayerNorm(eps=1e-6, dtype=self.dtype, name=f"out_norm{i}")(x)
                )
        return outs


class TwinConvNeXt(nn.Module):
    """Dual-branch ConvNeXt; per-stage concat(rgb, aux) along channels."""

    arch: str = "small"
    stem_patch_size: int = 4
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1.0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, y, deterministic: bool = True) -> List[jnp.ndarray]:
        cfg = CONVNEXT_ARCHS[self.arch]
        kw = dict(
            depths=cfg["depths"],
            channels=cfg["channels"],
            stem_patch_size=self.stem_patch_size,
            drop_path_rate=self.drop_path_rate,
            layer_scale_init_value=self.layer_scale_init_value,
            out_indices=self.out_indices,
            dtype=self.dtype,
        )
        outs_x = _ConvNeXtBranch(**kw, name="branch_x")(x, deterministic)
        outs_y = _ConvNeXtBranch(**kw, name="branch_y")(y, deterministic)
        return [
            jnp.concatenate([ox, oy], axis=-1) for ox, oy in zip(outs_x, outs_y)
        ]
