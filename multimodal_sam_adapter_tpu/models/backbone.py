"""SAMAdapterBimodal: SAM ViT-L wrapped with the multimodal adapter.

Re-design of reference
mmseg_custom/models/backbones/image_encoder_adapter_bimodal_mix_mod_new_in_twin_convnext_new_with_cp.py:27-350.

Forward contract: input (B, H, W, 3 + aux_ch) NHWC; split RGB / aux; SPM
produces pyramid tokens c1..c4; ViT patch-embed + bicubically resized
pos-embed; 4 interaction stages {inject -> 6 SAM blocks -> extract}; pyramid
reassembly (transposed-conv upsample of c2 into c1, bilinear-scaled ViT
features added per level), 4 final BatchNorms (SyncBN == global-batch BN
under a sharded jit). Returns [f1, f2, f3, f4] NHWC at strides 4/8/16/32,
each `embed_dim` channels.

Memory: each interaction stage (its 6 ViT blocks + injector/extractor) is
one `nn.remat` unit when training (the reference's `with_cp=True`), bounding
activation memory to ~1 stage.
"""
from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import BatchNorm, fan_out_conv_init
from ..utils.interpolate import resize_bicubic, resize_bilinear
from .adapter import InteractionBlock, SpatialPriorModuleBimodal
from .sam_vit import PatchEmbed


class PixelShuffleUp(nn.Module):
    """2x2-stride-2 transposed conv as one MXU dot + depth-to-space.

    Math-identical to `nn.ConvTranspose(C, (2,2), strides=(2,2))`, verified
    in tests/test_backbone_up.py. XLA lowers the 2x2 ConvTranspose at
    128x128x1024 into dilated-conv form with multi-ten-MB relayout copies;
    the dot + one interleave transpose keeps the whole op on the MXU.

    The kernel param is stored DOT-READY as (C, 2, 2, O) — equal to the
    flax ConvTranspose kernel spatially flipped then axis-moved, which for
    stride==kernel_size is simply torch's ConvTranspose2d (I, O, kh, kw)
    weight transposed (0, 2, 3, 1) (flips cancel; engine/convert_full.py).
    Storing it pre-transposed matters on this runtime: computing the
    flip+transpose+cast at use-point materialized an 8 MB weight copy the
    device stalled ~12 ms on per (unscanned) forward (r3 xplane trace)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, fuse_add_bn=None):
        B, H, W, C = x.shape
        O = self.features

        def init(key, shape, dtype=jnp.float32):
            # reference _init_weights for ConvTranspose2d: N(0, sqrt(2 /
            # (kh*kw*out_ch))) iid — drawable directly in this layout
            return jax.random.normal(key, shape, dtype) * math.sqrt(
                2.0 / (2 * 2 * O))

        kernel = self.param("kernel", init, (C, 2, 2, O), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (O,), jnp.float32)
        dt = self.dtype or x.dtype
        if fuse_add_bn is not None:
            # fused inference epilogue (ops/pixel_shuffle.py): the caller
            # passes (c1, x1, bn_scale, bn_shift, interpret); the conv
            # bias folds into the BN shift (shift + bias*scale) so the
            # kernel epilogue is a single affine
            from ..ops.pixel_shuffle import pixel_shuffle_up_bn

            c1, x1, s, t, interpret = fuse_add_bn
            t2 = t + bias.astype(jnp.float32) * s
            return pixel_shuffle_up_bn(
                x, kernel.astype(dt), c1, x1, s, t2, interpret=interpret)
        w = kernel.reshape(C, 4 * O).astype(dt)
        y = (x.reshape(B * H * W, C) @ w).reshape(B, H, W, 2, 2, O)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(B, 2 * H, 2 * W, O)
        return y + bias.astype(dt)


class SAMAdapterBimodal(nn.Module):
    """Top-level multimodal backbone (reference registry name:
    SAMAdapterbimodalMixModNewInTwinConvNEW[withcp])."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.3
    conv_drop_path_rate: float = 0.4
    drop_rate: float = 0.0
    conv_inplane: int = 48
    n_points: int = 4
    deform_num_heads: int = 16
    init_values: float = 1e-6
    cffn_ratio: float = 0.25
    deform_ratio: float = 0.5
    with_cffn: bool = True
    use_extra_extractor: bool = True
    add_vit_feature: bool = True
    interaction_indexes: Tuple[Tuple[int, int], ...] = (
        (0, 5), (6, 11), (12, 17), (18, 23),
    )
    global_attn_indexes: Tuple[int, ...] = (5, 11, 17, 23)
    window_size: int = 14
    pretrained_size: int = 1024
    modalities_ch: Tuple[int, ...] = (3, 3)
    arch: str = "small"
    with_cp: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        rgb_ch = self.modalities_ch[0]
        x_rgb = x[..., :rgb_ch]
        x_aux = x[..., rgb_ch:]
        B, H_img, W_img, _ = x.shape
        deterministic = not train

        # ---- spatial prior -> pyramid tokens: twin ConvNeXt + fusion neck
        # for multimodal inputs; plain conv-stem SPM when only RGB is given.
        # The SPM is its own remat unit under with_cp: its ConvNeXt/neck
        # internals hold ~0.5 GB of residuals at 1024^2 otherwise, and the
        # recompute (~26 ms) is cheap next to the interaction stages.
        remat_spm = self.with_cp and train
        if len(self.modalities_ch) > 1:
            spm_cls = SpatialPriorModuleBimodal
            if remat_spm:
                spm_cls = nn.remat(spm_cls,
                                   static_argnums=(3, 4))
            c1, c2, c3, c4 = spm_cls(
                embed_dim=self.embed_dim,
                conv_inplane=self.conv_inplane,
                arch=self.arch,
                conv_drop_path_rate=self.conv_drop_path_rate,
                dtype=self.dtype,
                name="spm",
            )(x_rgb, x_aux, train, deterministic)
        else:
            from .adapter import SpatialPriorModule

            spm_cls = SpatialPriorModule
            if remat_spm:
                spm_cls = nn.remat(spm_cls,
                                   static_argnums=(2, 3))
            c1, c2, c3, c4 = spm_cls(
                embed_dim=self.embed_dim,
                inplanes=self.conv_inplane,
                dtype=self.dtype,
                name="spm",
            )(x_rgb, train, deterministic)

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (3, self.embed_dim)
        )
        c2 = c2 + level_embed[0].astype(c2.dtype)
        c3 = c3 + level_embed[1].astype(c3.dtype)
        c4 = c4 + level_embed[2].astype(c4.dtype)
        c = jnp.concatenate([c2, c3, c4], axis=1)
        n2, n3 = c2.shape[1], c3.shape[1]

        # ---- ViT stream
        tokens, H, W = PatchEmbed(
            embed_dim=self.embed_dim, patch_size=self.patch_size,
            dtype=self.dtype, name="patch_embed",
        )(x_rgb)
        grid = self.pretrained_size // self.patch_size
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, grid, grid, self.embed_dim)
        )
        if (grid, grid) != (H, W):
            pos = resize_bicubic(pos, (H, W))
        tokens = tokens + pos.reshape(1, H * W, self.embed_dim).astype(tokens.dtype)
        if self.drop_rate > 0:
            tokens = nn.Dropout(self.drop_rate)(tokens, deterministic=deterministic)

        pyr_shapes = (
            (H_img // 8, W_img // 8),
            (H_img // 16, W_img // 16),
            (H_img // 32, W_img // 32),
        )

        stage_cls = InteractionBlock
        if self.with_cp and train:
            stage_cls = nn.remat(InteractionBlock)

        outs = []
        xt = tokens
        for si, span in enumerate(self.interaction_indexes):
            block_ids = tuple(range(span[0], span[-1] + 1))
            block_windows = tuple(
                0 if i in self.global_attn_indexes else self.window_size
                for i in block_ids
            )
            xt, c = stage_cls(
                dim=self.embed_dim,
                hw=(H, W),
                pyramid_shapes=pyr_shapes,
                block_ids=block_ids,
                block_windows=block_windows,
                vit_num_heads=self.num_heads,
                vit_mlp_ratio=self.mlp_ratio,
                vit_input_size=(grid, grid),
                num_heads=self.deform_num_heads,
                n_points=self.n_points,
                init_values=self.init_values,
                drop_path=self.drop_path_rate,
                with_cffn=self.with_cffn,
                cffn_ratio=self.cffn_ratio,
                deform_ratio=self.deform_ratio,
                extra_extractor=(
                    si == len(self.interaction_indexes) - 1
                ) and self.use_extra_extractor,
                deterministic=deterministic,
                remat_blocks=self.with_cp and train,
                dtype=self.dtype,
                name=f"interactions_{si}",
            )(xt, c)
            outs.append(xt.reshape(B, H, W, self.embed_dim))

        # ---- pyramid assembly (NHWC)
        # c1 arrives SPATIAL from the SPM (it never entered the token
        # stream; tokenizing it cost a 134 MB layout copy, r5 HLO audit)
        c2 = c[:, :n2].reshape(B, H * 2, W * 2, self.embed_dim)
        c3 = c[:, n2 : n2 + n3].reshape(B, H, W, self.embed_dim)
        c4 = c[:, n2 + n3 :].reshape(B, H // 2, W // 2, self.embed_dim)
        up = PixelShuffleUp(self.embed_dim, dtype=self.dtype, name="up")
        norm1 = BatchNorm(dtype=self.dtype, name="norm1")

        if self.add_vit_feature:
            x1, x2, x3, x4 = outs
            x1 = resize_bilinear(x1, (H * 4, W * 4))
            x2 = resize_bilinear(x2, (H * 2, W * 2))
            x4 = resize_bilinear(x4, (H // 2, W // 2))

        interpret = os.environ.get("MSA_PALLAS_INTERPRET", "0") == "1"
        on_tpu = (jax.default_backend() == "tpu"
                  or os.environ.get("MSA_FORCE_TPU_IMPL", "0") == "1")
        # Fused f1 assembly (inference only): up-dot + depth-to-space +
        # both residual adds + the eval-mode BN affine in one Pallas pass
        # (ops/pixel_shuffle.py). Eval BN is an exact affine, recovered
        # from the module itself on basis inputs so the param tree stays
        # byte-identical to the composition path. OPT-IN (default off):
        # the full-model on-chip A/B measured it SLOWER than the XLA
        # composition (93.28 vs 91.27 ms/img, r5) — the kernel's in-VMEM
        # (W, 2, O) -> (2W, O) interleave relayout plus the per-step
        # weight residency cost more than the copies it removes. Kept as
        # a tested variant for future Mosaic toolchains.
        fuse_f1 = (not train and self.add_vit_feature and on_tpu
                   and os.environ.get("MSA_UP_FUSED", "0") == "1")
        if fuse_f1:
            from ..ops.pixel_shuffle import pixel_shuffle_up_bn

            dt = self.dtype or c1.dtype
            basis = jnp.zeros((1, 1, 1, self.embed_dim), dt)
            t = norm1(basis, train=False).reshape(-1).astype(jnp.float32)
            s = (norm1(jnp.ones_like(basis), train=False)
                 .reshape(-1).astype(jnp.float32) - t)
            f1 = up(c2, fuse_add_bn=(c1, x1, s, t, interpret))
        else:
            c1 = up(c2) + c1
            if self.add_vit_feature:
                c1 = c1 + x1
            f1 = norm1(c1, train=train)

        if self.add_vit_feature:
            c2, c3, c4 = c2 + x2, c3 + x3, c4 + x4
        f2 = BatchNorm(dtype=self.dtype, name="norm2")(c2, train=train)
        f3 = BatchNorm(dtype=self.dtype, name="norm3")(c3, train=train)
        f4 = BatchNorm(dtype=self.dtype, name="norm4")(c4, train=train)
        return [f1, f2, f3, f4]
