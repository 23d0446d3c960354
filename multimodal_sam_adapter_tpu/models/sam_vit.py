"""SAM ViT image encoder (ViTDet-style), TPU-native flax modules.

Re-design of the reference SAM ViT-L encoder
(reference mmseg_custom/models/backbones/base/image_encoder.py:187-671):
- ViT-L: embed 1024, depth 24, heads 16, patch 16
- windowed attention (window 14) everywhere except global blocks
  [5, 11, 17, 23]; decomposed rel-pos bias in every block
- absolute pos embed stored at the pretrain grid (64x64) and bicubically
  resized on the fly

TPU notes: NHWC layout; windows fold into the batch dim so every attention
call is one large batched MXU matmul; blocks are individually addressable so
the multimodal adapter can interleave injector/extractor stages
(backbone.py); per-block remat is applied by the caller via jax.checkpoint.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import LayerNorm, MLPBlock, trunc_normal_init
from ..ops.attention import (
    attention_with_decomposed_rel_pos,
    window_partition,
    window_unpartition,
)


class PatchifyDense(nn.Module):
    """Strided patch conv executed as space-to-depth + Dense.

    Numerically identical to a stride-P, kernel-P conv, but avoids XLA's
    conv-input layout on thin-channel images (3..6 channels lane-pad to 128,
    a 20-40x HBM blowup on the saved activation). The parameter keeps the
    conv HWIO shape (P, P, C, F) for checkpoint parity.
    """

    features: int
    patch: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        P = self.patch
        B, H, W, C = x.shape
        Hp, Wp = H // P, W // P
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(), (P, P, C, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kmat = kern.reshape(P * P * C, self.features)
        patches = x.reshape(B, Hp, P, Wp, P, C).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(B, Hp, Wp, P * P * C)
        if self.dtype is not None:
            kmat = kmat.astype(self.dtype)
            patches = patches.astype(self.dtype)
            bias = bias.astype(self.dtype)
        return patches @ kmat + bias


class PatchEmbed(nn.Module):
    """16x16 patch embedding. Input NHWC; returns (B, Hp*Wp, C), Hp, Wp."""

    embed_dim: int = 1024
    patch_size: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = PatchifyDense(
            features=self.embed_dim, patch=self.patch_size, dtype=self.dtype,
            name="proj",
        )(x)
        B, Hp, Wp, C = x.shape
        return x.reshape(B, Hp * Wp, C), Hp, Wp


class ViTAttention(nn.Module):
    """Multi-head attention with decomposed rel-pos.

    `input_size` fixes the rel-pos table extent: (window, window) for
    windowed blocks, (pretrain//16,)*2 for global blocks. Tables resize on
    the fly when the runtime grid differs (get_rel_pos).
    """

    dim: int
    num_heads: int
    input_size: Tuple[int, int]
    use_rel_pos: bool = True
    impl: str = "auto"  # 'dense' | 'flash' | 'auto' (flash on TPU for big N)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) where B already folds windows for windowed blocks
        B, H, W, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5
        # MSA_ATTN_IMPL is a trace-time debug knob; only honored on 'auto'.
        # MSA_FORCE_TPU_IMPL=1 runs the TPU dispatch on any backend and
        # MSA_PALLAS_INTERPRET=1 runs the Pallas kernels in interpret mode —
        # together they let CPU tests exercise the exact TPU-default code
        # path (win_lane + flash), e.g. under a tensor-parallel mesh
        # (tests/test_tensor_parallel.py).
        interpret = os.environ.get("MSA_PALLAS_INTERPRET", "0") == "1"
        impl = self.impl
        if impl == "auto":
            impl = os.environ.get("MSA_ATTN_IMPL", "auto")
        if impl == "auto":
            on_tpu = (jax.default_backend() == "tpu"
                      or os.environ.get("MSA_FORCE_TPU_IMPL", "0") == "1")
            # flash only on lane-aligned global grids (W%64==0); a 48-wide
            # grid miscompiled/crashed the worker on v5e — dense elsewhere
            big = H * W >= 1024 and (H * W) % 256 == 0
            aligned = W % 64 == 0 and H % 8 == 0
            if on_tpu and big and aligned:
                impl = "flash"
            elif on_tpu and H == W and H * W <= 1024 and self.use_rel_pos:
                # windowed blocks: lane-blocked kernel straight off the qkv
                # projection (0.522 vs 0.706 ms/block for transpose +
                # packed kernel, scripts/tpu_winattn_laneblock_probe.py).
                # MSA_WIN_IMPL is a trace-time A/B knob for the windowed
                # kernel choice only (win_fused | win_lane)
                impl = os.environ.get("MSA_WIN_IMPL", "win_lane")
            else:
                impl = "dense"
        use_lane_flash = (impl == "flash" and self.use_rel_pos
                          and os.environ.get("MSA_FLASH_IMPL", "lane")
                          == "lane")
        # lane flash consumes the raw (B, N, 3C) projection: feed the
        # Dense FLAT tokens so the dot emits a default-layout output the
        # Pallas call can take directly — on the (B, H, W, C) input the
        # conv-style emitter's output layout forced a 25 MB relayout copy
        # (0.54 ms/block, r5 trace) in front of the kernel
        xin = x.reshape(B, H * W, C) if use_lane_flash else x
        qkv_dense = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")
        qkv = qkv_dense(xin)
        if use_lane_flash:
            # MSA_FLASH_IMPL selects the flash kernel variant at trace
            # time: 'lane' (default) consumes the RAW (B, N, 3C) projection
            # through 128-lane BlockSpec slices and returns heads-packed
            # (B, N, C) — the (B,N,3,M,d)->(3,BM,N,d) marshalling copy
            # (1.07 ms/global block, the largest layout copy in the r5
            # trace) and the output unpack transpose never exist. 'qkvt'
            # keeps the original (3, BM, N, d) kernel. Full-model on-chip
            # A/B (docs/DESIGN.md r5): lane 91.07 ms/img vs qkvt 92.24.
            from ..ops.flash_attention import flash_attention_lane_diff

            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim),
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim),
            )
            # the rel-term einsums do NOT read the qkv tensor (a second
            # consumer makes XLA double-materialize the Pallas operand, a
            # 0.54 ms/block copy): q is re-derived with a separate dot
            # over the same params. Measured wall-NEUTRAL (89.52 vs 89.62
            # ms/img — the copy overlapped with compute), kept because a
            # single-consumer custom-call operand is robust against
            # schedule changes and costs only an 8.6 GFLOP dot
            wq = qkv_dense.variables["params"]["kernel"][:, : self.dim]
            bq = qkv_dense.variables["params"]["bias"][: self.dim]
            dt = qkv.dtype
            q_rel = xin.astype(dt) @ wq.astype(dt) + bq.astype(dt)
            out = flash_attention_lane_diff(
                qkv, q_rel, rel_pos_h, rel_pos_w, (H, W), scale,
                num_heads=self.num_heads, interpret=interpret,
            )
            out = out.reshape(B, H, W, self.dim)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        if impl == "win_lane" and self.use_rel_pos:
            from ..ops.window_attention import window_attention_laneblock

            assert H == W, "win_lane expects square windows"
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim),
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim),
            )
            # the raw (windows, N, 3C) projection output feeds the kernel
            # directly — head-group q/k/v are 128-lane-aligned BlockSpec
            # slices, so the head-split transpose chain never exists
            out = window_attention_laneblock(
                qkv.reshape(B, H * W, 3 * self.dim),
                rel_pos_h, rel_pos_w, H, scale, num_heads=self.num_heads,
                interpret=interpret,
            )
            out = out.reshape(B, H, W, self.dim)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * self.num_heads, H * W, head_dim)
        if impl == "win_fused" and self.use_rel_pos:
            from ..ops.window_attention import window_attention_packed

            assert H == W, "win_fused expects square windows"
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim),
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim),
            )
            # packed (windows, N, C) output feeds proj directly; the whole
            # (3, B*heads, N, d) array enters the kernel unsliced
            out = window_attention_packed(
                qkv, rel_pos_h, rel_pos_w, H, scale,
                num_heads=self.num_heads,
            )
            out = out.reshape(B, H, W, self.dim)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        q, k, v = qkv[0], qkv[1], qkv[2]

        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h",
                nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim),
            )
            rel_pos_w = self.param(
                "rel_pos_w",
                nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim),
            )
            if impl == "flash":
                from ..ops.flash_attention import flash_attention_rel_pos_diff

                # the whole (3, B*heads, N, d) array enters unsliced
                out = flash_attention_rel_pos_diff(
                    qkv, rel_pos_h, rel_pos_w, (H, W), scale,
                    interpret=interpret,
                )
            else:
                out = attention_with_decomposed_rel_pos(
                    q, k, v, rel_pos_h, rel_pos_w, (H, W), scale
                )
        else:
            attn = jnp.einsum("bqd,bkd->bqk", q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = nn.softmax(attn, axis=-1)
            out = jnp.einsum("bqk,bkd->bqd", attn.astype(v.dtype), v)

        out = out.reshape(B, self.num_heads, H, W, head_dim)
        out = out.transpose(0, 2, 3, 1, 4).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-norm transformer block with optional window attention.

    window_size == 0 -> global attention over the full grid.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0
    input_size: Tuple[int, int] = (64, 64)
    use_rel_pos: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, H: int, W: int):
        # x: (B, N, C) token stream; un/flatten happens here as in the
        # reference Block.forward (base/image_encoder.py:382-423)
        B, N, C = x.shape
        x = x.reshape(B, H, W, C)
        shortcut = x
        y = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            y, pad_hw = window_partition(y, self.window_size)
        attn_size = (
            (self.window_size, self.window_size)
            if self.window_size > 0
            else self.input_size
        )
        y = ViTAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            input_size=attn_size,
            use_rel_pos=self.use_rel_pos,
            dtype=self.dtype,
            name="attn",
        )(y)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, pad_hw, (H, W))
        x = shortcut + y
        # NB (r5 negative result): running norm2+MLP on the flat (B,N,C)
        # stream (plain-dot emitter instead of the conv emitter) measured
        # 90.14 vs 89.62 ms/img full-model — the conv-shaped MLP stays
        y = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + MLPBlock(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(y)
        return x.reshape(B, N, C)


class ImageEncoderViT(nn.Module):
    """Standalone SAM image encoder (no adapter), for parity tests/export.

    The adapter backbone (backbone.py) reuses PatchEmbed/ViTBlock directly and
    drives the blocks in interaction stages.
    """

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (5, 11, 17, 23)
    pretrained_size: int = 1024
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        tokens, Hp, Wp = PatchEmbed(
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        if self.use_abs_pos:
            grid = self.pretrained_size // self.patch_size
            pos = self.param(
                "pos_embed", nn.initializers.zeros, (1, grid, grid, self.embed_dim)
            )
            if (grid, grid) != (Hp, Wp):
                # off-pretrain-grid inputs: bicubic resize, as the adapter
                # path does (backbone.py) and the reference's checkpoint
                # loader does for pos_embed (mmcv_custom/checkpoint.py:460-470)
                from ..utils.interpolate import resize_bicubic

                pos = resize_bicubic(pos, (Hp, Wp))
            tokens = tokens + pos.reshape(1, Hp * Wp, self.embed_dim).astype(
                tokens.dtype)
        for i in range(self.depth):
            tokens = ViTBlock(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                input_size=(
                    self.pretrained_size // self.patch_size,
                    self.pretrained_size // self.patch_size,
                ),
                use_rel_pos=self.use_rel_pos,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(tokens, Hp, Wp)
        return tokens, Hp, Wp
