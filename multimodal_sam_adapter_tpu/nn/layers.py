"""Core layer library (flax.linen), NHWC throughout.

These replace the slice of OpenMMLab machinery the reference actually uses
(SURVEY.md 2.7): LayerNorm variants (incl. the channels-first 'LN2d', which
in NHWC is simply LayerNorm over the trailing axis), DropPath/stochastic
depth, ConvModule (conv+norm+act), GELU MLP blocks, and the torch-parity
initializers. Params are fp32; compute dtype is a per-module knob.
"""
from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# opt-out of the bf16 tanh-GELU speedup (exact-erf everywhere), for
# reference-parity debugging of bf16 paths
_FORCE_EXACT_GELU = os.environ.get("MSA_EXACT_GELU", "0") == "1"


def trunc_normal_init(std: float = 0.02):
    """timm trunc_normal_: N(0, std) truncated at +/-2 std."""
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def fan_out_conv_init(key, shape, dtype=jnp.float32):
    """Kaiming-normal fan_out init for HWIO conv kernels.

    Matches the reference's `_init_weights` for Conv2d / ConvTranspose2d
    (image_encoder_adapter...with_cp.py:129-134): N(0, sqrt(2 / fan_out)),
    fan_out = kh*kw*out_ch (per-group).
    """
    kh, kw, _, out_ch = shape
    fan_out = kh * kw * out_ch
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / fan_out)


def gelu(x):
    """GELU with dtype-matched precision/speed.

    f32 (CPU tests, parity paths): exact erf — bit-matches torch
    nn.GELU() (reference base/image_encoder.py:154-167, twin ConvNeXt,
    adapter ConvFFN all use the exact form).

    bf16 (the TPU inference/training dtype): tanh form. XLA's exact-erf
    lowering carries an erfc/exp branch that rate-limits every MLP output
    fusion to ~66 M elements/ms — 0.342 vs 0.193 ms (matmul alone) on the
    flagship ViT fc1, an ~11 ms/forward tax across ViT + twin ConvNeXt +
    ConvFFN (scripts/tpu_gelu_probe.py). The tanh form fuses at matmul
    rate, and its deviation from exact (max 5e-4 absolute) is far below
    the ~4e-3 relative rounding bf16 itself applies to every operand
    downstream.

    Set MSA_EXACT_GELU=1 to force the exact erf form on bf16 too (for
    reference-parity debugging of bf16 paths).
    """
    exact = x.dtype != jnp.bfloat16 or _FORCE_EXACT_GELU
    return nn.gelu(x, approximate=not exact)


def _matmul_moments(x, axis: int = -1):
    """(mean, E[x^2]) over `axis` computed as an MXU matmul.

    XLA lowers a minor-(lane-)axis reduce as cross-lane VPU work that runs at
    ~5% of HBM bandwidth on TPU (measured 0.18 ms for an 8 MB LayerNorm stat
    reduce at (4096, 1024)); contracting against a constant ones vector on
    the MXU runs the same reduction at full bandwidth. f32 accumulation via
    preferred_element_type; follows flax's E[x^2]-E[x]^2 formulation.
    """
    if axis != -1:
        x = jnp.moveaxis(x, axis, -1)
    C = x.shape[-1]
    # converts fuse into the dot operands: the square is exact in f32 given
    # low-precision x, matching flax's stat precision
    xf = x.astype(jnp.float32)
    w = jnp.full((C, 1), 1.0 / C, dtype=jnp.float32)
    m = jax.lax.dot_general(
        xf, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., 0]
    m2 = jax.lax.dot_general(
        xf * xf, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., 0]
    return m, m2


class _LNCore(nn.Module):
    """Param holder + math for LayerNorm (named 'ln' by the wrapper so the
    param tree matches flax.linen.LayerNorm: <parent>/ln/{scale,bias})."""

    eps: float
    use_bias: bool
    use_scale: bool
    dtype: Optional[jnp.dtype]

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        m, m2 = _matmul_moments(x)
        var = jnp.maximum(m2 - m * m, 0.0)
        inv = jax.lax.rsqrt(var + self.eps)[..., None]
        y = (x.astype(jnp.float32) - m[..., None]) * inv
        # affine in f32, single final cast (flax casts once at the end too)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (C,))
            y = y * scale.astype(jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (C,))
            y = y + bias.astype(jnp.float32)
        return y.astype(x.dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the trailing axis (torch nn.LayerNorm parity).

    Also serves as 'LN2d' (channels-first LN in the torch reference): in the
    NHWC layout used here, per-pixel channel normalization is the trailing
    axis again. Stats are computed as MXU matmuls (see _matmul_moments);
    the param tree matches flax nn.LayerNorm ('ln/{scale,bias}').
    """

    eps: float = 1e-6
    use_bias: bool = True
    use_scale: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return _LNCore(
            eps=self.eps,
            use_bias=self.use_bias,
            use_scale=self.use_scale,
            dtype=self.dtype,
            name="ln",
        )(x)


class BiasFreeLayerNorm(nn.Module):
    """Restormer-style bias-free LN: x / sqrt(var(x) + eps) * w.

    Variance is mean-subtracted but the normalization does NOT recenter x
    (reference adapter_modules...:36-47).
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        m, m2 = _matmul_moments(x)
        var = jnp.maximum(m2 - m * m, 0.0)[..., None]
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (y * w).astype(x.dtype)


class DropPath(nn.Module):
    """Stochastic depth per sample (timm drop_path parity: mask / keep_prob)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class MLPBlock(nn.Module):
    """Linear -> GELU -> Linear (reference base/image_encoder.py:154-167)."""

    mlp_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = gelu(x)
        x = nn.Dense(d, dtype=self.dtype, name="lin2")(x)
        return x


class BatchNorm(nn.Module):
    """BatchNorm over (N, H, W) of an NHWC array.

    Under jit with a batch-sharded mesh, the reduction spans the *global*
    batch, so this is SyncBN (the reference's nn.SyncBatchNorm) with zero
    extra code — XLA inserts the cross-replica collectives.
    """

    eps: float = 1e-5
    momentum: float = 0.9
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            name="bn",
        )(x)


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.eps, dtype=self.dtype, name="gn"
        )(x)


class ConvNormAct(nn.Module):
    """mmcv ConvModule equivalent: Conv2d -> norm -> act (NHWC).

    norm: one of None, 'bn', 'gn', 'ln2d'. act: None, 'relu', 'gelu',
    'sigmoid'. Conv bias is dropped when a norm follows, as in mmcv.
    """

    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0
    groups: int = 1
    norm: Optional[str] = None
    act: Optional[str] = "relu"
    use_bias: Optional[bool] = None
    gn_groups: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bias = self.use_bias if self.use_bias is not None else (self.norm is None)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=pad,
            feature_group_count=self.groups,
            use_bias=bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.norm == "bn":
            x = BatchNorm(dtype=self.dtype, name="norm")(x, train=train)
        elif self.norm == "gn":
            x = GroupNorm(num_groups=self.gn_groups, dtype=self.dtype, name="norm")(x)
        elif self.norm == "ln2d":
            x = LayerNorm(dtype=self.dtype, name="norm")(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "relu6":
            x = jnp.clip(x, 0.0, 6.0)
        elif self.act == "gelu":
            x = gelu(x)
        elif self.act == "sigmoid":
            x = nn.sigmoid(x)
        return x


class Scale(nn.Module):
    """Learnable scalar multiplier (reference adapter_modules...:247-258)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(self.init_value), ())
        return x * s.astype(x.dtype)


class Scale2(nn.Module):
    """Two learnable scalars blending two inputs: x*s1 + y*s2."""

    @nn.compact
    def __call__(self, x, y):
        s1 = self.param("scale1", nn.initializers.ones, ())
        s2 = self.param("scale2", nn.initializers.ones, ())
        return x * s1.astype(x.dtype) + y * s2.astype(x.dtype)


def h_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def h_swish(x):
    return x * h_sigmoid(x)
