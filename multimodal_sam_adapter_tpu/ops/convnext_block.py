"""Fused ConvNeXt block (dwconv7x7 -> LN -> fc1 -> GELU -> fc2 -> gamma)
as ONE Pallas TPU kernel.

The reference trunk (mmseg_custom/models/backbones/base/twin_convnext.py
ConvNeXtBlock, torch) is 6 kernel launches + 5 HBM round-trips per block;
at the flagship geometry the TwinConvNeXt stage 3 runs 54 such blocks at
(64, 64, 384) and the r3 xplane trace charges ~13 ms/forward to the stage's
fusions, LN stat reduces, and the (64,1,64,384)-layout copies XLA puts
around the depthwise conv. Fused, each block is one VMEM-resident pass:

- depthwise 7x7: the caller supplies SEVEN dx-shifted zero-padded copies
  of x, stacked (7, (H+6)*W, C) — horizontal taps become array picks and
  vertical taps become 8-ALIGNED static sublane offsets (W % 8 == 0 rows
  per image row), so the 49-tap accumulation is pure VPU FMAs with no
  relayouts. (A direct row shift by dx=+-1..3 would be a non-8-aligned
  sublane slice — Mosaic relayouts each, measured slower.)
- LN stats on the MXU (ones-vector contraction, f32), same formulation as
  nn/layers.py::_matmul_moments.
- fc1/fc2 as bf16 MXU dots with f32 accumulation, hidden axis processed in
  column chunks so the f32 intermediate stays bounded.
- exact (erf) GELU, matching the reference's nn.GELU.

Returns the PRE-residual delta (gamma * mlp(...)); the caller applies
drop-path and the shortcut add (XLA fuses those into one pass). Backward:
jax.custom_vjp against the plain XLA composition.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_exact(x):
    # reference nn.GELU: x * 0.5 * (1 + erf(x / sqrt(2)))
    return x * 0.5 * (1.0 + jax.lax.erf(x * 0.7071067811865476))


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7): Mosaic has no erf
    lowering, but exp it has. f32 in/out."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_kernel(x):
    """Exact-erf GELU for in-kernel use (A&S erf; |gelu err| ~ 1e-7*|x|,
    far below the bf16 rounding of the surrounding model)."""
    return x * 0.5 * (1.0 + _erf_approx(x * 0.7071067811865476))


def _kernel(H: int, W: int, C: int, HID: int, CHUNK: int, eps: float,
            xs_ref, dw_ref, dwb_ref, lng_ref, lnb_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, gamma_ref, out_ref):
    N = H * W
    # ---- depthwise 7x7: xs[dx] is zero-padded to (H+6) image rows; tap
    # (dy, dx) reads rows [dy*W, dy*W + N) of copy dx — static, 8-aligned
    acc = jnp.zeros((N, C), jnp.float32)
    for dx in range(7):
        x_dx = xs_ref[0, dx]
        for dy in range(7):
            w_tap = dw_ref[dy * 7 + dx, :].astype(jnp.float32)  # (C,)
            acc = acc + x_dx[dy * W:dy * W + N, :].astype(jnp.float32) \
                * w_tap[None, :]
    acc = acc + dwb_ref[0].astype(jnp.float32)[None, :]
    # ---- LayerNorm (stats via MXU ones-contraction, f32 math)
    ones = jnp.full((C, 1), 1.0 / C, jnp.float32)
    m = jax.lax.dot_general(acc, ones, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m2 = jax.lax.dot_general(acc * acc, ones, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    var = jnp.maximum(m2 - m * m, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    xn = (acc - m) * inv
    xn = xn * lng_ref[0].astype(jnp.float32)[None, :] \
        + lnb_ref[0].astype(jnp.float32)[None, :]
    xnb = xn.astype(w1_ref.dtype)
    # ---- MLP in hidden-column chunks: h_chunk = gelu(xn @ w1[:, c0:c1]),
    # y += h_chunk @ w2[c0:c1, :]; f32 live set stays (N, CHUNK)
    y = jnp.zeros((N, C), jnp.float32)
    for c0 in range(0, HID, CHUNK):
        h = jax.lax.dot_general(
            xnb, w1_ref[:, c0:c0 + CHUNK], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0, c0:c0 + CHUNK].astype(jnp.float32)[None, :]
        h = _gelu_kernel(h).astype(w2_ref.dtype)
        y = y + jax.lax.dot_general(
            h, w2_ref[c0:c0 + CHUNK, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y = y + b2_ref[0].astype(jnp.float32)[None, :]
    y = y * gamma_ref[0].astype(jnp.float32)[None, :]
    out_ref[0] = y.astype(out_ref.dtype)


def _shifted_copies(x):
    """x: (B, H, W, C) -> (B, 7, (H+6)*W, C): for each dx in -3..3 a
    horizontally shifted, vertically 3+3 zero-padded copy, flattened to
    image rows. One XLA pad+roll pass (~7x input bytes, bandwidth-cheap)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    cops = []
    for dx in range(7):
        cops.append(xp[:, :, dx:dx + W, :].reshape(B, (H + 6) * W, C))
    return jnp.stack(cops, axis=1)


def convnext_block_fused_fwd(x, dw, dw_b, ln_g, ln_b, w1, b1, w2, b2,
                             gamma, eps: float = 1e-6,
                             interpret: bool = False):
    """x: (B, H, W, C) bf16/f32; dw: (7, 7, 1, C) HWIO depthwise kernel +
    dw_b bias; w1: (C, HID); w2: (HID, C). Returns the pre-residual delta
    (B, H, W, C)."""
    B, H, W, C = x.shape
    HID = w1.shape[1]
    N = H * W
    assert W % 8 == 0, "image rows must be sublane-aligned"
    xs = _shifted_copies(x)
    dwf = dw.reshape(49, C)
    # hidden chunk: bound the f32 intermediate to <= (N, 512)
    CHUNK = HID
    while N * CHUNK * 4 > 8 * 1024 * 1024 and CHUNK % 2 == 0:
        CHUNK //= 2
    dt = x.dtype
    out = pl.pallas_call(
        functools.partial(_kernel, H, W, C, HID, CHUNK, eps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 7, (H + 6) * W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((49, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, HID), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HID), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), dt),
        # the shifted-copy window + f32 LN/MLP intermediates need ~70 MB of
        # scoped VMEM at stage-3 shape; the Mosaic default is 16 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        xs,
        dwf.astype(dt),
        dw_b.reshape(1, C),
        ln_g.reshape(1, C), ln_b.reshape(1, C),
        w1.astype(dt), b1.reshape(1, HID),
        w2.astype(dt), b2.reshape(1, C),
        gamma.reshape(1, C),
    )
    return out.reshape(B, H, W, C)


def _reference_delta(x, dw, dw_b, ln_g, ln_b, w1, b1, w2, b2, gamma,
                     eps: float = 1e-6):
    """Plain-XLA composition (used for the custom-vjp backward and as the
    numerics oracle): depthwise conv + LN + MLP + layer scale."""
    y = jax.lax.conv_general_dilated(
        x, dw.astype(x.dtype), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )
    yf = y.astype(jnp.float32) + dw_b
    m = yf.mean(-1, keepdims=True)
    var = yf.var(-1, keepdims=True)
    yn = (yf - m) * jax.lax.rsqrt(var + eps)
    yn = yn * ln_g + ln_b
    h = (yn.astype(x.dtype) @ w1.astype(x.dtype)).astype(jnp.float32) + b1
    h = _gelu_exact(h).astype(x.dtype)
    out = (h @ w2.astype(x.dtype)).astype(jnp.float32) + b2
    return (out * gamma).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _make_diff(eps, interpret):
    @jax.custom_vjp
    def fn(x, dw, dw_b, ln_g, ln_b, w1, b1, w2, b2, gamma):
        return convnext_block_fused_fwd(
            x, dw, dw_b, ln_g, ln_b, w1, b1, w2, b2, gamma, eps=eps,
            interpret=interpret)

    def fwd(*args):
        return fn(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: _reference_delta(*a, eps=eps), *res)
        return vjp(g)

    fn.defvjp(fwd, bwd)
    return fn


def convnext_block_fused(x, dw, dw_b, ln_g, ln_b, w1, b1, w2, b2, gamma,
                         eps: float = 1e-6, interpret: bool = False):
    """Differentiable fused ConvNeXt block delta: Pallas forward, XLA VJP."""
    return _make_diff(float(eps), interpret)(
        x, dw, dw_b, ln_g, ln_b, w1, b1, w2, b2, gamma)
