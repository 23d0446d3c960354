"""Pallas TPU kernel for multi-scale deformable attention.

The reference implements this op as a CUDA im2col kernel
(reference ops/src/cuda/ms_deform_im2col_cuda.cuh:238-301: one thread per
(batch, query, head, channel) doing 4-corner bilinear gathers). TPUs have no
hardware vector-gather, so the TPU-native design restructures the work:

1. XLA phase (`_prepare_level`, vectorized): for every (query, head, point)
   compute the two CLAMPED base row indices of the 2x2 bilinear footprint in
   the flattened (H*W, D) level table, and the four corner weights with
   zero-padding validity and the attention weight folded in. All dense VPU
   math, no gathers.
2. Pallas phase (`_level_kernel`): grid over (batch*head, query tiles). The
   whole level table for one head lives in VMEM (<= 2 MB); indices/weights
   stream through SMEM so the inner loop is scalar-driven: per (query,
   point) TWO dynamic (2, D) row loads (a 2x2 bilinear footprint is two
   adjacent flat rows twice) + weighted accumulate. This turns 16 scattered
   element gathers into 2 vector loads.

Backward uses the XLA gather formulation's autodiff (scatter-add), wired in
via jax.custom_vjp — same split as the reference's im2col/col2im pair.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _prepare_level(loc_l, att_l, H: int, W: int):
    """Compute base rows + folded corner weights for one level.

    loc_l: (B, Lq, M, P, 2) normalized (x, y); att_l: (B, Lq, M, P).
    Returns rbase (B*M, Lq, P, 2) int32, wmat (B*M, Lq, P, 4) f32 where
    wmat[..., 2*i + j] weights loaded row (cy0+i), col (cx0+j).
    """
    B, Lq, M, P, _ = loc_l.shape
    x = loc_l[..., 0].astype(jnp.float32) * W - 0.5
    y = loc_l[..., 1].astype(jnp.float32) * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    cx0 = jnp.clip(x0, 0, max(W - 2, 0))
    cy0 = jnp.clip(y0, 0, max(H - 2, 0))

    def slot_w(c, i0, t):
        # weight of loaded position c: (1-t) if c == i0, t if c == i0+1, else 0
        return jnp.where(c == i0, 1.0 - t, jnp.where(c == i0 + 1, t, 0.0))

    wx = jnp.stack([slot_w(cx0, x0, tx), slot_w(cx0 + 1, x0, tx)], -1)  # (..,2)
    wy = jnp.stack([slot_w(cy0, y0, ty), slot_w(cy0 + 1, y0, ty)], -1)
    wmat = wy[..., :, None] * wx[..., None, :]  # (B,Lq,M,P,2,2)
    wmat = wmat * att_l.astype(jnp.float32)[..., None, None]
    rbase = jnp.stack([cy0 * W + cx0, (cy0 + 1) * W + cx0], -1)  # (B,Lq,M,P,2)

    rbase = rbase.transpose(0, 2, 1, 3, 4).reshape(B * M, Lq, P, 2)
    wmat = wmat.transpose(0, 2, 1, 3, 4, 5).reshape(B * M, Lq, P, 4)
    return rbase, wmat


def _level_kernel(P: int, T: int, D: int, rb_ref, wm_ref, val_ref, out_ref):
    def body(t, _):
        acc = jnp.zeros((1, D), jnp.float32)
        for p in range(P):
            for i in range(2):
                r = rb_ref[0, t, p, i]
                rows = val_ref[0, pl.ds(r, 2), :].astype(jnp.float32)
                w0 = wm_ref[0, t, p, 2 * i]
                w1 = wm_ref[0, t, p, 2 * i + 1]
                acc = acc + rows[0:1] * w0 + rows[1:2] * w1
        out_ref[0, pl.ds(t, 1), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, T, body, 0, unroll=False)


def _msda_level_pallas(value_l, rbase, wmat, T: int = 128,
                       interpret: bool = False):
    """value_l: (BM, HW, D); rbase: (BM, Lq, P, 2); wmat: (BM, Lq, P, 4).
    Returns (BM, Lq, D)."""
    BM, HW, D = value_l.shape
    _, Lq, P, _ = rbase.shape
    pad = (-Lq) % T
    if pad:
        rbase = jnp.pad(rbase, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wmat = jnp.pad(wmat, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Lqp = Lq + pad
    grid = (BM, Lqp // T)

    out = pl.pallas_call(
        functools.partial(_level_kernel, P, T, D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, P, 2), lambda bm, t: (bm, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, P, 4), lambda bm, t: (bm, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, HW, D), lambda bm, t: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda bm, t: (bm, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, Lqp, D), value_l.dtype),
        interpret=interpret,
    )(rbase, wmat, value_l)
    return out[:, :Lq]


def ms_deform_attn_pallas_fwd(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward-only Pallas path; same contract as ops.msda.ms_deform_attn."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    out = jnp.zeros((B * M, Lq, D), jnp.float32)
    offset = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        val = value[:, offset : offset + H * W]  # (B, HW, M, D)
        offset += H * W
        val = val.transpose(0, 2, 1, 3).reshape(B * M, H * W, D)
        rbase, wmat = _prepare_level(
            sampling_locations[:, :, :, lvl], attention_weights[:, :, :, lvl],
            H, W,
        )
        out = out + _msda_level_pallas(val, rbase, wmat,
                                       interpret=interpret).astype(jnp.float32)
    out = out.reshape(B, M, Lq, D).transpose(0, 2, 1, 3).reshape(B, Lq, M * D)
    return out.astype(value.dtype)


def make_ms_deform_attn(spatial_shapes: Sequence[Tuple[int, int]],
                        interpret: bool = False):
    """custom_vjp MSDA for fixed (static) spatial shapes: Pallas forward,
    XLA-gather autodiff backward (the col2im analogue)."""
    return _make_ms_deform_attn_cached(
        tuple(tuple(s) for s in spatial_shapes), interpret
    )


@functools.lru_cache(maxsize=None)
def _make_ms_deform_attn_cached(shapes, interpret: bool):
    from .msda import ms_deform_attn as msda_xla

    @jax.custom_vjp
    def fn(value, loc, att):
        return ms_deform_attn_pallas_fwd(value, shapes, loc, att,
                                         interpret=interpret)

    def fwd(value, loc, att):
        return fn(value, loc, att), (value, loc, att)

    def bwd(res, g):
        value, loc, att = res
        _, vjp = jax.vjp(lambda v, l, a: msda_xla(v, shapes, l, a),
                         value, loc, att)
        return vjp(g.astype(value.dtype))

    fn.defvjp(fwd, bwd)
    return fn
