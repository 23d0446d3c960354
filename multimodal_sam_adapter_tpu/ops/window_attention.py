"""Fused window attention with decomposed rel-pos (SAM windowed blocks).

The 20 windowed SAM ViT-L blocks compute attention over 25 windows x 16
heads of 196 tokens each (14x14 windows on the 64x64 grid). The XLA path
(ops/attention.py) materializes the (400, 196, 196) f32 score tensor in HBM
(~61 MB) and streams it through the bias-add + softmax + AV chain — at 20
blocks that is >1.2 GB of avoidable HBM traffic per forward.

This kernel fuses QK^T -> +decomposed-bias -> softmax -> AV per window
batch entirely in VMEM. A window's score tile (196x196 f32) is ~150 KB, so
a grid step processes G windows with a small unrolled loop. The decomposed
bias is expanded in-kernel from the two (N, ws) terms:

    bias[q, kh*ws + kw] = rel_h[q, kh] + rel_w[q, kw]

rel_h expands with a static one-hot MXU dot (repeat each column ws times,
kh-major), rel_w with `pltpu.repeat` (lane tiling) — no gathers, mirroring
the global flash kernel (flash_attention.py). Softmax is exact (single
tile), so numerics match the dense reference path
(reference base/image_encoder.py:492-498) to f32 rounding.

Backward: dense XLA autodiff path via jax.custom_vjp (the window batch is
small enough that the dense backward under the per-block remat is fine).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import rel_pos_bias_terms


def _win_kernel(G: int, ws: int, scale: float,
                q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref):
    N = ws * ws
    # static kh-major expansion matrix: column k of the bias gets rel_h
    # column k // ws
    kh = jax.lax.broadcasted_iota(jnp.int32, (ws, N), 0)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (ws, N), 1) // ws
    e_h = (kh == kcol).astype(jnp.float32)  # (ws, N)
    for g in range(G):
        # native-dtype QK^T (f32 MXU dots run at a fraction of bf16 rate);
        # f32 accumulate, scale applied to the f32 product
        s = jax.lax.dot_general(
            q_ref[g], k_ref[g], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (N, N)
        rh = rh_ref[g].astype(jnp.float32)           # (N, ws)
        rw = rw_ref[g].astype(jnp.float32)           # (N, ws)
        bias_h = jax.lax.dot_general(
            rh, e_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + bias_h + pltpu.repeat(rw, ws, axis=1)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[g] = o.astype(o_ref.dtype)


def window_attention_fused_fwd(q, k, v, rel_h, rel_w, ws: int, scale: float,
                               group: int = 8, interpret: bool = False):
    """q, k, v: (B, N, d) with B = windows*heads, N = ws*ws.
    rel_h, rel_w: (B, N, ws) decomposed bias terms."""
    B, N, d = q.shape
    assert N == ws * ws
    G = group
    while B % G:
        G -= 1
    out = pl.pallas_call(
        functools.partial(_win_kernel, G, ws, scale),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, ws), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, ws), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, N, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, d), q.dtype),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w)
    return out


def _win_kernel_packed(G: int, ws: int, d: int, scale: float,
                       qkv_ref, rhf_ref, rwf_ref, o_ref):
    """Per-head outputs land as adjacent d-wide lane slices of ONE (N, G*d)
    block — the output tensor is (windows, N, heads*d), directly consumable
    by the proj matmul (no head-unfold transposes on the XLA side).

    The decomposed rel-pos bias is computed ENTIRELY in-kernel from the two
    tiny (N, d) per-(qy/qx, ky/kw) tables via static-mask MXU algebra:

        bias_h[q, k] = (q . Rh[qy(q), ky(k)])      (reference decomposed form)
                     = [(q @ Rhfull^T) * M_h] @ E_h
        M_h[q, j] = [qy(j) == qy(q)]   (static 0/1, j = qy*ws + ky)
        E_h[j, k] = [ky(j) == ky(k)]   (static 0/1)

    and symmetrically for the width term — the masked dot collapses the
    row-dependent column selection that Mosaic cannot express as a dynamic
    slice. This removes the (B, N, ws) per-query term tensors the old
    kernel streamed from XLA (their 14-wide minor dim tile-padded ~9x,
    ~40 MB of hidden DMA per block)."""
    N = ws * ws
    qj = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    jk = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    m_h = qj // ws == jk // ws          # [qy(q) == qy'(j)]
    m_w = qj % ws == jk // ws           # [qx(q) == qx'(j)]
    e_h = (qj % ws == jk // ws)         # rows j: [ky(j) == ky(k)]
    e_w = (qj % ws == jk % ws)          # rows j: [kw(j) == kx(k)]
    dt = qkv_ref.dtype
    e_h = e_h.astype(dt)
    e_w = e_w.astype(dt)
    for g in range(G):
        q = qkv_ref[0, g]
        # native-dtype QK^T (f32 MXU dots run at a fraction of bf16 rate);
        # f32 accumulate, scale applied to the f32 product
        s = jax.lax.dot_general(
            q, qkv_ref[1, g], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        gh = jax.lax.dot_general(
            q, rhf_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (N, N) over (qy', ky)
        gw = jax.lax.dot_general(
            q, rwf_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (N, N) over (qx', kw)
        # bias precision matches the old XLA path (terms were einsummed in
        # q.dtype there)
        ghm = jnp.where(m_h, gh, 0.0).astype(dt)
        gwm = jnp.where(m_w, gw, 0.0).astype(dt)
        s = s + jax.lax.dot_general(
            ghm, e_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + jax.lax.dot_general(
            gwm, e_w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(dt), qkv_ref[2, g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, g * d:(g + 1) * d] = o.astype(o_ref.dtype)


def window_attention_packed_fwd(qkvt, rh_full, rw_full, ws: int,
                                scale: float, num_heads: int, group: int = 8,
                                interpret: bool = False):
    """qkvt: (3, B, N, d) with B = windows*heads (head-minor) — ONE array so
    the caller's q/k/v lane-slices never materialize; rh_full/rw_full:
    (N, d) per-(qy, ky)/(qx, kw) rel-pos tables (get_rel_pos output,
    flattened). Returns (windows, N, num_heads*d) packed output."""
    _, B, N, d = qkvt.shape
    assert N == ws * ws and B % num_heads == 0
    Wn = B // num_heads
    G = group
    while num_heads % G:
        G -= 1
    gpw = num_heads // G
    out = pl.pallas_call(
        functools.partial(_win_kernel_packed, G, ws, d, scale),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((3, G, N, d), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, G * d),
                               lambda b: (b // gpw, 0, b % gpw),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wn, N, num_heads * d), qkvt.dtype),
        interpret=interpret,
    )(qkvt, rh_full, rw_full)
    return out


@functools.lru_cache(maxsize=None)
def _make_diff_window_attn_packed(ws, scale, num_heads, group, interpret):
    from .attention import attention_with_decomposed_rel_pos

    from .attention import get_rel_pos

    @jax.custom_vjp
    def fn(qkvt, rph, rpw):
        N = ws * ws
        d = qkvt.shape[-1]
        rh_full = get_rel_pos(ws, ws, rph).reshape(N, d).astype(qkvt.dtype)
        rw_full = get_rel_pos(ws, ws, rpw).reshape(N, d).astype(qkvt.dtype)
        return window_attention_packed_fwd(
            qkvt, rh_full, rw_full, ws, scale, num_heads, group=group,
            interpret=interpret,
        )

    def fwd(qkvt, rph, rpw):
        return fn(qkvt, rph, rpw), (qkvt, rph, rpw)

    def bwd(res, g):
        qkvt, rph, rpw = res
        _, B, N, d = qkvt.shape

        def ref(qkvt_, rph_, rpw_):
            o = attention_with_decomposed_rel_pos(
                qkvt_[0], qkvt_[1], qkvt_[2], rph_, rpw_, (ws, ws), scale
            )  # (B, N, d), head-minor in B
            o = o.reshape(B // num_heads, num_heads, N, d)
            return o.transpose(0, 2, 1, 3).reshape(
                B // num_heads, N, num_heads * d)

        _, vjp = jax.vjp(ref, qkvt, rph, rpw)
        return vjp(g.astype(qkvt.dtype))

    fn.defvjp(fwd, bwd)
    return fn


def window_attention_packed(qkvt, rel_pos_h, rel_pos_w, ws: int,
                            scale: float, num_heads: int, group: int = 8,
                            interpret: bool = False):
    """Differentiable fused window attention with packed (windows, N, C)
    output: Pallas forward, dense XLA VJP. qkvt: (3, windows*heads, N, d)."""
    return _make_diff_window_attn_packed(
        ws, float(scale), num_heads, group, interpret
    )(qkvt, rel_pos_h, rel_pos_w)


def _win_kernel_laneblock(G: int, ws: int, d: int, scale: float,
                          q_ref, k_ref, v_ref, rhp_ref, rwp_ref, o_ref):
    """Lane-blocked window attention: q/k/v arrive as 128-lane-aligned
    slices of the RAW qkv projection output (feature order f = s*H*d +
    h*d + dd), so the XLA-side head-split transpose chain — the single
    largest non-matmul cost of a windowed ViT block (~0.37 ms/block) —
    never exists. Per-head dots become masked WIDE dots with the mask on
    the q side only:

        s_h   = (q_blk * mask_h) @ k_blk^T     (zeroed lanes kill the
                                                cross-head inner products)
        gh_h  = (q_blk * mask_h) @ RhP^T       (RhP = [Rh | Rh ...] lane-
                                                tiled G times)
        o_blk = sum_h P_h @ (v_blk * mask_h)   (heads land packed in their
                                                own d-wide output lanes)

    2x nominal QK/AV MACs at G=2 — cheaper than the relayout they replace.
    Rel-pos bias via the same static-mask MXU algebra as
    _win_kernel_packed."""
    o_ref[0] = _laneblock_body(G, ws, d, scale, q_ref[0], k_ref[0],
                               v_ref[0], rhp_ref[...],
                               rwp_ref[...]).astype(o_ref.dtype)


def _laneblock_body(G, ws, d, scale, q, k, v, rhp, rwp):
    """One window x G heads of lane-blocked attention on VMEM arrays.

    VPU micro-structure (r4 probe, scripts/tpu_winlane_micro_probe.py,
    0.270 -> 0.247 ms at flagship geometry):
    - when the softmax scale is a power of two (every shipped head_dim:
      d=64 -> 1/8, d=16 -> 1/4) it is folded into k ONCE per window-group
      instead of multiplying the (N, N) f32 score tile per head — exact
      in any float dtype. A non-pow2 scale (e.g. d=80) would round the
      bf16 k operand BEFORE the MXU dot and lose f32 bit-comparability,
      so it falls back to scaling the f32 score tile per head;
    - normalization is a reciprocal-multiply (N divides on the (N, 1)
      sums, then an (N, N) multiply) instead of an (N, N) broadcast
      divide (~1 ulp f32 deviation, far below the kernels' 1e-4 parity
      tolerance). Both changes measured TOGETHER are a win while either
      alone regresses (Mosaic codegen is sensitive to the op mix).
    """
    N = ws * ws
    qj = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    jk = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    m_h = qj // ws == jk // ws
    m_w = qj % ws == jk // ws
    e_h = (qj % ws == jk // ws)
    e_w = (qj % ws == jk % ws)
    dt = q.dtype
    e_h = e_h.astype(dt)
    e_w = e_w.astype(dt)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (N, G * d), 1)
    o = jnp.zeros((N, G * d), jnp.float32)
    fold_scale = math.frexp(scale)[0] == 0.5
    ks = k * jnp.asarray(scale, k.dtype) if fold_scale else k
    for h in range(G):
        mask = (lanes // d == h).astype(dt)
        qh = q * mask
        s = jax.lax.dot_general(
            qh, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if not fold_scale:
            s = s * scale
        gh = jax.lax.dot_general(
            qh, rhp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gw = jax.lax.dot_general(
            qh, rwp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ghm = jnp.where(m_h, gh, 0.0).astype(dt)
        gwm = jnp.where(m_w, gw, 0.0).astype(dt)
        s = s + jax.lax.dot_general(
            ghm, e_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + jax.lax.dot_general(
            gwm, e_w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        inv = 1.0 / jnp.sum(p, axis=1, keepdims=True)
        p = p * inv
        o = o + jax.lax.dot_general(
            p.astype(dt), v * mask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return o


def _win_kernel_laneblock_mw(WB, G, ws, d, scale,
                             q_ref, k_ref, v_ref, rhp_ref, rwp_ref, o_ref):
    for wi in range(WB):
        o_ref[wi] = _laneblock_body(
            G, ws, d, scale, q_ref[wi], k_ref[wi], v_ref[wi],
            rhp_ref[...], rwp_ref[...]).astype(o_ref.dtype)


def window_attention_laneblock_fwd(qkv_dense, rh_full, rw_full, ws: int,
                                   scale: float, num_heads: int,
                                   group: int = 2, win_block: int = 5,
                                   interpret: bool = False):
    """qkv_dense: (Wn, N, 3*num_heads*d) — the qkv projection output,
    UNTOUCHED (s-major feature order). rh_full/rw_full: (N, d) get_rel_pos
    tables. Returns (Wn, N, num_heads*d) packed output.

    win_block windows are processed per grid step (fatter steps pipeline
    better: 0.385 vs 0.522 ms/block at wb=5 vs 1, flagship geometry —
    scripts/tpu_winattn_laneblock_probe.py); the largest divisor of Wn
    <= win_block is used."""
    Wn, N, F = qkv_dense.shape
    d = F // (3 * num_heads)
    assert N == ws * ws and F == 3 * num_heads * d
    G = group
    while num_heads % G:
        G -= 1
    WB = min(win_block, Wn)
    while Wn % WB:
        WB -= 1
    rhp = jnp.concatenate([rh_full] * G, axis=1)  # (N, G*d) loop-invariant
    rwp = jnp.concatenate([rw_full] * G, axis=1)
    ngrp = num_heads // G
    blk = (WB, N, G * d)
    out = pl.pallas_call(
        functools.partial(_win_kernel_laneblock_mw, WB, G, ws, d, scale),
        grid=(Wn // WB, ngrp),
        in_specs=[
            pl.BlockSpec(blk, lambda w, g: (w, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda w, g: (w, 0, ngrp + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda w, g: (w, 0, 2 * ngrp + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, G * d), lambda w, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, G * d), lambda w, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk, lambda w, g: (w, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wn, N, num_heads * d),
                                       qkv_dense.dtype),
        interpret=interpret,
    )(qkv_dense, qkv_dense, qkv_dense, rhp, rwp)
    return out


@functools.lru_cache(maxsize=None)
def _make_diff_window_attn_laneblock(ws, scale, num_heads, group, interpret):
    from .attention import attention_with_decomposed_rel_pos, get_rel_pos

    @jax.custom_vjp
    def fn(qkv_dense, rph, rpw):
        N = ws * ws
        d = qkv_dense.shape[-1] // (3 * num_heads)
        rh = get_rel_pos(ws, ws, rph).reshape(N, d).astype(qkv_dense.dtype)
        rw = get_rel_pos(ws, ws, rpw).reshape(N, d).astype(qkv_dense.dtype)
        return window_attention_laneblock_fwd(
            qkv_dense, rh, rw, ws, scale, num_heads, group=group,
            interpret=interpret,
        )

    def fwd(qkv_dense, rph, rpw):
        return fn(qkv_dense, rph, rpw), (qkv_dense, rph, rpw)

    def bwd(res, g):
        qkv_dense, rph, rpw = res
        Wn, N, F = qkv_dense.shape
        d = F // (3 * num_heads)

        def ref(qd, rph_, rpw_):
            qkvt = qd.reshape(Wn, N, 3, num_heads, d).transpose(
                2, 0, 3, 1, 4).reshape(3, Wn * num_heads, N, d)
            o = attention_with_decomposed_rel_pos(
                qkvt[0], qkvt[1], qkvt[2], rph_, rpw_, (ws, ws), scale
            )
            o = o.reshape(Wn, num_heads, N, d)
            return o.transpose(0, 2, 1, 3).reshape(Wn, N, num_heads * d)

        _, vjp = jax.vjp(ref, qkv_dense, rph, rpw)
        return vjp(g.astype(qkv_dense.dtype))

    fn.defvjp(fwd, bwd)
    return fn


def window_attention_laneblock(qkv_dense, rel_pos_h, rel_pos_w, ws: int,
                               scale: float, num_heads: int, group: int = 2,
                               interpret: bool = False):
    """Differentiable lane-blocked window attention consuming the raw qkv
    projection output (Wn, N, 3*heads*d): Pallas forward, dense XLA VJP."""
    return _make_diff_window_attn_laneblock(
        ws, float(scale), num_heads, group, interpret
    )(qkv_dense, rel_pos_h, rel_pos_w)


@functools.lru_cache(maxsize=None)
def _make_diff_window_attn(ws, scale, group, interpret):
    from .attention import attention_with_decomposed_rel_pos

    @jax.custom_vjp
    def fn(q, k, v, rph, rpw):
        rel_h, rel_w = rel_pos_bias_terms(q, rph, rpw, (ws, ws), (ws, ws))
        B, N, _ = q.shape
        rel_h = rel_h.reshape(B, N, ws)
        rel_w = rel_w.reshape(B, N, ws)
        return window_attention_fused_fwd(
            q, k, v, rel_h, rel_w, ws, scale, group=group,
            interpret=interpret,
        )

    def fwd(q, k, v, rph, rpw):
        return fn(q, k, v, rph, rpw), (q, k, v, rph, rpw)

    def bwd(res, g):
        q, k, v, rph, rpw = res
        _, vjp = jax.vjp(
            lambda q_, k_, v_, rph_, rpw_: attention_with_decomposed_rel_pos(
                q_, k_, v_, rph_, rpw_, (ws, ws), scale
            ),
            q, k, v, rph, rpw,
        )
        return vjp(g.astype(q.dtype))

    fn.defvjp(fwd, bwd)
    return fn


def window_attention_fused(q, k, v, rel_pos_h, rel_pos_w, ws: int,
                           scale: float, group: int = 8,
                           interpret: bool = False):
    """Differentiable fused window attention: Pallas forward, dense XLA VJP."""
    return _make_diff_window_attn(ws, float(scale), group, interpret)(
        q, k, v, rel_pos_h, rel_pos_w
    )
