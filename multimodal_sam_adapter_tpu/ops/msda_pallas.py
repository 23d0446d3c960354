"""Pallas TPU kernels for multi-scale deformable attention.

The reference implements this op as a CUDA im2col kernel
(reference ops/src/cuda/ms_deform_im2col_cuda.cuh:238-301: one thread per
(batch, query, head, channel) doing 4-corner bilinear gathers). The TPU
re-design splits the work:

1. XLA phase (`_prepare_level`, dense VPU math, no gathers): for every
   (query, head, point) compute the four CLAMPED corner row indices into the
   flattened (H*W, D) level table and the four corner weights with
   zero-padding validity and the attention weight folded in.
2. Pallas phase, two interchangeable kernels:
   - 'gather' (default): Mosaic's tpu.dynamic_gather (vectorized per-lane
     sublane gather, reached via jnp.take_along_axis inside the kernel).
     The whole level table for one head lives in VMEM; each query tile
     gathers all its corner rows in ONE vector op and reduces with the
     folded weights on the VPU.
   - 'loads': scalar-driven fallback; per (query, point, y-corner) one
     sublane-ALIGNED (16, D) block load + iota-select of the two needed
     rows (Mosaic requires dynamic sublane starts to be 8-aligned, so the
     unaligned 2-row footprint is cut out of an aligned 16-row window).

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


def _prepare_level(loc_l, att_l, H: int, W: int, paired: bool):
    """Corner indices + folded weights for one level.

    loc_l: (B, Lq, M, P, 2) normalized (x, y); att_l: (B, Lq, M, P).

    paired=True (loads kernel): returns rbase (BM, Lq, P, 2) int32 = the two
    y-corner base rows (col pair is contiguous) and wmat (BM, Lq, P, 4)
    where wmat[..., 2i+j] weighs loaded row (cy0+i), col (cx0+j).

    paired=False (gather kernel): returns ridx (BM, Lq, P*4) int32 flat
    corner rows and w (BM, Lq, P*4) f32.
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

    wx = jnp.stack([slot_w(cx0, x0, tx), slot_w(cx0 + 1, x0, tx)], -1)
    wy = jnp.stack([slot_w(cy0, y0, ty), slot_w(cy0 + 1, y0, ty)], -1)
    wmat = wy[..., :, None] * wx[..., None, :]  # (B,Lq,M,P,2,2)
    wmat = wmat * att_l.astype(jnp.float32)[..., None, None]

    if paired:
        rbase = jnp.stack([cy0 * W + cx0, (cy0 + 1) * W + cx0], -1)
        rbase = rbase.transpose(0, 2, 1, 3, 4).reshape(B * M, Lq, P, 2)
        w = wmat.transpose(0, 2, 1, 3, 4, 5).reshape(B * M, Lq, P, 4)
        return rbase, w
    rows = jnp.stack(
        [cy0 * W + cx0, cy0 * W + cx0 + 1,
         (cy0 + 1) * W + cx0, (cy0 + 1) * W + cx0 + 1], -1,
    )  # (B,Lq,M,P,4) matching wmat flattened (2,2)->(4,)
    rows = rows.transpose(0, 2, 1, 3, 4).reshape(B * M, Lq, P * 4)
    w = wmat.reshape(B, Lq, M, P * 4).transpose(0, 2, 1, 3)
    w = w.reshape(B * M, Lq, P * 4)
    return rows, w


# ---------------------------------------------------------------------------
# variant 1: tpu.dynamic_gather
# ---------------------------------------------------------------------------

def _gather_kernel(P4: int, T: int, D: int, HW: int,
                   idx_ref, w_ref, val_ref, out_ref):
    # Mosaic supports only 2-D ops around tpu.dynamic_gather and no
    # sublane-splitting reshapes, so reduce over the P4 corner slots with
    # one full-table gather per slot (gather cost scales with the table,
    # so T is chosen large to amortize). The gather requires index/result
    # bitwidths to match: gather in f32 against int32 indices.
    table = val_ref[0].astype(jnp.float32)
    acc = jnp.zeros((T, D), jnp.float32)
    for j in range(P4):
        idx_j = idx_ref[0, :, j : j + 1]              # (T, 1)
        idxf = jnp.broadcast_to(idx_j, (T, D))
        if HW > T:
            idxf = jnp.pad(idxf, ((0, HW - T), (0, 0)))
        g = jnp.take_along_axis(table, idxf, axis=0,
                                mode="promise_in_bounds")
        acc = acc + g[:T] * w_ref[0, :, j : j + 1]
    out_ref[0] = acc.astype(out_ref.dtype)


def _msda_level_gather(value_l, ridx, w, interpret: bool = False):
    """value_l: (BM, HW, D); ridx/w: (BM, Lq, P4). Returns (BM, Lq, D)."""
    BM, HW, D = value_l.shape
    _, Lq, P4 = ridx.shape
    # gather output shape must equal the table shape, so T <= HW
    T = max(8, min(2048, HW))
    pad = (-Lq) % T
    if pad:
        ridx = jnp.pad(ridx, ((0, 0), (0, pad), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, pad), (0, 0)))
    Lqp = Lq + pad
    out = pl.pallas_call(
        functools.partial(_gather_kernel, P4, T, D, HW),
        grid=(BM, Lqp // T),
        in_specs=[
            pl.BlockSpec((1, T, P4), lambda bm, t: (bm, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, P4), lambda bm, t: (bm, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HW, D), lambda bm, t: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda bm, t: (bm, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, Lqp, D), value_l.dtype),
        interpret=interpret,
    )(ridx, w, value_l)
    return out[:, :Lq]


# ---------------------------------------------------------------------------
# variant 2: aligned block loads + iota select (fallback)
# ---------------------------------------------------------------------------

_ALIGN = 16  # sublane alignment window (covers f32 tile 8 and bf16 tile 16)


def _loads_kernel(P: int, T: int, D: int, rb_ref, wm_ref, val_ref, out_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (_ALIGN, 1), 0)

    def body(t, _):
        acc = jnp.zeros((1, D), jnp.float32)
        for p in range(P):
            for i in range(2):
                r = rb_ref[0, t, p, i]
                base = pl.multiple_of((r // 8) * 8, 8)
                block = val_ref[0, pl.ds(base, _ALIGN), :].astype(jnp.float32)
                off = r - base
                w0 = wm_ref[0, t, p, 2 * i]
                w1 = wm_ref[0, t, p, 2 * i + 1]
                sel = (
                    jnp.where(lane == off, w0, 0.0)
                    + jnp.where(lane == off + 1, w1, 0.0)
                )
                acc = acc + jnp.sum(block * sel, axis=0, keepdims=True)
        out_ref[0, pl.ds(t, 1), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, T, body, 0)


def _msda_level_loads(value_l, rbase, wmat, T: int = 128,
                      interpret: bool = False):
    """value_l: (BM, HW, D) f32; rbase: (BM, Lq, P, 2); wmat (BM, Lq, P, 4)."""
    BM, HW, D = value_l.shape
    _, Lq, P, _ = rbase.shape
    value_l = jnp.pad(value_l, ((0, 0), (0, _ALIGN), (0, 0)))
    pad = (-Lq) % T
    if pad:
        rbase = jnp.pad(rbase, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wmat = jnp.pad(wmat, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Lqp = Lq + pad
    out = pl.pallas_call(
        functools.partial(_loads_kernel, P, T, D),
        grid=(BM, Lqp // T),
        in_specs=[
            pl.BlockSpec((1, T, P, 2), lambda bm, t: (bm, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, P, 4), lambda bm, t: (bm, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HW + _ALIGN, D), lambda bm, t: (bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda bm, t: (bm, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, Lqp, D), value_l.dtype),
        interpret=interpret,
    )(rbase, wmat, value_l)
    return out[:, :Lq]


# ---------------------------------------------------------------------------
# variant 3: fused parity-quadrant one-hot (compare + MXU, zero gathers)
# ---------------------------------------------------------------------------

def _prepare_level_quadrant(loc_l, att_l, H: int, W: int):
    """Quadrant-packed corner indices/weights (the ops.msda one-hot scheme):
    the 2x2 bilinear footprint places exactly one corner in each (y%2, x%2)
    parity quadrant. Returns idx, w: (4, BM, Lq, P) int32/f32, where idx is
    the packed index into that quadrant's (ceil(H/2)*ceil(W/2)) table."""
    B, Lq, M, P, _ = loc_l.shape
    Wh = (W + 1) // 2
    x = loc_l[..., 0].astype(jnp.float32) * W - 0.5
    y = loc_l[..., 1].astype(jnp.float32) * H - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    tx = x - x0f
    ty = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    a = jnp.clip(x0, 0, max(W - 2, 0))
    b = jnp.clip(y0, 0, max(H - 2, 0))

    def slot_w(c, i0, t):
        return jnp.where(c == i0, 1.0 - t, jnp.where(c == i0 + 1, t, 0.0))

    wy = [slot_w(b, y0, ty), slot_w(b + 1, y0, ty)]
    wx = [slot_w(a, x0, tx), slot_w(a + 1, x0, tx)]
    att = att_l.astype(jnp.float32)
    bp = b % 2
    ap = a % 2
    idx_q, w_q = [], []
    for u in range(2):
        iu = (u - bp) % 2
        yy = b + iu
        wyu = jnp.where(iu == 0, wy[0], wy[1])
        for v in range(2):
            jv = (v - ap) % 2
            xx = a + jv
            wxv = jnp.where(jv == 0, wx[0], wx[1])
            idx_q.append((yy // 2) * Wh + xx // 2)
            w_q.append(wyu * wxv * att)
    idx = jnp.stack(idx_q).transpose(0, 1, 3, 2, 4).reshape(4, B * M, Lq, P)
    w = jnp.stack(w_q).transpose(0, 1, 3, 2, 4).reshape(4, B * M, Lq, P)
    return idx, w


def _quadrant_tables(value_l, H: int, W: int):
    """(BM, HW, D) -> (4, BM, HWq, D) parity-quadrant tables (zero-padded
    to even H/W)."""
    BM, HW, D = value_l.shape
    H2, W2 = H + (H % 2), W + (W % 2)
    tab = value_l.reshape(BM, H, W, D)
    if (H2, W2) != (H, W):
        tab = jnp.pad(tab, ((0, 0), (0, H2 - H), (0, W2 - W), (0, 0)))
    tab = tab.reshape(BM, H2 // 2, 2, W2 // 2, 2, D)
    tab = tab.transpose(2, 4, 0, 1, 3, 5)
    return tab.reshape(4, BM, (H2 // 2) * (W2 // 2), D)


def _onehot_kernel(P: int, TQ: int, HWq: int, D: int, mm_dtype,
                   idx_ref, w_ref, tab_ref, out_ref, acc_ref):
    # one quadrant per grid step; the weighted one-hot tile is built in
    # VMEM (never touches HBM — the XLA formulation streams ~Q*HW*4 bytes
    # of Wmat per head through HBM) and contracted immediately on the MXU
    q = pl.program_id(2)

    @pl.when(q == 0)
    def _():
        acc_ref[:] = jnp.zeros((TQ, D), jnp.float32)

    iota = jax.lax.broadcasted_iota(jnp.int32, (TQ, HWq), 1)
    wmat = jnp.zeros((TQ, HWq), jnp.float32)
    for p in range(P):
        # 3 VPU ops/element (cmp, broadcast-add, select), all concrete
        # layouts — Mosaic rejects jnp.where(mask, lane-replicated wv, 0)
        # (i1 relayout), and the cast form (eq.astype * wv) costs 4 ops
        idx = idx_ref[0, 0, :, p : p + 1]            # (TQ, 1), lane-replicated
        wv = w_ref[0, 0, :, p : p + 1]               # (TQ, 1) f32
        wmat = jnp.where(iota == idx, wmat + wv, wmat)
    if mm_dtype != jnp.float32:
        wmat = wmat.astype(mm_dtype)
    acc_ref[:] += jax.lax.dot_general(
        wmat, tab_ref[0, 0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q == 3)
    def _():
        out_ref[0] = acc_ref[:]


def _msda_level_onehot(value_l, H, W, loc_l, att_l, interpret: bool = False):
    """value_l: (BM, HW, D); loc_l: (B, Lq, M, P, 2). Returns (BM, Lq, D) f32."""
    BM, HW, D = value_l.shape
    B, Lq, M, P, _ = loc_l.shape
    mm_dtype = jnp.bfloat16 if value_l.dtype == jnp.bfloat16 else jnp.float32
    idx, w = _prepare_level_quadrant(loc_l, att_l, H, W)
    tabs = _quadrant_tables(value_l.astype(mm_dtype), H, W)
    HWq = tabs.shape[2]
    TQ = min(1024 if HWq <= 1024 else 256, max(128, Lq))
    pad = (-Lq) % TQ
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad), (0, 0)))
    Lqp = Lq + pad
    out = pl.pallas_call(
        functools.partial(_onehot_kernel, P, TQ, HWq, D, mm_dtype),
        grid=(BM, Lqp // TQ, 4),
        in_specs=[
            pl.BlockSpec((1, 1, TQ, P), lambda bm, t, q: (q, bm, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TQ, P), lambda bm, t, q: (q, bm, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HWq, D), lambda bm, t, q: (q, bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, D), lambda bm, t, q: (bm, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, Lqp, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TQ, D), jnp.float32)],
        interpret=interpret,
    )(idx, w, tabs)
    return out[:, :Lq]


# ---------------------------------------------------------------------------
# variant 4: digit-decomposed one-hot (lo-digit MXU contraction + hi-digit
# VPU select) — the fastest TPU formulation measured here
# ---------------------------------------------------------------------------
#
# The quadrant one-hot (variant 3 / ops.msda.ms_deform_attn_onehot) pays
# P compare-select passes over the FULL HWq-slot axis per query — its VPU
# floor (~P*HW element-ops/query/head) dominates MSDA at flagship shapes.
# Digit split: write the packed quadrant index as s = hi*LO + lo and note
#   out[q] = sum_p w_p T[s_p] = sum_p sum_h [hi_p==h] (dlo_p @ T[h*LO:...]),
# i.e. a weighted one-hot over the LO-wide lo-digit (built with LO compares,
# contracted on the MXU against the digit-regrouped table) followed by an
# HI-way select-accumulate over the hi-digit (HI*D VPU ops). Total VPU work
# per (query, point): 2*LO + 3*HI*D instead of 3*HW/4 — 3-4x less at
# LO*HI = HW/4 — while the MXU pays P*HW*D MACs (4x the P-summed wmat dot,
# but the MXU has ~50x the VPU's throughput). Everything lives in VMEM;
# the streamed XLA wmat (Lq*HW*4 bytes/head of HBM traffic) disappears.
#
# Layout: queries ride the LANE axis throughout (idx/w arrive as
# (4, BM, P, Lq) — minor dim Lq, so no 4..32x tile padding on the small
# side inputs, unlike a (.., Lq, P) layout), the one-hot is built
# transposed (LO sublanes x TQ lanes), and the dot computes
# U^T = tabT @ dloT so every per-query scalar broadcast is a natural
# lane-vector broadcast in Mosaic.


def _digit_lo(slots: int) -> int:
    """lo-digit width: >=128 (full MXU contraction depth), <=512 (VMEM),
    targeting HI ~= 8 so the hi-select stays cheap."""
    lo = 128
    while slots > lo * 8 and lo < 512:
        lo *= 2
    return lo


def _quad_prep_body(H: int, W: int, x, y, att):
    """In-kernel port of _prepare_quadrant_T on (P, TQ) VMEM tiles.

    Yields (quad, idxq, wq) for the 4 corner quadrants, idxq/wq (P, TQ)
    f32, quad ordered u-major like the (4, ...) quadrant tables. Same
    formulas as the XLA prep (exact same values; all arithmetic stays in
    f32 — integer-valued f32 ops/compares are exact below 2^24 and this
    terminal's Mosaic build rejects in-kernel f32->i32 truncation).
    Computing the prep per grid step replaces the (4, BM, P, Lq) idx/w
    boundary tensors — 88 MB of HBM write+read per flagship extractor
    call — with the three (BM, P, Lq) coordinate tensors (~17 MB read).
    """
    Wh = float((W + 1) // 2)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    a = jnp.clip(x0, 0.0, float(max(W - 2, 0)))
    b = jnp.clip(y0, 0.0, float(max(H - 2, 0)))

    def slot_w(c, i0, t):
        return jnp.where(c == i0, 1.0 - t, jnp.where(c == i0 + 1.0, t, 0.0))

    wy = (slot_w(b, y0, ty), slot_w(b + 1.0, y0, ty))
    wx = (slot_w(a, x0, tx), slot_w(a + 1.0, x0, tx))
    bp = jnp.mod(b, 2.0)
    ap = jnp.mod(a, 2.0)
    for u in range(2):
        iu = jnp.mod(u - bp, 2.0)
        yy = b + iu
        wyu = jnp.where(iu == 0.0, wy[0], wy[1])
        for v in range(2):
            jv = jnp.mod(v - ap, 2.0)
            xx = a + jv
            wxv = jnp.where(jv == 0.0, wx[0], wx[1])
            idxq = jnp.floor(yy * 0.5) * Wh + jnp.floor(xx * 0.5)
            wq = wyu * wxv * att
            yield u * 2 + v, idxq, wq


def _digit_contract(P, LO, HI, D, TQ, mm_dtype, tab_ref, quads, acc):
    """Shared digit contraction: quads yields (quad, idxq, wq) (P, TQ).

    idxq may be int32 (precomputed prep) or integer-valued f32 (in-kernel
    prep, which avoids Mosaic-unsupported f32->i32 truncation). In the f32
    case the digit split uses mod/floor-multiply — LO is a power of two
    and idx < 2^24, so both are exact."""
    for quad, idxq, wq in quads:
        tab = tab_ref[quad, 0]                            # (HI*D, LO)
        flt = jnp.issubdtype(idxq.dtype, jnp.floating)
        # Mosaic's tpu.iota is integer-only: build i32 and widen (sitofp)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (LO, TQ), 0)
        if flt:
            iota_lo = iota_lo.astype(jnp.float32)
        for p in range(P):
            idx = idxq[p : p + 1, :]                      # (1, TQ)
            wv = wq[p : p + 1, :]                         # (1, TQ) f32
            if flt:
                lo = jnp.mod(idx, float(LO))
                hi = jnp.floor(idx * (1.0 / LO))
            else:
                lo = idx % LO
                hi = idx // LO
            dlo = jnp.where(iota_lo == lo, wv.astype(jnp.float32), 0.0)
            ut = jax.lax.dot_general(
                tab, dlo.astype(mm_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (HI*D, TQ)
            for h in range(HI):
                acc = acc + jnp.where(
                    hi == (float(h) if flt else h),
                    ut[h * D : (h + 1) * D, :], 0.0
                )
    return acc


def _digit_kernel_prep(P: int, TQ: int, LO: int, HI: int, D: int,
                       H: int, W: int, mm_dtype,
                       x_ref, y_ref, a_ref, tab_ref, out_ref):
    """Single-level digit kernel with IN-KERNEL quadrant prep: consumes the
    raw absolute sampling coordinates x/y and folded attention weights
    (each (1, P, TQ) blocks of (BM, P, Lq)) instead of precomputed idx/w."""
    quads = _quad_prep_body(H, W, x_ref[0], y_ref[0], a_ref[0])
    acc = jnp.zeros((D, TQ), jnp.float32)
    acc = _digit_contract(P, LO, HI, D, TQ, mm_dtype, tab_ref, quads, acc)
    out_ref[0] = acc.astype(out_ref.dtype)


def _digit_kernel(P: int, TQ: int, LO: int, HI: int, D: int, mm_dtype,
                  idx_ref, w_ref, tab_ref, out_ref):
    """Pre-computed-idx digit kernel (the non-flat `variant='digit'` path).

    All 4 quadrants are processed inside one grid step (the tables fit
    VMEM comfortably): 4x fewer grid steps than a (.., 4) grid axis —
    the kernel is partly step-overhead-bound at flagship shapes. The
    contraction is the shared _digit_contract so this path cannot drift
    from the in-kernel-prep variants."""
    quads = ((q, idx_ref[q, 0], w_ref[q, 0]) for q in range(4))
    acc = jnp.zeros((D, TQ), jnp.float32)
    acc = _digit_contract(P, LO, HI, D, TQ, mm_dtype, tab_ref, quads, acc)
    out_ref[0] = acc.astype(out_ref.dtype)


def _msda_level_digit(value_l, H, W, loc_l, att_l, interpret: bool = False):
    """value_l: (BM, HW, D); loc_l: (B, Lq, M, P, 2). Returns (BM, Lq, D) f32."""
    BM, HW, D = value_l.shape
    B, Lq, M, P, _ = loc_l.shape
    mm_dtype = jnp.bfloat16 if value_l.dtype == jnp.bfloat16 else jnp.float32
    idx, w = _prepare_level_quadrant(loc_l, att_l, H, W)   # (4, BM, Lq, P)
    # queries minor: (4, BM, P, Lq) — lane-aligned, no tile padding
    idx = idx.transpose(0, 1, 3, 2)
    w = w.transpose(0, 1, 3, 2)
    tabs = _quadrant_tables(value_l.astype(mm_dtype), H, W)  # (4,BM,HWq,D)
    HWq = tabs.shape[2]
    LO = _digit_lo(HWq)
    HI = -(-HWq // LO)
    if LO * HI != HWq:
        tabs = jnp.pad(tabs, ((0, 0), (0, 0), (0, LO * HI - HWq), (0, 0)))
    # digit-regrouped, transposed table: (4, BM, HI*D, LO)
    tabs = tabs.reshape(4, BM, HI, LO, D).transpose(0, 1, 2, 4, 3)
    tabs = tabs.reshape(4, BM, HI * D, LO)
    TQ = 1024 if Lq >= 1024 else (512 if Lq >= 512 else max(128, Lq))
    pad = (-Lq) % TQ
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, 0), (0, pad)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, pad)))
    Lqp = Lq + pad
    out = pl.pallas_call(
        functools.partial(_digit_kernel, P, TQ, LO, HI, D, mm_dtype),
        grid=(BM, Lqp // TQ),
        in_specs=[
            pl.BlockSpec((4, 1, P, TQ), lambda bm, t: (0, bm, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, P, TQ), lambda bm, t: (0, bm, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, HI * D, LO), lambda bm, t: (0, bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, TQ), lambda bm, t: (bm, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, D, Lqp), jnp.float32),
        interpret=interpret,
    )(idx, w, tabs)
    return out[:, :, :Lq].transpose(0, 2, 1)               # (BM, Lq, D)


def _prepare_quadrant_T(x, y, att, H: int, W: int):
    """Queries-minor quadrant prep: x, y are absolute level-grid coords
    (already *W - 0.5 / *H - 0.5), att the folded attention weight, all
    (BM, P, Lq). Returns idx, w: (4, BM, P, Lq) — the same quantities as
    _prepare_level_quadrant but with Lq on the lane axis end to end, so the
    whole prep fuses into one elementwise pass with no tile-padding blowup
    (the (.., P, 2)-minor layouts of the untransposed path tile-pad 32-128x
    and were measured as multi-ms DMA copies at the custom_vjp boundary).
    """
    Wh = (W + 1) // 2
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    tx = x - x0f
    ty = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    a = jnp.clip(x0, 0, max(W - 2, 0))
    b = jnp.clip(y0, 0, max(H - 2, 0))

    def slot_w(c, i0, t):
        return jnp.where(c == i0, 1.0 - t, jnp.where(c == i0 + 1, t, 0.0))

    wy = [slot_w(b, y0, ty), slot_w(b + 1, y0, ty)]
    wx = [slot_w(a, x0, tx), slot_w(a + 1, x0, tx)]
    bp = b % 2
    ap = a % 2
    idx_q, w_q = [], []
    for u in range(2):
        iu = (u - bp) % 2
        yy = b + iu
        wyu = jnp.where(iu == 0, wy[0], wy[1])
        for v in range(2):
            jv = (v - ap) % 2
            xx = a + jv
            wxv = jnp.where(jv == 0, wx[0], wx[1])
            idx_q.append((yy // 2) * Wh + xx // 2)
            w_q.append(wyu * wxv * att)
    return jnp.stack(idx_q), jnp.stack(w_q)


def _digit_tables(value_l, H: int, W: int, LO: int, HI: int):
    """(BM, H*W, D) -> (4, BM, HI*D, LO) digit-regrouped quadrant tables in
    ONE transpose (the _quadrant_tables + regroup pair costs two full-table
    relayout copies at 32-lane-minor tiling). Requires even H/W, LO a
    multiple of Wh = W/2 and Hh divisible by LO/Wh; callers fall back to the
    two-step path otherwise."""
    BM, HW, D = value_l.shape
    Hh, Wh = H // 2, W // 2
    k = LO // Wh
    tab = value_l.reshape(BM, HI, k, 2, Wh, 2, D)
    tab = tab.transpose(3, 5, 0, 1, 6, 2, 4)   # (y2, x2, BM, HI, D, k, Wh)
    return tab.reshape(4, BM, HI * D, LO)


def _digit_tables_flat(val_flat, B: int, H: int, W: int, M: int, D: int,
                       LO: int, HI: int):
    """(B, H*W, M*D) channel-flat value -> (4, BM, HI*D, LO) digit tables in
    ONE transpose, never materializing the 4x-lane-padded (B, S, M, D)
    layout. Same divisibility conditions as _digit_tables."""
    Wh = W // 2
    k = LO // Wh
    tab = val_flat.reshape(B, HI, k, 2, Wh, 2, M, D)
    tab = tab.transpose(3, 5, 0, 6, 1, 7, 2, 4)  # (y2,x2,B,M,HI,D,k,Wh)
    return tab.reshape(4, B * M, HI * D, LO)


def _digit_pallas_call_prep(x, y, att, tabs, D: int, P: int, LO: int,
                            HI: int, H: int, W: int, mm_dtype, out_dtype,
                            interpret: bool):
    """x/y/att: (BM, P, Lq) raw coords + folded weights; tabs:
    (4, BM, HI*D, LO) -> (BM, D, Lq). Quadrant prep runs inside the
    kernel (_quad_prep_body)."""
    BM, _, Lq = x.shape
    TQ = 1024 if Lq >= 1024 else (512 if Lq >= 512 else max(128, Lq))
    pad = (-Lq) % TQ
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        y = jnp.pad(y, ((0, 0), (0, 0), (0, pad)))
        att = jnp.pad(att, ((0, 0), (0, 0), (0, pad)))
    Lqp = Lq + pad
    coord_spec = pl.BlockSpec((1, P, TQ), lambda bm, t: (bm, 0, t),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_digit_kernel_prep, P, TQ, LO, HI, D, H, W,
                          mm_dtype),
        grid=(BM, Lqp // TQ),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((4, 1, HI * D, LO), lambda bm, t: (0, bm, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, TQ), lambda bm, t: (bm, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, D, Lqp), out_dtype),
        interpret=interpret,
    )(x, y, att, tabs)
    return out[:, :, :Lq]


def _digit_kernel_multi_prep(P: int, TQ: int, D: int, lohi, hws, mm_dtype,
                             *refs):
    """Multi-level variant of _digit_kernel_prep: refs = (x_ref, y_ref,
    att_ref each (L, 1, P, TQ), tab_ref_0..tab_ref_{L-1}, out_ref)."""
    x_ref, y_ref, a_ref = refs[0], refs[1], refs[2]
    tab_refs = refs[3:-1]
    out_ref = refs[-1]
    acc = jnp.zeros((D, TQ), jnp.float32)
    for lvl, ((LO, HI), (H, W)) in enumerate(zip(lohi, hws)):
        quads = _quad_prep_body(H, W, x_ref[lvl, 0], y_ref[lvl, 0],
                                a_ref[lvl, 0])
        acc = _digit_contract(P, LO, HI, D, TQ, mm_dtype, tab_refs[lvl],
                              quads, acc)
    out_ref[0] = acc.astype(out_ref.dtype)


def _digit_pallas_call_multi_prep(x3, y3, att3, tabs_list, D: int, P: int,
                                  lohi, hws, mm_dtype, out_dtype,
                                  interpret: bool):
    """x3/y3/att3: (L, BM, P, Lq); tabs_list[l]: (4, BM, HI_l*D, LO_l).
    Returns (BM, D, Lq) summed over levels, quadrant prep in-kernel."""
    L, BM, _, Lq = x3.shape
    TQ = 1024 if Lq >= 1024 else (512 if Lq >= 512 else max(128, Lq))
    pad = (-Lq) % TQ
    if pad:
        x3 = jnp.pad(x3, ((0, 0),) * 3 + ((0, pad),))
        y3 = jnp.pad(y3, ((0, 0),) * 3 + ((0, pad),))
        att3 = jnp.pad(att3, ((0, 0),) * 3 + ((0, pad),))
    Lqp = Lq + pad
    coord_spec = pl.BlockSpec((L, 1, P, TQ), lambda bm, t: (0, bm, 0, t),
                              memory_space=pltpu.VMEM)
    in_specs = [coord_spec, coord_spec, coord_spec]
    for (LO, HI) in lohi:
        in_specs.append(
            pl.BlockSpec((4, 1, HI * D, LO), lambda bm, t: (0, bm, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        functools.partial(_digit_kernel_multi_prep, P, TQ, D, tuple(lohi),
                          tuple(hws), mm_dtype),
        grid=(BM, Lqp // TQ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, D, TQ), lambda bm, t: (bm, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, D, Lqp), out_dtype),
        interpret=interpret,
    )(x3, y3, att3, *tabs_list)
    return out[:, :, :Lq]


def ms_deform_attn_digit_flat_fwd(
    value_flat: jnp.ndarray,
    offs_flat: jnp.ndarray,
    attn_logits_flat: jnp.ndarray,
    ref_T: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    n_heads: int,
    n_points: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Digit-MSDA forward over FLAT module projections.

    value_flat: (B, S, M*D) channel-flat value projection (the (B, S, M, D)
    layout lane-pads 4x at (16, 32) minor dims and, as a boundary tensor,
    costs ~90 MB of padded HBM per call); offs_flat: (B, Lq, M*L*P*2) raw sampling-offset
    projection; attn_logits_flat: (B, Lq, M*L*P) PRE-softmax attention
    logits; ref_T: (B, L*2, Lq) reference points, (x, y) minor-paired per
    level, queries on the lane axis.

    Rationale: these are the natural (well-tiled) layouts of the module's
    Dense outputs. The (B, Lq, M, L, P, 2) sampling_locations tensor of the
    generic API tile-pads ~128x on TPU and, as a custom_vjp boundary value,
    is forced into HBM at that layout — measured as the dominant MSDA
    overhead at flagship shapes. Here the boundary carries the flat tensors
    and ALL prep (normalization, softmax over L*P, quadrant packing) runs
    queries-minor and fuses.
    """
    B, S, MD = value_flat.shape
    M = n_heads
    D = MD // M
    L = len(spatial_shapes)
    P = n_points
    _, Lq, _ = offs_flat.shape
    mm_dtype = (jnp.bfloat16 if value_flat.dtype == jnp.bfloat16
                else jnp.float32)

    # (B, M, L, P, 2, Lq) / (B, M, L, P, Lq), queries-minor
    offsT = offs_flat.transpose(0, 2, 1).reshape(B, M, L, P, 2, Lq)
    offsT = offsT.astype(jnp.float32)
    attnT = attn_logits_flat.transpose(0, 2, 1).reshape(B, M, L * P, Lq)
    attnT = jax.nn.softmax(attnT.astype(jnp.float32), axis=2)
    attnT = attnT.reshape(B, M, L, P, Lq)
    refT = ref_T.astype(jnp.float32).reshape(ref_T.shape[0], L, 2, Lq)

    x_l, y_l, att_l, tabs_l, lohi = [], [], [], [], []
    offset = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        val2 = value_flat[:, offset : offset + H * W]    # (B, HW, M*D)
        offset += H * W
        # absolute level-grid coords: (ref + off/wh) * WH - 0.5
        #   = ref*W + off - 0.5 (offsets are in value-grid pixels)
        rx = refT[:, lvl, 0][:, None, None, :]           # (B, 1, 1, Lq)
        ry = refT[:, lvl, 1][:, None, None, :]
        x = rx * W + offsT[:, :, lvl, :, 0] - 0.5
        y = ry * H + offsT[:, :, lvl, :, 1] - 0.5
        x = x.reshape(B * M, P, Lq)
        y = y.reshape(B * M, P, Lq)
        att = attnT[:, :, lvl].reshape(B * M, P, Lq)
        HWq = ((H + 1) // 2) * ((W + 1) // 2)
        LO = _digit_lo(HWq)
        HI = -(-HWq // LO)
        # NB: an 8-D single-transpose table build straight from the flat
        # layout measured ~7 ms SLOWER end-to-end than this two-step path
        # (XLA lowers the gnarly permutation poorly); only the BOUNDARY
        # stays flat
        val = val2.reshape(B, H * W, M, D)
        val = val.transpose(0, 2, 1, 3).reshape(B * M, H * W, D)
        if (H % 2 == 0 and W % 2 == 0 and LO % (W // 2) == 0
                and (H // 2) % (LO // (W // 2)) == 0 and LO * HI == HWq):
            tabs = _digit_tables(val.astype(mm_dtype), H, W, LO, HI)
        else:
            tabs = _quadrant_tables(val.astype(mm_dtype), H, W)
            if LO * HI != HWq:
                tabs = jnp.pad(tabs, ((0, 0), (0, 0), (0, LO * HI - HWq),
                                      (0, 0)))
            tabs = tabs.reshape(4, B * M, HI, LO, D).transpose(0, 1, 2, 4, 3)
            tabs = tabs.reshape(4, B * M, HI * D, LO)
        x_l.append(x)
        y_l.append(y)
        att_l.append(att)
        tabs_l.append(tabs)
        lohi.append((LO, HI))
    if L > 1:
        # one multi-level kernel: per-step fixed costs amortize Lx and the
        # per-level partial sums never round-trip HBM; quadrant prep runs
        # IN-KERNEL from the raw (L, BM, P, Lq) coordinate stacks instead
        # of materializing (4, BM, P, Lq) idx/w boundary tensors
        x3 = jnp.stack(x_l)
        y3 = jnp.stack(y_l)
        att3 = jnp.stack(att_l)
        out = _digit_pallas_call_multi_prep(
            x3, y3, att3, tabs_l, D, P, lohi, spatial_shapes, mm_dtype,
            value_flat.dtype, interpret)
    else:
        out = _digit_pallas_call_prep(
            x_l[0], y_l[0], att_l[0], tabs_l[0], D, P, lohi[0][0],
            lohi[0][1], spatial_shapes[0][0], spatial_shapes[0][1],
            mm_dtype, value_flat.dtype, interpret)
    # the kernels cast at the write (out_dtype above), so this is a no-op
    # kept as a guard; the big output transpose below runs at value dtype
    out = out.astype(value_flat.dtype)
    # (BM, D, Lq) -> (B, Lq, M*D)
    out = out.reshape(B, M, D, Lq).transpose(0, 3, 1, 2).reshape(B, Lq, M * D)
    return out


def make_ms_deform_attn_flat(spatial_shapes: Sequence[Tuple[int, int]],
                             n_heads: int, n_points: int,
                             interpret: bool = False):
    """custom_vjp MSDA over flat module projections (see
    ms_deform_attn_digit_flat_fwd). Backward = autodiff of the XLA one-hot
    formulation over the same flat inputs (gather-free col2im analogue)."""
    return _make_ms_deform_attn_flat_cached(
        tuple(tuple(s) for s in spatial_shapes), n_heads, n_points, interpret
    )


@functools.lru_cache(maxsize=None)
def _make_ms_deform_attn_flat_cached(shapes, n_heads, n_points, interpret):
    from .msda import ms_deform_attn_onehot

    L = len(shapes)
    P = n_points
    M = n_heads

    def _xla_flat(value_flat, offs_flat, attn_logits_flat, ref_T):
        B, S, MD = value_flat.shape
        value = value_flat.reshape(B, S, M, MD // M)
        Lq = offs_flat.shape[1]
        Br = ref_T.shape[0]
        offs = offs_flat.reshape(B, Lq, M, L, P, 2).astype(jnp.float32)
        attn = jax.nn.softmax(
            attn_logits_flat.reshape(B, Lq, M, L * P).astype(jnp.float32),
            axis=-1,
        ).reshape(B, Lq, M, L, P)
        ref = ref_T.reshape(Br, L, 2, Lq).transpose(0, 3, 1, 2)
        normalizer = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
        loc = ref[:, :, None, :, None, :] + offs / normalizer[None, None,
                                                              None, :, None]
        return ms_deform_attn_onehot(value, shapes, loc,
                                     attn.astype(value.dtype))

    @jax.custom_vjp
    def fn(value_flat, offs_flat, attn_logits_flat, ref_T):
        return ms_deform_attn_digit_flat_fwd(
            value_flat, offs_flat, attn_logits_flat, ref_T, shapes, M, P,
            interpret=interpret,
        )

    def fwd(value_flat, offs_flat, attn_logits_flat, ref_T):
        return fn(value_flat, offs_flat, attn_logits_flat, ref_T), (
            value_flat, offs_flat, attn_logits_flat, ref_T)

    def bwd(res, g):
        value_flat, offs_flat, attn_logits_flat, ref_T = res
        _, vjp = jax.vjp(_xla_flat, value_flat, offs_flat,
                         attn_logits_flat, ref_T)
        dv, doffs, dattn, dref = vjp(g.astype(value_flat.dtype))
        return dv, doffs, dattn, dref

    fn.defvjp(fwd, bwd)
    return fn


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def ms_deform_attn_pallas_fwd(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    variant: str = "gather",
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
        loc_l = sampling_locations[:, :, :, lvl]
        att_l = attention_weights[:, :, :, lvl]
        if variant == "digit":
            o = _msda_level_digit(val, H, W, loc_l, att_l,
                                  interpret=interpret)
        elif variant == "onehot":
            o = _msda_level_onehot(val, H, W, loc_l, att_l,
                                   interpret=interpret)
        elif variant == "gather":
            ridx, w = _prepare_level(loc_l, att_l, H, W, paired=False)
            o = _msda_level_gather(val, ridx, w, interpret=interpret)
        else:
            rbase, wmat = _prepare_level(loc_l, att_l, H, W, paired=True)
            o = _msda_level_loads(val.astype(jnp.float32), rbase, wmat,
                                  interpret=interpret)
        out = out + o.astype(jnp.float32)
    out = out.reshape(B, M, Lq, D).transpose(0, 2, 1, 3).reshape(B, Lq, M * D)
    return out.astype(value.dtype)


def make_ms_deform_attn(spatial_shapes: Sequence[Tuple[int, int]],
                        variant: str = "gather", interpret: bool = False):
    """custom_vjp MSDA for fixed (static) spatial shapes: Pallas forward,
    XLA-gather autodiff backward (the col2im analogue)."""
    return _make_ms_deform_attn_cached(
        tuple(tuple(s) for s in spatial_shapes), variant, interpret
    )


@functools.lru_cache(maxsize=None)
def _make_ms_deform_attn_cached(shapes, variant: str, interpret: bool):
    from .msda import ms_deform_attn as msda_xla
    from .msda import ms_deform_attn_onehot as msda_onehot

    # backward = autodiff of the matching XLA formulation (the col2im
    # analogue). The onehot/digit variants' backward must avoid gathers too
    # (the 2026-08 libtpu regression makes scatter/gather ~100x slower).
    bwd_impl = msda_onehot if variant in ("onehot", "digit") else msda_xla

    @jax.custom_vjp
    def fn(value, loc, att):
        return ms_deform_attn_pallas_fwd(value, shapes, loc, att,
                                         variant=variant, interpret=interpret)

    def fwd(value, loc, att):
        return fn(value, loc, att), (value, loc, att)

    def bwd(res, g):
        value, loc, att = res
        _, vjp = jax.vjp(lambda v, l, a: bwd_impl(v, shapes, l, a),
                         value, loc, att)
        return vjp(g.astype(value.dtype))

    fn.defvjp(fwd, bwd)
    return fn
