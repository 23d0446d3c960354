"""Pallas flash attention with decomposed rel-pos bias (SAM global blocks).

The reference materializes the full (N, N) attention matrix with the
decomposed rel-pos bias added (reference base/image_encoder.py:492-498 +
:587-623). At 1024^2 inputs the 4 global blocks each build a
16-head x 4096 x 4096 matrix (~1 GB f32) — pure HBM bandwidth burn.

This kernel streams K/V tiles through VMEM with the standard online-softmax
recurrence and REBUILDS the decomposed bias inside each tile from two small
per-query terms precomputed in XLA:

    bias[q, k] = rel_h_term[q, kh(k)] + rel_w_term[q, kw(k)]

where rel_h_term = einsum(q, Rh) (B, N, Kh) and rel_w_term = einsum(q, Rw)
(B, N, Kw) are O(N * sqrt(N)) — 64x smaller than the bias itself. For a key
tile of R consecutive grid rows the bias tile is a broadcast of R columns of
rel_h_term plus a tiling of rel_w_term — vector ops only, no gathers.

Numerics: online softmax in f32; the flash recurrence is exact, so outputs
match the dense reference path to f32 rounding (tests/test_flash_attention.py).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import rel_pos_bias_terms

NEG_INF = -1e30

# Scoped-VMEM budget for the kernel's large f32 working tiles. The v5e
# scoped limit is 16 MB for the whole kernel invocation (q/k/v/bias tiles
# + double-buffering included); the live large-f32 working set counted
# here is the two (Tq, Tk) tiles (scores + probs) PLUS the (R + kw, Tk)
# one-hot expand matrix of the fused bias dot (advisor r4: the expand
# tile was previously unaccounted — ~2 MB at flagship, the same silent-
# overflow shape as the round-3 regression below). The cap is calibrated
# to the flagship default (block_q=256, rows=64 at a 64x64 grid):
# 2*256*4096 + 128*4096 = 2.5 * 2^20 f32 elements (10 MB), which is the
# FULL-MODEL-verified working set — larger geometries clamp down, the
# flagship default is unchanged. Round-3 regression for context: flipping
# the default to block_k_rows=64 at block_q=512 compiled in isolation but
# busted scoped VMEM by 120 KB inside the full model. Rule
# (docs/DESIGN.md): no kernel-default change lands without a full-model
# on-chip A/B.
_MAX_WORK_ELEMS = 2 * 256 * 4096 + (64 + 64) * 4096


def _clamp_flash_tiles(N: int, H: int, W: int,
                       block_q: int, block_k_rows: int):
    """Shrink (block_q, block_k_rows) until the f32 working set (score +
    prob + bias-expand tiles) fits the scoped-VMEM budget, preferring to
    shrink the k-tile first (the q-tile amortizes the rel-pos term
    loads)."""

    def work(bq, r):
        tk = r * W
        return 2 * bq * tk + (r + W) * tk

    block_q = min(block_q, N)
    while N % block_q:
        block_q -= 1
    rows = min(block_k_rows, H)
    while H % rows:
        rows -= 1
    while work(block_q, rows) > _MAX_WORK_ELEMS and rows > 1:
        rows = max(r for r in range(1, rows) if H % r == 0)
    while work(block_q, rows) > _MAX_WORK_ELEMS and block_q > 128:
        block_q = max(b for b in range(128, block_q) if N % b == 0)
    return block_q, rows


def _flash_kernel(kw: int, rows_per_tile: int, scale: float,
                  fold_scale: bool,
                  q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref,
                  m_scr, l_scr, acc_scr):
    """Grid: (BH, q_tiles, k_tiles) with k innermost.

    Blocks:
      q_ref:  (1, 1, Tq, d)    k_ref/v_ref: (1, 1, Tk, d)
      rh_ref: (1, Tq, Kh)      rw_ref: (1, Tq, kw)
      o_ref:  (1, Tq, d)
    """
    kt = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kt == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # QK^T on NATIVE-dtype operands (bf16 at runtime): an f32 MXU dot runs
    # at a fraction of the bf16 rate; accumulation stays f32 — standard
    # flash practice. (f32 inputs stay f32: parity tests are
    # bit-comparable.) When the softmax scale is a power of two (every
    # head_dim in shipped configs: d=64 -> 1/8, d=16 -> 1/4) it is folded
    # into the q TILE — a (Tq, d) multiply instead of scaling the
    # (Tq, Tk) f32 score tile, one full-tile VPU pass saved per grid
    # step, and exact in any float dtype. For a non-pow2 scale (e.g.
    # d=80) the fold would round the bf16 operand BEFORE the MXU dot and
    # break f32 bit-comparability, so the caller sets fold_scale=False
    # and the scale lands on the f32 score tile instead.
    if fold_scale:
        q = q_ref[0, 0] * jnp.asarray(scale, q_ref.dtype)   # (Tq, d)
    else:
        q = q_ref[0, 0]
    k = k_ref[0, 0]                            # (Tk, d)
    v = v_ref[0, 0]                            # (Tk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tq, Tk) f32
    if not fold_scale:
        s = s * scale

    # decomposed rel-pos bias for this key tile: the tile covers grid rows
    # [kt*R, kt*R+R), all kw columns each. Mosaic forbids dynamic lane
    # slices, so select the R relevant rel_h columns with a kt-dependent
    # one-hot matmul; then BOTH expansions (rh: element-repeat each of R
    # columns kw times; rw: tile R copies along lanes) run as ONE fused
    # one-hot MXU dot [rh_sel | rw] @ [E_r ; E_w] whose accumulation also
    # performs the rh+rw add. The r4 micro-probe
    # (scripts/tpu_flash_micro_probe.py) showed the bias path costing 2x
    # the QK+AV dots — almost all of it the two (Tq, Tk) f32 VPU adds and
    # the lane-tile repeat this dot replaces; the dot itself is ~1% of a
    # grid step. Every bias element is a single rh+rw two-term f32 sum
    # either way (one product per one-hot row), so the change is exact up
    # to f32 add associativity (~1 ulp).
    Tq = q.shape[0]
    R = rows_per_tile
    Tk = R * kw
    rh = rh_ref[0].astype(jnp.float32)          # (Tq, Kh)
    rw = rw_ref[0].astype(jnp.float32)          # (Tq, kw)
    Kh = rh.shape[-1]
    row0 = kt * R
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (Kh, R), 0)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (Kh, R), 1)
    sel = (h_ids == row0 + r_ids).astype(jnp.float32)      # (Kh, R)
    rh_sel = jax.lax.dot_general(
        rh, sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tq, R) — kt-dependent column select (dynamic lane slices are
    # not expressible in Mosaic; this tiny one-hot dot is)
    comb = jnp.concatenate([rh_sel, rw], axis=1)           # (Tq, R + kw)
    col = jax.lax.broadcasted_iota(jnp.int32, (R + kw, Tk), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R + kw, Tk), 0)
    # select between the two 0/1 planes in FLOAT domain (a where on i1
    # operands trips 'unsupported target bitwidth' in this terminal's
    # Mosaic build)
    expand = jnp.where(row < R,
                       (col // kw == row).astype(jnp.float32),
                       (col % kw == row - R).astype(jnp.float32))
    s = s + jax.lax.dot_general(
        comb, expand, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    m_prev = m_scr[:]                          # (Tq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                     # (Tq, Tk)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    l_scr[:] = l_new
    acc_scr[:] = acc

    @pl.when(kt == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def flash_attention_rel_pos(
    qkvt: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_hw: Tuple[int, int],
    scale: float,
    block_q: int = 256,
    block_k_rows: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ops.attention.attention_with_decomposed_rel_pos
    on square self-attention grids (q_hw == k_hw, N = H*W).

    qkvt: (3, B, N, d) with B folding batch*heads — one array, so the
    caller's q/k/v slices never materialize.
    """
    _, B, N, d = qkvt.shape
    H, W = q_hw
    assert H * W == N
    rel_h, rel_w = rel_pos_bias_terms(qkvt[0], rel_pos_h, rel_pos_w, q_hw,
                                      q_hw)
    rel_h = rel_h.reshape(B, N, H)
    rel_w = rel_w.reshape(B, N, W)

    block_q, rows = _clamp_flash_tiles(N, H, W, block_q, block_k_rows)
    block_k = rows * W
    assert N % block_q == 0, "N must divide block_q for the global grid"

    # fold the softmax scale into q only when exactly representable
    # (power of two); see the kernel comment
    mant, _ = math.frexp(scale)
    fold_scale = mant == 0.5

    out = pl.pallas_call(
        functools.partial(_flash_kernel, W, rows, scale, fold_scale),
        grid=(B, N // block_q, H // rows),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, qt, kt: (0, b, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda b, qt, kt: (1, b, kt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda b, qt, kt: (2, b, kt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, H), lambda b, qt, kt: (b, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, W), lambda b, qt, kt: (b, qt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qt, kt: (b, qt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, d), qkvt.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(qkvt, qkvt, qkvt, rel_h, rel_w)
    return out


def _attn_from_terms(q, k, v, rh, rw, W, scale):
    """Dense attention with the bias given as precomputed per-query terms —
    chunkable over queries (used by the flash backward)."""
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32), preferred_element_type=jnp.float32)
    Bc, Nq, Nk = s.shape
    H = Nk // W
    bias = (rh.astype(jnp.float32)[:, :, :, None]
            + rw.astype(jnp.float32)[:, :, None, :])
    s = s + bias.reshape(Bc, Nq, Nk)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)


def _dense_flash_bwd(q, k, v, rph, rpw, g, q_hw, scale):
    """Chunked dense backward shared by both flash wrappers: one q-band's
    (B, C, N) attention matrix live at a time (sequential lax.map + remat),
    instead of the full (B, N, N) f32 stack (~3 GB per global block at
    1024^2). q/k/v/g: (B_fold, N, d). Returns (dq, dk, dv, drph, drpw)."""
    from .attention import rel_pos_bias_terms

    H, W = q_hw
    B, N, d = q.shape
    (rh, rw), vjp_terms = jax.vjp(
        lambda q_, rph_, rpw_: rel_pos_bias_terms(
            q_, rph_, rpw_, q_hw, q_hw
        ),
        q, rph, rpw,
    )
    rh = rh.reshape(B, N, H)
    rw = rw.reshape(B, N, W)
    C = next((c for c in (512, 384, 256, 128, 64) if N % c == 0), N)
    C = min(C, N)

    def chunk_bwd(args):
        qc, rhc, rwc, gc = args

        def f(qc_, rhc_, rwc_, k_, v_):
            return _attn_from_terms(qc_, k_, v_, rhc_, rwc_, W, scale)

        _, vjp_c = jax.vjp(f, qc, rhc, rwc, k, v)
        return vjp_c(gc)

    if N <= C:
        dq, drh, drw, dk, dv = chunk_bwd((q, rh, rw, g))
    else:
        nch = N // C

        def stack(t):
            return t.reshape(B, nch, C, *t.shape[2:]).transpose(
                1, 0, 2, *range(3, t.ndim + 1)
            )

        outs = jax.lax.map(
            jax.checkpoint(chunk_bwd),
            (stack(q), stack(rh), stack(rw), stack(g)),
        )
        dq_s, drh_s, drw_s, dk_s, dv_s = outs

        def unstack(t):
            return t.transpose(1, 0, 2, *range(3, t.ndim)).reshape(
                B, N, *t.shape[3:]
            )

        dq = unstack(dq_s)
        drh = unstack(drh_s)
        drw = unstack(drw_s)
        dk = dk_s.sum(0)
        dv = dv_s.sum(0)
    dq2, drph, drpw = vjp_terms(
        (drh.reshape(B, H, W, H), drw.reshape(B, H, W, W))
    )
    # dq = attention-path cotangent, dq2 = rel-term-path cotangent — kept
    # separate so the lane wrapper can route them to its two boundary
    # tensors (qkv_flat vs q_rel); the qkvt wrapper sums them
    return dq, dq2.astype(dq.dtype), dk, dv, drph, drpw


@functools.lru_cache(maxsize=None)
def _make_diff_flash(q_hw, scale, block_q, block_k_rows, interpret):
    @jax.custom_vjp
    def fn(qkvt, rph, rpw):
        return flash_attention_rel_pos(
            qkvt, rph, rpw, q_hw, scale,
            block_q=block_q, block_k_rows=block_k_rows, interpret=interpret,
        )

    def fwd(qkvt, rph, rpw):
        return fn(qkvt, rph, rpw), (qkvt, rph, rpw)

    def bwd(res, g):
        qkvt, rph, rpw = res
        dq, dq2, dk, dv, drph, drpw = _dense_flash_bwd(
            qkvt[0], qkvt[1], qkvt[2], rph, rpw, g, q_hw, scale
        )
        return (jnp.stack([dq + dq2, dk, dv]), drph, drpw)

    fn.defvjp(fwd, bwd)
    return fn


def flash_attention_rel_pos_diff(qkvt, rph, rpw, q_hw, scale,
                                 block_q: int = 256, block_k_rows: int = 64,
                                 interpret: bool = False):
    """Differentiable wrapper: Pallas flash forward, dense-path VJP backward
    (one block's dense attention at a time under the stage remat).
    qkvt: (3, B, N, d)."""
    return _make_diff_flash(tuple(q_hw), float(scale), block_q, block_k_rows,
                            interpret)(qkvt, rph, rpw)


def _flash_lane_kernel(kw: int, R: int, scale: float, fold_scale: bool,
                       G: int, d: int, nk: int,
                       q_ref, k_ref, v_ref, rh_ref, rw_ref, e_ref, o_ref,
                       m_scr, l_scr, acc_scr):
    """Lane-blocked flash attention: q/k/v arrive as 128-lane-aligned
    BlockSpec slices of the RAW qkv projection output (feature order
    f = s*M*d + h*d + dd), so the (B, N, 3, M, d) -> (3, BM, N, d)
    marshalling transpose — measured 1.07 ms/global-block, the largest
    single layout copy in the r5 trace — never exists. Per-head dots are
    masked WIDE dots (the window_attention_laneblock trick): zeroed lanes
    kill cross-head inner products exactly (adding 0.0 is exact, so the
    scores are BITWISE equal to the 64-deep per-head dots), and the MXU's
    contraction depth is 128 either way, so the 2x nominal MACs are free.

    Grid: (B * M/G, q_tiles, k_tiles) with k innermost.
    Blocks: q_ref (1, Tq, G*d), k/v_ref (1, Tk, G*d), rh_ref (G, Tq, Kh),
    rw_ref (G, Tq, kw), e_ref (R+kw, Tk) precomputed bias-expand matrix
    (kt-independent, so it is an XLA-side CONSTANT operand — building it
    from iota compares in-kernel cost ~4 VPU passes over (R+kw, Tk) per
    grid step), o_ref (1, Tq, G*d) — heads land packed in their own
    d-wide output lanes, so the caller's (BM, N, d) -> (B, N, M*d)
    un-marshalling transpose disappears too.

    VPU economy (the r5 trace shows the kernel softmax-pass-bound, not
    MXU-bound): the single-k-tile path computes exp STRAIGHT to the AV
    dtype (one fused sub+exp+cast pass) and takes the softmax denominator
    from the AV dot itself — a ones-column planted in an unused lane of
    the masked v operand makes `p @ v_aug` deliver sum(p) for free on the
    MXU, killing the (Tq, Tk) f32 lane-reduction pass.
    Scratch (nk > 1 only): m/l (G, Tq, 1) f32, acc (Tq, G*d) f32.
    """
    kt = pl.program_id(2)

    if nk > 1:
        @pl.when(kt == 0)
        def _init():
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

    qg = q_ref[0]                                  # (Tq, G*d)
    kg = k_ref[0]                                  # (Tk, G*d)
    vg = v_ref[0]
    if fold_scale:
        # fold into k ONCE for all G heads (exact: pow2 scale); q carries
        # the per-head mask so the scale must not ride on q
        kg = kg * jnp.asarray(scale, kg.dtype)
    Tq, L = qg.shape
    Tk = kg.shape[0]
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (Tq, L), 1)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (Tk, L), 1)

    # shared bias expansion machinery (see _flash_kernel for the algebra);
    # the kt-dependent rh column select stays in-kernel, the kt-invariant
    # expand matrix arrives as an operand (e_ref)
    Kh = rh_ref.shape[-1]
    row0 = kt * R
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (Kh, R), 0)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (Kh, R), 1)
    sel = (h_ids == row0 + r_ids).astype(jnp.float32)       # (Kh, R)
    expand = e_ref[...]                                     # (R+kw, Tk)

    o_parts = None
    for h in range(G):
        qh = qg * (lane_q // d == h).astype(qg.dtype)
        s = jax.lax.dot_general(
            qh, kg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (Tq, Tk) f32
        if not fold_scale:
            s = s * scale
        rh = rh_ref[h].astype(jnp.float32)                  # (Tq, Kh)
        rw = rw_ref[h].astype(jnp.float32)                  # (Tq, kw)
        rh_sel = jax.lax.dot_general(
            rh, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # comb holds values that are exactly representable in the rel-term
        # dtype (one-hot selections of rh/rw entries), so the cast to the
        # expand operand's dtype is exact and the bias dot runs at native
        # MXU rate with f32 accumulation — bit-identical to the f32 dot
        comb = jnp.concatenate([rh_sel, rw], axis=1).astype(expand.dtype)
        s = s + jax.lax.dot_general(
            comb, expand, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if nk == 1 and G > 1:
            # single k-tile (the flagship 64x64 geometry after clamping):
            # exact softmax, no online recurrence, no scratch traffic.
            # exp writes STRAIGHT to the AV dtype, and sum(p) rides the AV
            # dot via a ones-column planted in the (zeroed) first lane of
            # the neighbouring head — no (Tq, Tk) lane-reduce pass
            sum_lane = ((h + 1) % G) * d
            vh_aug = (vg * (lane_k // d == h).astype(vg.dtype)
                      + (lane_k == sum_lane).astype(vg.dtype))
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m).astype(vg.dtype)
            o_aug = jax.lax.dot_general(
                p, vh_aug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # (Tq, G*d) f32
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
                      == sum_lane).astype(jnp.float32)
            l = jax.lax.dot_general(                         # (Tq, 1)
                o_aug, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            plane = (lane_q // d == h).astype(jnp.float32) * (1.0 / l)
            o_h = o_aug * plane
            o_parts = o_h if o_parts is None else o_parts + o_h
        elif nk == 1:
            vh = vg * (lane_k // d == h).astype(vg.dtype)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o_h = jax.lax.dot_general(
                p.astype(vg.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / l                                           # (Tq, G*d)
            o_parts = o_h if o_parts is None else o_parts + o_h
        else:
            vh = vg * (lane_k // d == h).astype(vg.dtype)
            m_prev = m_scr[h]                               # (Tq, 1)
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[h] = l_scr[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_scr[h] = m_new
            # rescale ONLY this head's d output lanes of the packed acc
            scale_lanes = jnp.where(lane_q // d == h, alpha, 1.0)
            acc_scr[:] = acc_scr[:] * scale_lanes + jax.lax.dot_general(
                p.astype(vg.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    if nk == 1:
        o_ref[0] = o_parts.astype(o_ref.dtype)
    else:
        @pl.when(kt == nk - 1)
        def _finish():
            linv = jnp.zeros((Tq, L), jnp.float32)
            for h in range(G):
                linv = jnp.where(lane_q // d == h, 1.0 / l_scr[h], linv)
            o_ref[0] = (acc_scr[:] * linv).astype(o_ref.dtype)


def flash_attention_lane(
    qkv_flat: jnp.ndarray,
    q_rel: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_hw: Tuple[int, int],
    scale: float,
    num_heads: int,
    block_q: int = 256,
    block_k_rows: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over the RAW qkv projection output.

    qkv_flat: (B, N, 3*M*d) — the Dense layer's output, untouched (feature
    order f = s*M*d + h*d + dd). q_rel: (B, N, M*d) — the q projection
    AGAIN, from a SEPARATE dot over the same weights: the rel-pos term
    einsums must not read the qkv tensor, or XLA double-materializes it
    (the Pallas custom call needs its operand in its own buffer; a second
    consumer forced a 0.54 ms relayout copy per global block, r5 trace —
    one extra 8.6 GFLOP q dot is ~10x cheaper). Returns (B, N, M*d) with
    heads packed — directly consumable by the proj matmul. Requires
    128 % d == 0 and M % (128//d) == 0 (all SAM configs: d=64 -> 2-head
    groups).
    """
    B, N, F = qkv_flat.shape
    M = num_heads
    d = F // (3 * M)
    H, W = q_hw
    assert H * W == N and 128 % d == 0 and M % (128 // d) == 0
    G = 128 // d
    P2 = M // G                                   # lane groups per s slot

    # rel-pos terms from the separate q dot — (B, M, N, K) reshaped to
    # (BM, N, K) is layout-free (no (3, BM, N, d) marshalling)
    r_q = q_rel.reshape(B, H, W, M, d)
    Rh_t, Rw_t = _rel_tables(H, W, rel_pos_h, rel_pos_w, r_q.dtype)
    rel_h = jnp.einsum("bhwmc,hkc->bmhwk", r_q, Rh_t).reshape(B * M, N, H)
    rel_w = jnp.einsum("bhwmc,wkc->bmhwk", r_q, Rw_t).reshape(B * M, N, W)

    block_q, rows = _clamp_flash_tiles(N, H, W, block_q, block_k_rows)
    block_k = rows * W
    nk = H // rows
    mant, _ = math.frexp(scale)
    fold_scale = mant == 0.5

    # kt-invariant bias-expand matrix as a constant operand (in-kernel
    # iota builds cost ~4 VPU passes over (R+kw, Tk) per grid step). Its
    # entries are 0/1 so the compute dtype cast is exact.
    col = jnp.arange(block_k)[None, :]
    row = jnp.arange(rows + W)[:, None]
    expand = jnp.where(row < rows,
                       col // W == row,
                       col % W == row - rows).astype(qkv_flat.dtype)

    scratch = []
    if nk > 1:
        scratch = [
            pltpu.VMEM((G, block_q, 1), jnp.float32),
            pltpu.VMEM((G, block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, G * d), jnp.float32),
        ]

    def kern(*refs):
        if nk > 1:
            args = refs
        else:
            args = refs + (None, None, None)
        _flash_lane_kernel(W, rows, scale, fold_scale, G, d, nk, *args)

    out = pl.pallas_call(
        kern,
        grid=(B * P2, N // block_q, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, 128),
                         lambda g, qt, kt: (g // P2, qt, g % P2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 128),
                         lambda g, qt, kt: (g // P2, kt, P2 + g % P2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 128),
                         lambda g, qt, kt: (g // P2, kt, 2 * P2 + g % P2),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_q, H), lambda g, qt, kt: (g, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_q, W), lambda g, qt, kt: (g, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows + W, block_k), lambda g, qt, kt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128),
                               lambda g, qt, kt: (g // P2, qt, g % P2),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, M * d), qkv_flat.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(qkv_flat, qkv_flat, qkv_flat, rel_h, rel_w, expand)
    return out


def _rel_tables(H, W, rel_pos_h, rel_pos_w, dtype):
    from .attention import get_rel_pos

    return (get_rel_pos(H, H, rel_pos_h).astype(dtype),
            get_rel_pos(W, W, rel_pos_w).astype(dtype))


@functools.lru_cache(maxsize=None)
def _make_diff_flash_lane(q_hw, scale, num_heads, block_q, block_k_rows,
                          interpret):
    H, W = q_hw
    N = H * W
    M = num_heads

    @jax.custom_vjp
    def fn(qkv_flat, q_rel, rph, rpw):
        return flash_attention_lane(
            qkv_flat, q_rel, rph, rpw, q_hw, scale, num_heads,
            block_q=block_q, block_k_rows=block_k_rows, interpret=interpret,
        )

    def fwd(qkv_flat, q_rel, rph, rpw):
        return fn(qkv_flat, q_rel, rph, rpw), (qkv_flat, rph, rpw)

    def bwd(res, g):
        # the flat->per-head marshalling the forward avoids is fine HERE:
        # the backward is already dominated by the chunked dense recompute.
        # q_rel == the q slice of qkv_flat numerically, so the recompute
        # uses qkvt[0] for both paths and routes the rel-term cotangent to
        # the q_rel input (autodiff outside sums the weight grads).
        qkv_flat, rph, rpw = res
        B = qkv_flat.shape[0]
        d = qkv_flat.shape[-1] // (3 * M)
        qkv5 = qkv_flat.reshape(B, N, 3, M, d)
        qkvt = qkv5.transpose(2, 0, 3, 1, 4).reshape(3, B * M, N, d)
        gt = g.reshape(B, N, M, d).transpose(0, 2, 1, 3).reshape(B * M, N, d)
        dq, dq2, dk, dv, drph, drpw = _dense_flash_bwd(
            qkvt[0], qkvt[1], qkvt[2], rph, rpw, gt, q_hw, scale
        )
        dflat = jnp.stack([dq, dk, dv]).reshape(3, B, M, N, d)
        dflat = dflat.transpose(1, 3, 0, 2, 4).reshape(B, N, 3 * M * d)
        dq_rel = dq2.reshape(B, M, N, d).transpose(0, 2, 1, 3).reshape(
            B, N, M * d)
        return (dflat, dq_rel, drph, drpw)

    fn.defvjp(fwd, bwd)
    return fn


def flash_attention_lane_diff(qkv_flat, q_rel, rph, rpw, q_hw, scale,
                              num_heads, block_q: int = 256,
                              block_k_rows: int = 64,
                              interpret: bool = False):
    """Differentiable lane-blocked flash: Pallas forward off the raw qkv
    projection, dense-path chunked VJP backward. qkv_flat: (B, N, 3*M*d);
    q_rel: (B, N, M*d) separate q dot for the rel terms (see
    flash_attention_lane); returns (B, N, M*d) heads-packed."""
    return _make_diff_flash_lane(tuple(q_hw), float(scale), int(num_heads),
                                 block_q, block_k_rows, interpret)(
        qkv_flat, q_rel, rph, rpw)
