"""Multi-scale deformable attention, TPU-native.

This replaces the reference's 1.7k-LoC CUDA extension
(reference ops/src/cuda/ms_deform_im2col_cuda.cuh) with an XLA program:
the scattered bilinear sampling is expressed as four clamped gathers
(`take_along_axis`) whose bilinear weights, zero-padding masks, and
attention weights are folded into a single multiply-accumulate that XLA
fuses. Gradients come from JAX autodiff (gather -> scatter-add), matching
the CUDA col2im backward semantics. The numerical spec is the pure-torch
`ms_deform_attn_core_pytorch` (reference ops/functions/ms_deform_attn_func.py:53-75):
per-level F.grid_sample(bilinear, zeros padding, align_corners=False)
followed by an attention-weighted sum. `tests/test_msda.py` checks this
implementation against that spec.

Unlike the reference (which hard-errors on CPU,
ops/src/cpu/ms_deform_attn_cpu.cpp), this implementation runs on any XLA
backend.
"""
from __future__ import annotations

import math
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    xs: int = 4,
    packed: bool = False,
) -> jnp.ndarray:
    """Multi-scale deformable attention core.

    Args:
      value: (B, S, M, D) flattened multi-level values, S = sum(H_l*W_l).
      spatial_shapes: static list of (H_l, W_l) per level.
      sampling_locations: (B, Lq, M, L, P, 2) normalized (x, y) in [0, 1].
      attention_weights: (B, Lq, M, L, P), softmaxed over (L, P).
      xs: gathered column slots per footprint (>= 2; 4 makes the gather
        slice 128-lane-minor at D=32).
      packed: gather bf16 value pairs bitcast as f32 (halves gather bytes;
        table stays f32-typed for gather speed, payload is bf16).

    Returns:
      (B, Lq, M*D)
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)

    # TPU layout note: tensors whose minor dim is D=32 pad 4x to the 128-lane
    # tile and blow HBM during training. Everything below keeps big
    # intermediates 128-minor: the gather fetches a (2 rows x 4 cols x D)
    # window FLATTENED to (2, 4*D=128); the bilinear x-weights live on 4 col
    # slots; the final per-point reduction is an MXU dot against a static
    # (4*D, D) slot-collapse matrix.
    out = jnp.zeros((B, M, Lq, D), dtype=jnp.float32)
    offset = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        XS = min(xs, W)  # gathered column slots (>= the 2-wide footprint)
        # (P*2*XS*D, D) static slot-collapse: one MXU dot reduces points,
        # rows and column slots at once (out_d = sum_{p,y,s} wg[pys*D + d]),
        # so no P-broadcast appears in the backward
        collapse = jnp.asarray(
            np.tile(np.eye(D, dtype=np.float32), (P * 2 * XS, 1)), jnp.float32
        )
        val = value[:, offset : offset + H * W]  # (B, HW, M, D)
        offset += H * W
        # (B*M, H, W*D) f32: rows on sublanes, (col, D) flattened on lanes
        # (f32 gathers measure ~1.5x faster than bf16 on v5e)
        val = val.transpose(0, 2, 1, 3).reshape(B * M, H, W * D)
        if packed:
            # bf16 channel pairs bitcast into f32 lanes: the gather moves
            # half the bytes; payload precision is bf16
            val = val.astype(jnp.bfloat16).reshape(B * M, H, W * D // 2, 2)
            val = jax.lax.bitcast_convert_type(val, jnp.float32)
        else:
            val = val.astype(jnp.float32)
        DU = D // 2 if packed else D  # gather units per column

        loc = sampling_locations[:, :, :, lvl]  # (B, Lq, M, P, 2)
        # grid_sample(align_corners=False) pixel coords: loc*size - 0.5
        x = loc[..., 0].astype(jnp.float32) * W - 0.5
        y = loc[..., 1].astype(jnp.float32) * H - 0.5
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        tx = x - x0f
        ty = y - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        bx = jnp.clip(x0, 0, max(W - XS, 0))
        by = jnp.clip(y0, 0, max(H - 2, 0))

        def slot_w(c, i0, t):
            # weight of loaded slot c: (1-t) at c==i0, t at c==i0+1, else 0
            # (encodes both the bilinear weight and zeros-padding validity)
            return jnp.where(c == i0, 1.0 - t, jnp.where(c == i0 + 1, t, 0.0))

        wx = jnp.stack([slot_w(bx + s, x0, tx) for s in range(XS)], -1)
        wy = jnp.stack([slot_w(by, y0, ty), slot_w(by + 1, y0, ty)], -1)
        att = attention_weights[:, :, :, lvl].astype(jnp.float32)
        # (B, Lq, M, P, 2, XS) corner weights with attention folded in
        wmat = (wy[..., :, None] * wx[..., None, :]) * att[..., None, None]
        # (BM, Lq, P*2*XS) in [p][y][slot] minor order
        wmat = wmat.transpose(0, 2, 1, 3, 4, 5).reshape(
            B * M, Lq, P * 2 * XS
        )

        starts = jnp.stack([by, bx * DU], -1)  # (B, Lq, M, P, 2)
        starts = starts.transpose(0, 2, 1, 3, 4).reshape(B * M, Lq * P, 2)

        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3),
            collapsed_slice_dims=(),
            start_index_map=(1, 2),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        )

        # chunk over queries to bound the live f32 window buffers. Chunks
        # run under lax.map with a rematerialized body: sequential on device
        # (the scheduler cannot co-schedule all chunk buffers) and the
        # backward recomputes each chunk's gather instead of saving it —
        # the XLA analogue of the reference's streamed im2col/col2im.
        chunk = min(Lq, 2048)

        def chunk_fn(args):
            starts_c, wmat_c = args  # (BM, chunk*P, 2), (BM, chunk, P2XS)
            g = jax.lax.gather(
                val, starts_c, dnums, slice_sizes=(1, 2, XS * DU),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
            if packed:
                g = jax.lax.bitcast_convert_type(g, jnp.bfloat16)
            g = g.reshape(B * M, chunk, P * 2 * XS * D)
            w_wide = jnp.repeat(wmat_c, D, axis=-1)
            return jax.lax.dot_general(
                g * w_wide, collapse, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BM, chunk, D)

        if Lq <= chunk:
            o = chunk_fn((starts, wmat))
        else:
            pad = (-Lq) % chunk
            sp = jnp.pad(starts, ((0, 0), (0, pad * P), (0, 0)))
            wp = jnp.pad(wmat, ((0, 0), (0, pad), (0, 0)))
            n_ch = (Lq + pad) // chunk
            sp = sp.reshape(B * M, n_ch, chunk * P, 2).transpose(1, 0, 2, 3)
            wp = wp.reshape(B * M, n_ch, chunk, -1).transpose(1, 0, 2, 3)
            o = jax.lax.map(jax.checkpoint(chunk_fn), (sp, wp))
            o = o.transpose(1, 0, 2, 3).reshape(B * M, Lq + pad, D)[:, :Lq]
        out = out + o.reshape(B, M, Lq, D)
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, M * D)
    return out.astype(value.dtype)


def ms_deform_attn_onehot(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """MSDA core as weighted-one-hot MATMULS — zero gathers/scatters.

    For each level, the bilinear sample + attention-weighted reduction is
    exactly out[q] = sum_s Wmat[q, s] * table[s], where Wmat has at most
    P*4 nonzeros per row (the corner weights). Wmat tiles are DENSELY built
    from iota-vs-index compares (VPU) and immediately contracted on the MXU.

    Rationale: scattered reads don't survive every runtime (the 2026-08
    libtpu regression made XLA gathers ~100x slower and broke
    tpu.dynamic_gather compilation) — compares + matmuls always compile to
    full-width vector ops. Gradients are dense for the same reason: d(w)
    re-reduces through the same masks, d(table) = Wmat^T @ g is a matmul
    (the col2im analogue of reference ops/src/cuda/ms_deform_im2col_cuda.cuh
    without atomics). Costs P*4 compare-select passes over (Lq, H*W) per
    level plus a (Lq, HW) x (HW, D) matmul — arithmetically ~30x more
    "work" than the footprint gather, but it's all full-width VPU/MXU.
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)
    # bf16 one-hot + bf16 table on the MXU when the model runs bf16;
    # f32 throughout for f32 inputs (CPU/parity paths)
    mm_dtype = jnp.bfloat16 if value.dtype == jnp.bfloat16 else jnp.float32

    out = jnp.zeros((B, M, Lq, D), dtype=jnp.float32)
    offset = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        HW = H * W
        table = value[:, offset : offset + HW]  # (B, HW, M, D)
        offset += HW
        table = table.transpose(0, 2, 1, 3).astype(mm_dtype)  # (B, M, HW, D)

        # parity-quadrant split: the 2x2 bilinear footprint places EXACTLY
        # one corner in each (y%2, x%2) quadrant, so the one-hot build needs
        # only P compare passes per quadrant (4P*HW/4 = P*HW element-ops,
        # 4x fewer than the flat per-corner build)
        H2, W2 = H + (H % 2), W + (W % 2)
        Hh, Wh = H2 // 2, W2 // 2
        tab = table.reshape(B, M, H, W, D)
        if (H2, W2) != (H, W):
            tab = jnp.pad(tab, ((0, 0), (0, 0), (0, H2 - H), (0, W2 - W),
                                (0, 0)))
        tab = tab.reshape(B, M, Hh, 2, Wh, 2, D).transpose(3, 5, 0, 1, 2, 4, 6)
        quad_tabs = tab.reshape(2, 2, B * M, Hh * Wh, D)

        loc = sampling_locations[:, :, :, lvl]  # (B, Lq, M, P, 2)
        x = loc[..., 0].astype(jnp.float32) * W - 0.5
        y = loc[..., 1].astype(jnp.float32) * H - 0.5
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        tx = x - x0f
        ty = y - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        # clamped footprint bases; slot weights encode both the bilinear
        # weight and the zeros-padding validity (0 when the true corner is
        # outside), exactly as in the footprint-gather path
        a = jnp.clip(x0, 0, max(W - 2, 0))
        b = jnp.clip(y0, 0, max(H - 2, 0))

        def slot_w(c, i0, t):
            return jnp.where(c == i0, 1.0 - t, jnp.where(c == i0 + 1, t, 0.0))

        wy = [slot_w(b, y0, ty), slot_w(b + 1, y0, ty)]
        wx = [slot_w(a, x0, tx), slot_w(a + 1, x0, tx)]
        att = attention_weights[:, :, :, lvl].astype(jnp.float32)

        # per-quadrant (u, v): the footprint corner with (b+i)%2==u,
        # (a+j)%2==v lands at packed index ((b+i)//2)*Wh + (a+j)//2
        idx_q = []
        w_q = []
        bp = b % 2
        ap = a % 2
        for u in range(2):
            iu = (u - bp) % 2  # (B, Lq, M, P) in {0,1}
            yy = b + iu
            wyu = jnp.where(iu == 0, wy[0], wy[1])
            for v in range(2):
                jv = (v - ap) % 2
                xx = a + jv
                wxv = jnp.where(jv == 0, wx[0], wx[1])
                idx_q.append((yy // 2) * Wh + xx // 2)
                w_q.append(wyu * wxv * att)
        # (4, BM, Lq, P)
        idx_q = jnp.stack(idx_q).transpose(0, 1, 3, 2, 4).reshape(
            4, B * M, Lq, P
        )
        w_q = jnp.stack(w_q).transpose(0, 1, 3, 2, 4).reshape(
            4, B * M, Lq, P
        )

        HWq = Hh * Wh
        # chunk queries so the dense (4, BM, chunk, HWq) one-hot tiles stay
        # bounded; lax.map + checkpoint = sequential on device, rebuilt in
        # the backward
        chunk = min(Lq, max(256, (1 << 22) // HW))
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, HWq), 2)
        qt = [quad_tabs[u, v] for u in range(2) for v in range(2)]

        def chunk_fn(args):
            idx_c, w_c = args  # (4, BM, chunk, P)
            o = None
            for q in range(4):
                wmat = jnp.zeros((B * M, idx_c.shape[2], HWq), jnp.float32)
                for p in range(P):
                    wmat = wmat + jnp.where(
                        iota == idx_c[q, :, :, p : p + 1],
                        w_c[q, :, :, p : p + 1], 0.0,
                    )
                oq = jax.lax.dot_general(
                    wmat.astype(mm_dtype), qt[q],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (BM, chunk, D)
                o = oq if o is None else o + oq
            return o

        if Lq <= chunk:
            o = chunk_fn((idx_q, w_q))
        else:
            pad = (-Lq) % chunk
            ip = jnp.pad(idx_q, ((0, 0), (0, 0), (0, pad), (0, 0)))
            wp = jnp.pad(w_q, ((0, 0), (0, 0), (0, pad), (0, 0)))
            n_ch = (Lq + pad) // chunk
            ip = ip.reshape(4, B * M, n_ch, chunk, P).transpose(2, 0, 1, 3, 4)
            wp = wp.reshape(4, B * M, n_ch, chunk, P).transpose(2, 0, 1, 3, 4)
            o = jax.lax.map(jax.checkpoint(chunk_fn), (ip, wp))
            o = o.transpose(1, 0, 2, 3).reshape(B * M, Lq + pad, D)[:, :Lq]
        out = out + o.reshape(B, M, Lq, D)
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, M * D)
    return out.astype(value.dtype)


def msda_directional_bias_init(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Directional grid init for the sampling-offset bias.

    Each head starts pointing at a distinct compass direction, with the p-th
    point (p+1) steps out (reference ops/modules/ms_deform_attn.py:64-75).
    """
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (M, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for p in range(n_points):
        grid[:, :, p, :] *= p + 1
    return grid.reshape(-1).astype(np.float32)


class MSDeformAttention(nn.Module):
    """MSDeformAttn module: projections + sampling + core op.

    Mirrors reference ops/modules/ms_deform_attn.py:28-130 — query-conditioned
    sampling offsets and attention weights, `ratio`-shrunk value projection
    (deform_ratio=0.5 in all MM-SAM configs), and the directional offset-bias
    init — re-expressed as a flax module over the core op.

    impl: 'xla' (gather program), 'pallas' (fused TPU kernel,
    ops/msda_pallas.py), or 'auto' (pallas on TPU backends).
    """

    d_model: int
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    ratio: float = 1.0
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, input_flatten, spatial_shapes):
        """
        Args:
          query: (B, Lq, C)
          reference_points: (B, Lq, n_levels, 2) in [0, 1] (x, y)
          input_flatten: (B, S, C) with S = sum(H_l*W_l)
          spatial_shapes: static list of (H_l, W_l)
        Returns: (B, Lq, C)
        """
        B, Lq, _ = query.shape
        S = input_flatten.shape[1]
        d_value = int(self.d_model * self.ratio)

        value_flat = nn.Dense(d_value, dtype=self.dtype,
                              name="value_proj")(input_flatten)

        offs_flat = nn.Dense(
            self.n_heads * self.n_levels * self.n_points * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                msda_directional_bias_init(self.n_heads, self.n_levels, self.n_points),
                dtype,
            ),
            name="sampling_offsets",
        )(query)

        attn_logits = nn.Dense(
            self.n_heads * self.n_levels * self.n_points,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query)

        # MSA_MSDA_IMPL is a debug/triage knob, resolved at TRACE time (it
        # bakes into the jitted HLO); it only applies when the module was
        # left on 'auto' so it can't silently override configured impls.
        impl = self.impl
        if impl == "auto":
            impl = os.environ.get("MSA_MSDA_IMPL", "auto")
        if impl == "auto":
            # 'pallas_digit' on TPU: the digit-decomposed kernel
            # (msda_pallas._msda_level_digit) measured 1.08/2.50 ms per
            # full injector/extractor call vs 3.70/8.28 for the XLA
            # one-hot — both in-context, v5e flagship shapes. Unlike the
            # earlier fused one-hot kernel (which lost ~45 ms in the full
            # forward to fusion-boundary effects), its idx/w inputs are
            # queries-minor (no tile-padding blowup) and the one-hot never
            # exists outside VMEM. 'onehot' (XLA compare+MXU build) stays
            # the gather-free non-Pallas fallback; 'xla' (gather program)
            # elsewhere (CPU gathers are fine and cheaper than the dense
            # one-hot build).
            impl = ("pallas_digit" if jax.default_backend() == "tpu"
                    else "xla")

        if impl == "pallas_digit":
            # flat custom_vjp boundary: the (B, Lq, M, L, P, 2) location
            # tensor tile-pads ~128x on TPU; the flat projections don't
            from .msda_pallas import make_ms_deform_attn_flat

            # reference points may be batch-broadcast (leading dim 1)
            ref_T = reference_points.astype(jnp.float32)
            ref_T = ref_T.transpose(0, 2, 3, 1).reshape(
                ref_T.shape[0], self.n_levels * 2, Lq
            )
            out = make_ms_deform_attn_flat(
                tuple(spatial_shapes), self.n_heads, self.n_points
            )(value_flat, offs_flat, attn_logits, ref_T)
            return nn.Dense(self.d_model, dtype=self.dtype,
                            name="output_proj")(out)

        value = value_flat.reshape(
            B, S, self.n_heads, d_value // self.n_heads
        )
        offs = offs_flat.reshape(
            B, Lq, self.n_heads, self.n_levels, self.n_points, 2
        )
        attn = attn_logits.reshape(
            B, Lq, self.n_heads, self.n_levels * self.n_points
        )
        attn = jax.nn.softmax(attn, axis=-1)
        attn = attn.reshape(B, Lq, self.n_heads, self.n_levels, self.n_points)

        # normalize offsets by each level's (W, H)
        normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], dtype=offs.dtype
        )  # (L, 2) as (x=W, y=H)
        loc = (
            reference_points[:, :, None, :, None, :]
            + offs / normalizer[None, None, None, :, None, :]
        )

        if impl == "pallas_onehot":
            from .msda_pallas import make_ms_deform_attn

            out = make_ms_deform_attn(
                tuple(spatial_shapes), variant="onehot",
            )(value, loc, attn)
        elif impl == "pallas":
            from .msda_pallas import make_ms_deform_attn

            out = make_ms_deform_attn(tuple(spatial_shapes))(value, loc, attn)
        elif impl == "pallas_loads":
            from .msda_pallas import make_ms_deform_attn

            out = make_ms_deform_attn(
                tuple(spatial_shapes), variant="loads"
            )(value, loc, attn)
        elif impl == "onehot":
            out = ms_deform_attn_onehot(
                value, tuple(spatial_shapes), loc, attn
            )
        else:
            out = ms_deform_attn(value, tuple(spatial_shapes), loc, attn)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)
        return out
