"""Flash attention with rel-pos vs the dense reference path (interpret)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_sam_adapter_tpu.ops.attention import (
    attention_with_decomposed_rel_pos,
)
from multimodal_sam_adapter_tpu.ops.flash_attention import (
    _MAX_WORK_ELEMS,
    _clamp_flash_tiles,
    flash_attention_rel_pos,
)


@pytest.mark.parametrize("N,H,W,bq,bkr", [
    (4096, 64, 64, 512, 32),   # flagship global block, known-good default
    (4096, 64, 64, 512, 64),   # the r3 regression config: must be clamped
    (4096, 64, 64, 256, 64),
    (196, 14, 14, 512, 64),    # windowed geometry
    (1024, 32, 32, 1024, 64),
    (4096, 64, 64, 4096, 64),  # absurd q-tile: both dims must shrink
])
def test_clamp_flash_tiles_respects_vmem_budget(N, H, W, bq, bkr):
    """The f32 working set — score + prob (Tq, Tk) tiles plus the
    (R + kw, Tk) bias-expand matrix (advisor r4) — must never exceed the
    scoped VMEM budget (the r3 bench regression: block_k_rows=64 at
    block_q=512 busted the 16 MB limit inside the full model), and the
    clamped tiles must still tile the grid exactly."""
    q, r = _clamp_flash_tiles(N, H, W, bq, bkr)
    assert 2 * q * r * W + (r + W) * r * W <= _MAX_WORK_ELEMS
    assert N % q == 0 and H % r == 0
    assert 1 <= q <= N and 1 <= r <= H


@pytest.mark.parametrize("H,W,blk_q,blk_kr", [(8, 8, 16, 2), (4, 8, 32, 4)])
def test_flash_matches_dense(H, W, blk_q, blk_kr):
    rng = np.random.default_rng(0)
    B, d = 3, 32
    N = H * W
    q = rng.standard_normal((B, N, d)).astype(np.float32)
    k = rng.standard_normal((B, N, d)).astype(np.float32)
    v = rng.standard_normal((B, N, d)).astype(np.float32)
    rph = rng.standard_normal((2 * H - 1, d)).astype(np.float32) * 0.5
    rpw = rng.standard_normal((2 * W - 1, d)).astype(np.float32) * 0.5
    scale = d ** -0.5

    want = np.asarray(attention_with_decomposed_rel_pos(
        jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(rph),
        jnp.array(rpw), (H, W), scale,
    ))
    got = np.asarray(flash_attention_rel_pos(
        jnp.stack([jnp.array(q), jnp.array(k), jnp.array(v)]),
        jnp.array(rph), jnp.array(rpw), (H, W), scale,
        block_q=blk_q, block_k_rows=blk_kr, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("blk_q,blk_kr", [
    (16, 8),   # single k-tile: the streamlined nk==1 path (flagship shape)
    (16, 2),   # multi k-tile: the online-softmax recurrence path
])
def test_flash_lane_matches_dense(blk_q, blk_kr):
    """Lane-blocked flash (raw (B, N, 3C) input, packed (B, N, C) output)
    vs the dense per-head reference."""
    from multimodal_sam_adapter_tpu.ops.flash_attention import (
        flash_attention_lane,
    )

    rng = np.random.default_rng(1)
    B, H, W, M, d = 1, 8, 8, 8, 32         # G = 128//32 = 4, P2 = 2
    N = H * W
    qkv = rng.standard_normal((B, N, 3, M, d)).astype(np.float32)
    rph = rng.standard_normal((2 * H - 1, d)).astype(np.float32) * 0.5
    rpw = rng.standard_normal((2 * W - 1, d)).astype(np.float32) * 0.5
    scale = d ** -0.5

    per_head = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * M, N, d)
    want = np.asarray(attention_with_decomposed_rel_pos(
        jnp.array(per_head[0]), jnp.array(per_head[1]),
        jnp.array(per_head[2]), jnp.array(rph), jnp.array(rpw), (H, W),
        scale,
    ))
    want = want.reshape(B, M, N, d).transpose(0, 2, 1, 3).reshape(B, N, M * d)

    qkv_flat = jnp.array(qkv.reshape(B, N, 3 * M * d))
    got = np.asarray(flash_attention_lane(
        qkv_flat, qkv_flat[:, :, : M * d], jnp.array(rph),
        jnp.array(rpw), (H, W), scale, num_heads=M,
        block_q=blk_q, block_k_rows=blk_kr, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flash_lane_vjp_matches_dense():
    from multimodal_sam_adapter_tpu.ops.flash_attention import (
        _make_diff_flash_lane,
    )

    rng = np.random.default_rng(2)
    B, H, W, M, d = 1, 4, 8, 4, 32
    N = H * W
    qkv = jnp.array(rng.standard_normal((B, N, 3 * M * d)), jnp.float32)
    rph = jnp.array(rng.standard_normal((2 * H - 1, d)) * 0.3, jnp.float32)
    rpw = jnp.array(rng.standard_normal((2 * W - 1, d)) * 0.3, jnp.float32)
    g = jnp.array(rng.standard_normal((B, N, M * d)), jnp.float32)
    scale = d ** -0.5

    fn_ = _make_diff_flash_lane((H, W), scale, M, 16, 2, True)

    def fn(qkv_flat, rph_, rpw_):
        # q_rel == the q slice: the module recomputes it with a separate
        # dot over the same weights, so cotangents on both inputs must
        # sum to the dense path's dq
        return fn_(qkv_flat, qkv_flat[:, :, : M * d], rph_, rpw_)

    def dense(qkv_flat, rph_, rpw_):
        q5 = qkv_flat.reshape(B, N, 3, M, d)
        qkvt = q5.transpose(2, 0, 3, 1, 4).reshape(3, B * M, N, d)
        o = attention_with_decomposed_rel_pos(
            qkvt[0], qkvt[1], qkvt[2], rph_, rpw_, (H, W), scale)
        return o.reshape(B, M, N, d).transpose(0, 2, 1, 3).reshape(
            B, N, M * d)

    out_f, vjp_f = jax.vjp(fn, qkv, rph, rpw)
    out_d, vjp_d = jax.vjp(dense, qkv, rph, rpw)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                               rtol=1e-4, atol=1e-5)
    for gf, gd in zip(vjp_f(g), vjp_d(g)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   rtol=1e-3, atol=1e-4)
