"""Fused window attention (Pallas) vs the dense reference path (interpret).

Covers the windowed SAM blocks' attention (reference
base/image_encoder.py:426-501 windowed case): fused QK^T + decomposed
rel-pos bias + softmax + AV, plus the custom-VJP gradients.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_sam_adapter_tpu.ops.attention import (
    attention_with_decomposed_rel_pos,
)
from multimodal_sam_adapter_tpu.ops.window_attention import (
    window_attention_fused,
)


def _inputs(ws, B, d, seed=0):
    rng = np.random.default_rng(seed)
    N = ws * ws
    q = rng.standard_normal((B, N, d)).astype(np.float32)
    k = rng.standard_normal((B, N, d)).astype(np.float32)
    v = rng.standard_normal((B, N, d)).astype(np.float32)
    rph = rng.standard_normal((2 * ws - 1, d)).astype(np.float32) * 0.5
    rpw = rng.standard_normal((2 * ws - 1, d)).astype(np.float32) * 0.5
    return map(jnp.asarray, (q, k, v, rph, rpw))


@pytest.mark.parametrize("ws,B,group", [(7, 6, 4), (14, 5, 8)])
def test_fused_window_attn_matches_dense(ws, B, group):
    d = 32
    q, k, v, rph, rpw = _inputs(ws, B, d)
    scale = d ** -0.5
    want = np.asarray(attention_with_decomposed_rel_pos(
        q, k, v, rph, rpw, (ws, ws), scale))
    got = np.asarray(window_attention_fused(
        q, k, v, rph, rpw, ws, scale, group=group, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_window_attn_grads_match_dense():
    ws, B, d = 7, 4, 32
    q, k, v, rph, rpw = _inputs(ws, B, d, seed=1)
    scale = d ** -0.5

    def loss_dense(q, k, v, rph, rpw):
        o = attention_with_decomposed_rel_pos(q, k, v, rph, rpw, (ws, ws),
                                              scale)
        return jnp.sum(jnp.sin(o))

    def loss_fused(q, k, v, rph, rpw):
        o = window_attention_fused(q, k, v, rph, rpw, ws, scale, group=4,
                                   interpret=True)
        return jnp.sum(jnp.sin(o))

    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(q, k, v, rph, rpw)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, rph, rpw)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ws,windows,heads,group", [(7, 3, 4, 2),
                                                    (14, 2, 16, 8)])
def test_packed_window_attn_matches_dense(ws, windows, heads, group):
    """Packed-output variant (the sam_vit win_fused path): per-head results
    land as head-major lane slices of (windows, N, heads*d)."""
    from multimodal_sam_adapter_tpu.ops.window_attention import (
        window_attention_packed,
    )

    d = 32
    B = windows * heads
    q, k, v, rph, rpw = _inputs(ws, B, d, seed=3)
    scale = d ** -0.5
    want = np.asarray(attention_with_decomposed_rel_pos(
        q, k, v, rph, rpw, (ws, ws), scale))
    want = want.reshape(windows, heads, ws * ws, d).transpose(0, 2, 1, 3)
    want = want.reshape(windows, ws * ws, heads * d)
    qkvt = jnp.stack([q, k, v])
    got = np.asarray(window_attention_packed(
        qkvt, rph, rpw, ws, scale, num_heads=heads, group=group,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def loss_packed(q, k, v, rph, rpw):
        return jnp.sum(window_attention_packed(
            jnp.stack([q, k, v]), rph, rpw, ws, scale, num_heads=heads,
            group=group, interpret=True) ** 2)

    def loss_dense(q, k, v, rph, rpw):
        o = attention_with_decomposed_rel_pos(q, k, v, rph, rpw, (ws, ws),
                                              scale)
        return jnp.sum(o ** 2)

    g1 = jax.grad(loss_packed, (0, 1, 2, 3, 4))(q, k, v, rph, rpw)
    g2 = jax.grad(loss_dense, (0, 1, 2, 3, 4))(q, k, v, rph, rpw)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ws,windows,heads,group", [(7, 3, 4, 2),
                                                    (14, 2, 16, 2),
                                                    (14, 2, 16, 4)])
def test_laneblock_window_attn_matches_dense(ws, windows, heads, group):
    """Lane-blocked variant (the sam_vit win_lane path): consumes the RAW
    qkv projection output (Wn, N, 3*heads*d) with no head-split transpose;
    masked wide dots must equal per-head dense attention, and the custom
    vjp must match dense grads."""
    from multimodal_sam_adapter_tpu.ops.window_attention import (
        window_attention_laneblock,
    )

    d = 32
    B = windows * heads
    q, k, v, rph, rpw = _inputs(ws, B, d, seed=5)
    scale = d ** -0.5
    N = ws * ws
    want = np.asarray(attention_with_decomposed_rel_pos(
        q, k, v, rph, rpw, (ws, ws), scale))
    want = want.reshape(windows, heads, N, d).transpose(0, 2, 1, 3)
    want = want.reshape(windows, N, heads * d)

    def to_dense(q, k, v):
        # (3, Wn*H, N, d) -> the raw projection layout (Wn, N, 3*H*d)
        qkvt = jnp.stack([q, k, v])
        return (qkvt.reshape(3, windows, heads, N, d)
                .transpose(1, 3, 0, 2, 4).reshape(windows, N, 3 * heads * d))

    got = np.asarray(window_attention_laneblock(
        to_dense(q, k, v), rph, rpw, ws, scale, num_heads=heads,
        group=group, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def loss_lane(q, k, v, rph, rpw):
        return jnp.sum(window_attention_laneblock(
            to_dense(q, k, v), rph, rpw, ws, scale, num_heads=heads,
            group=group, interpret=True) ** 2)

    def loss_dense(q, k, v, rph, rpw):
        o = attention_with_decomposed_rel_pos(q, k, v, rph, rpw, (ws, ws),
                                              scale)
        return jnp.sum(o ** 2)

    g1 = jax.grad(loss_lane, (0, 1, 2, 3, 4))(q, k, v, rph, rpw)
    g2 = jax.grad(loss_dense, (0, 1, 2, 3, 4))(q, k, v, rph, rpw)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
