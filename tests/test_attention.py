"""Tests for windowed attention with decomposed rel-pos bias.

Oracle: an independent torch expression of the ViTDet attention math
(reference base/image_encoder.py:465-623).
"""
import numpy as np
import jax.numpy as jnp
import torch

from multimodal_sam_adapter_tpu.ops.attention import (
    window_partition,
    window_unpartition,
    get_rel_pos,
    attention_with_decomposed_rel_pos,
)


def test_window_partition_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 10, 12, 5)).astype(np.float32)
    win, pad_hw = window_partition(jnp.array(x), 4)
    assert pad_hw == (12, 12)
    assert win.shape == (2 * 3 * 3, 4, 4, 5)
    back = window_unpartition(win, 4, pad_hw, (10, 12))
    np.testing.assert_allclose(np.asarray(back), x)


def _torch_rel_pos(q_size, k_size, rel_pos):
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    rp = torch.from_numpy(rel_pos).double()
    if rp.shape[0] != max_rel_dist:
        rp = (
            torch.nn.functional.interpolate(
                rp.T[None], size=max_rel_dist, mode="linear"
            )[0].T
        )
    qc = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    kc = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (qc - kc) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rp[rel.long()]


def test_get_rel_pos_matches_torch_with_resize():
    rng = np.random.default_rng(1)
    table = rng.standard_normal((27, 8)).astype(np.float32)
    for q in (14, 20):
        want = _torch_rel_pos(q, q, table).numpy()
        got = np.asarray(get_rel_pos(q, q, jnp.array(table)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_attention_matches_torch_oracle():
    rng = np.random.default_rng(2)
    B, H, W, d = 3, 7, 5, 16
    N = H * W
    q = rng.standard_normal((B, N, d)).astype(np.float32)
    k = rng.standard_normal((B, N, d)).astype(np.float32)
    v = rng.standard_normal((B, N, d)).astype(np.float32)
    rph = rng.standard_normal((2 * H - 1, d)).astype(np.float32)
    rpw = rng.standard_normal((2 * W - 1, d)).astype(np.float32)
    scale = d ** -0.5

    tq, tk, tv = (torch.from_numpy(a).double() for a in (q, k, v))
    attn = (tq * scale) @ tk.transpose(-2, -1)
    Rh = _torch_rel_pos(H, H, rph)
    Rw = _torch_rel_pos(W, W, rpw)
    r_q = tq.reshape(B, H, W, d)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = (
        attn.view(B, H, W, H, W) + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    ).view(B, N, N)
    want = (attn.softmax(dim=-1) @ tv).numpy()

    got = np.asarray(
        attention_with_decomposed_rel_pos(
            jnp.array(q), jnp.array(k), jnp.array(v),
            jnp.array(rph), jnp.array(rpw), (H, W), scale,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
