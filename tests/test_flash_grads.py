"""Flash-attention custom VJP (chunked dense backward) vs autodiff of the
dense reference path."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from multimodal_sam_adapter_tpu.ops.attention import (
    attention_with_decomposed_rel_pos,
)
from multimodal_sam_adapter_tpu.ops.flash_attention import _make_diff_flash

pytestmark = pytest.mark.slow


def test_flash_vjp_matches_dense():
    rng = np.random.default_rng(0)
    B, H, W, d = 2, 8, 8, 16
    N = H * W
    q = jnp.array(rng.standard_normal((B, N, d)), jnp.float32)
    k = jnp.array(rng.standard_normal((B, N, d)), jnp.float32)
    v = jnp.array(rng.standard_normal((B, N, d)), jnp.float32)
    rph = jnp.array(rng.standard_normal((2 * H - 1, d)) * 0.3, jnp.float32)
    rpw = jnp.array(rng.standard_normal((2 * W - 1, d)) * 0.3, jnp.float32)
    g = jnp.array(rng.standard_normal((B, N, d)), jnp.float32)
    scale = d ** -0.5

    fn = _make_diff_flash((H, W), scale, 16, 2, True)  # interpret kernel
    out_f, vjp_f = jax.vjp(fn, jnp.stack([q, k, v]), rph, rpw)
    out_d, vjp_d = jax.vjp(
        lambda qkvt, rph_, rpw_: attention_with_decomposed_rel_pos(
            qkvt[0], qkvt[1], qkvt[2], rph_, rpw_, (H, W), scale),
        jnp.stack([q, k, v]), rph, rpw,
    )
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                               rtol=1e-4, atol=1e-5)
    for gf, gd in zip(vjp_f(g), vjp_d(g)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   rtol=1e-3, atol=1e-4)


def test_flash_vjp_chunked_path_matches_dense():
    """N=1024 > chunk size 512 exercises the lax.map + jax.checkpoint
    chunked backward (the flagship N=4096 regime; prior cases stayed on
    the single-chunk branch)."""
    rng = np.random.default_rng(3)
    B, H, W, d = 1, 32, 32, 16
    N = H * W
    q = jnp.array(rng.standard_normal((B, N, d)) * 0.2, jnp.float32)
    k = jnp.array(rng.standard_normal((B, N, d)) * 0.2, jnp.float32)
    v = jnp.array(rng.standard_normal((B, N, d)) * 0.2, jnp.float32)
    rph = jnp.array(rng.standard_normal((2 * H - 1, d)) * 0.1, jnp.float32)
    rpw = jnp.array(rng.standard_normal((2 * W - 1, d)) * 0.1, jnp.float32)
    g = jnp.array(rng.standard_normal((B, N, d)), jnp.float32)
    scale = d ** -0.5

    fn = _make_diff_flash((H, W), scale, 256, 8, True)
    out_f, vjp_f = jax.vjp(fn, jnp.stack([q, k, v]), rph, rpw)
    out_d, vjp_d = jax.vjp(
        lambda qkvt, rph_, rpw_: attention_with_decomposed_rel_pos(
            qkvt[0], qkvt[1], qkvt[2], rph_, rpw_, (H, W), scale),
        jnp.stack([q, k, v]), rph, rpw,
    )
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                               rtol=1e-4, atol=1e-5)
    for gf, gd in zip(vjp_f(g), vjp_d(g)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   rtol=1e-3, atol=1e-4)
