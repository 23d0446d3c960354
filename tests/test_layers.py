"""Direct numerics tests for the core layer primitives (nn/layers.py).

`_matmul_moments` is load-bearing for every LayerNorm in the model (the
MXU-matmul stat formulation); this pins it against jnp.mean/var directly,
in f32 and in bf16 at flagship activation scales, instead of only
transitively through the model parity tests.
"""
import numpy as np
import jax
import jax.numpy as jnp

from multimodal_sam_adapter_tpu.nn.layers import LayerNorm, _matmul_moments
import pytest

pytestmark = pytest.mark.smoke


def _check_moments(x, atol):
    m, m2 = jax.jit(_matmul_moments)(x)
    xf = np.asarray(x, np.float64)
    want_m = xf.mean(-1)
    want_m2 = (xf * xf).mean(-1)
    np.testing.assert_allclose(np.asarray(m), want_m, atol=atol, rtol=0)
    np.testing.assert_allclose(np.asarray(m2), want_m2, atol=atol, rtol=0)


def test_matmul_moments_f32_matches_numpy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 257)), jnp.float32)
    _check_moments(x, atol=1e-5)


def test_matmul_moments_bf16_flagship_scale():
    """bf16 inputs at the flagship LN shape (4096 tokens x 1024 ch) with
    realistic activation magnitudes: the f32-accumulated matmul moments
    must match float64 moments of the SAME bf16 values to f32 rounding —
    i.e. the formulation adds no error beyond the bf16 inputs."""
    rng = np.random.default_rng(1)
    x64 = rng.standard_normal((4096, 1024)) * 3.0 + 0.7
    x = jnp.asarray(x64, jnp.bfloat16)
    # oracle over the rounded bf16 values, not the original f64 draw
    _check_moments(x, atol=2e-3)


def test_matmul_moments_axis_argument():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 33, 5)), jnp.float32)
    m_ax1, m2_ax1 = _matmul_moments(x, axis=1)
    xm = jnp.moveaxis(x, 1, -1)
    m_ref, m2_ref = _matmul_moments(xm)
    np.testing.assert_allclose(np.asarray(m_ax1), np.asarray(m_ref))
    np.testing.assert_allclose(np.asarray(m2_ax1), np.asarray(m2_ref))


def test_layernorm_matches_flax_f32_and_bf16():
    import flax.linen as fnn

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((17, 384)) * 2.0, jnp.float32)
    ours = LayerNorm()
    flaxln = fnn.LayerNorm()
    v = ours.init(jax.random.PRNGKey(0), x)
    # reuse the same (unit/zero-init) scale+bias for flax
    got = ours.apply(v, x)
    want = flaxln.apply(
        {"params": {"scale": jnp.ones((384,)), "bias": jnp.zeros((384,))}}, x
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    xb = x.astype(jnp.bfloat16)
    got_b = ours.apply(v, xb)
    # bf16 path: stats in f32 — compare against flax with f32 upcast
    want_b = flaxln.apply(
        {"params": {"scale": jnp.ones((384,)), "bias": jnp.zeros((384,))}},
        xb.astype(jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got_b, np.float32),
                               np.asarray(want_b), atol=2e-2)
