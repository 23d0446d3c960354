"""Fused ConvNeXt-block kernel vs the flax module composition.

The kernel (ops/convnext_block.py) must reproduce ConvNeXtBlock
(models/twin_convnext.py; reference twin_convnext.py ConvNeXtBlock:
dwconv7x7 -> LN -> fc1 -> exact GELU -> fc2 -> layer-scale) as the
pre-residual delta, and its custom-vjp gradient must match the module's.
"""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sam_adapter_tpu.models.twin_convnext import ConvNeXtBlock
from multimodal_sam_adapter_tpu.ops.convnext_block import (
    _reference_delta,
    convnext_block_fused,
)


def _params(key, C, HID):
    ks = jax.random.split(key, 9)
    return dict(
        dw=jax.random.normal(ks[0], (7, 7, 1, C), jnp.float32) * 0.1,
        dw_b=0.1 * jax.random.normal(ks[8], (C,), jnp.float32),
        ln_g=1.0 + 0.1 * jax.random.normal(ks[1], (C,), jnp.float32),
        ln_b=0.1 * jax.random.normal(ks[2], (C,), jnp.float32),
        w1=jax.random.normal(ks[3], (C, HID), jnp.float32) * 0.05,
        b1=0.1 * jax.random.normal(ks[4], (HID,), jnp.float32),
        w2=jax.random.normal(ks[5], (HID, C), jnp.float32) * 0.05,
        b2=0.1 * jax.random.normal(ks[6], (C,), jnp.float32),
        gamma=jax.random.normal(ks[7], (C,), jnp.float32),
    )


def test_fused_matches_module_f32():
    C, HID, H = 128, 512, 16
    p = _params(jax.random.PRNGKey(0), C, HID)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, H, H, C), jnp.float32)

    got = convnext_block_fused(x, **{k: v for k, v in p.items()},
                               interpret=True)

    module = ConvNeXtBlock(channels=C, mlp_ratio=HID / C,
                           layer_scale_init_value=1.0)
    mp = {"params": {
        "dwconv": {"kernel": p["dw"], "bias": p["dw_b"]},
        "norm": {"ln": {"scale": p["ln_g"], "bias": p["ln_b"]}},
        "pwconv1": {"kernel": p["w1"], "bias": p["b1"]},
        "pwconv2": {"kernel": p["w2"], "bias": p["b2"]},
        "gamma": p["gamma"],
    }}
    want = module.apply(mp, x) - x  # module returns shortcut + delta
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # the XLA composition used for the backward agrees too
    ref = _reference_delta(x, **{k: v for k, v in p.items()})
    np.testing.assert_allclose(np.asarray(ref), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_matches_module_bf16():
    C, HID, H = 128, 512, 16
    p = _params(jax.random.PRNGKey(2), C, HID)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, H, H, C), jnp.bfloat16)
    got = convnext_block_fused(x, **p, interpret=True).astype(jnp.float32)
    ref = _reference_delta(x, **p).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_fused_grads_match_module():
    C, HID, H = 64, 256, 8
    p = _params(jax.random.PRNGKey(4), C, HID)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, H, H, C), jnp.float32)

    def loss_fused(x, p):
        y = x + convnext_block_fused(x, **p, interpret=True)
        return jnp.sum(y ** 2)

    def loss_ref(x, p):
        y = x + _reference_delta(x, **p)
        return jnp.sum(y ** 2)

    gx1, gp1 = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx2, gp2 = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)
    for k in gp1:
        np.testing.assert_allclose(np.asarray(gp1[k]), np.asarray(gp2[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)


def test_fused_module_param_tree_matches_xla_path():
    """ConvNeXtBlock(impl='fused') must create the IDENTICAL param tree to
    the XLA path (checkpoints/converter are impl-agnostic). Abstract init
    only — the Pallas call never executes off-TPU."""
    x = jnp.ones((1, 16, 16, 128), jnp.float32)

    def shapes(impl):
        m = ConvNeXtBlock(channels=128, layer_scale_init_value=1.0,
                          impl=impl)
        v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
        return jax.tree.map(lambda a: a.shape, v)

    assert shapes("fused") == shapes("xla")
