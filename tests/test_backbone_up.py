"""PixelShuffleUp == nn.ConvTranspose(C,(2,2),strides=(2,2)) bit-for-math.

The pyramid-assembly upsample (reference adapter's `self.up` ConvTranspose2d,
image_encoder...with_cp.py) is re-expressed as dot + depth-to-space for the
MXU. The kernel param is stored dot-ready as (C, 2, 2, O) — the flax
ConvTranspose kernel spatially flipped and axis-moved (2, 0, 1, 3), which
equals torch's (I, O, kh, kw) weight transposed (0, 2, 3, 1).
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_sam_adapter_tpu.models.backbone import PixelShuffleUp


def _from_convtranspose(v):
    """Map flax ConvTranspose params {kernel (2,2,C,O), bias} to
    PixelShuffleUp params {kernel (C,2,2,O), bias}."""
    k = np.asarray(v["params"]["kernel"])
    return {"params": {
        "kernel": jnp.asarray(k[::-1, ::-1].transpose(2, 0, 1, 3)),
        "bias": v["params"]["bias"],
    }}


def test_pixelshuffle_matches_convtranspose():
    C, H = 24, 6
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, H, H, C), jnp.float32)
    ref = nn.ConvTranspose(C, (2, 2), strides=(2, 2))
    v = ref.init(jax.random.PRNGKey(1), x)
    want = ref.apply(v, x)
    got = PixelShuffleUp(C).apply(_from_convtranspose(v), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pixelshuffle_matches_torch_convtranspose2d():
    """Direct oracle for the converter mapping (convert_full.py 'up.weight'):
    torch ConvTranspose2d(I, O, 2, stride=2) == PixelShuffleUp with
    kernel = weight.transpose(0, 2, 3, 1)."""
    import torch

    C, O, H = 12, 8, 5
    torch.manual_seed(0)
    m = torch.nn.ConvTranspose2d(C, O, 2, stride=2)
    x = torch.randn(2, C, H, H)
    with torch.no_grad():
        want = m(x).permute(0, 2, 3, 1).numpy()
    params = {"params": {
        "kernel": jnp.asarray(
            m.weight.detach().numpy().transpose(0, 2, 3, 1)),
        "bias": jnp.asarray(m.bias.detach().numpy()),
    }}
    got = PixelShuffleUp(O).apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_pixelshuffle_init_shapes():
    C = 16
    x = jnp.ones((1, 4, 4, C))
    p = PixelShuffleUp(C).init(jax.random.PRNGKey(0), x)["params"]
    assert p["kernel"].shape == (C, 2, 2, C)
    assert p["bias"].shape == (C,)


def test_pixel_shuffle_up_bn_kernel_matches_composition():
    """Fused dot+depth-to-space+adds+affine (ops/pixel_shuffle.py) vs the
    XLA composition (PixelShuffleUp + adds + explicit affine)."""
    from multimodal_sam_adapter_tpu.ops.pixel_shuffle import (
        pixel_shuffle_up_bn,
    )

    rng = np.random.default_rng(0)
    B, H, W, C, O = 2, 4, 6, 16, 24
    c2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((C, 2, 2, O)) * 0.2, jnp.float32)
    c1 = jnp.asarray(rng.standard_normal((B, 2 * H, 2 * W, O)), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((B, 2 * H, 2 * W, O)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((O,)) * 0.5 + 1.0, jnp.float32)
    t = jnp.asarray(rng.standard_normal((O,)), jnp.float32)

    y = (c2.reshape(B * H * W, C) @ k.reshape(C, 4 * O)).reshape(
        B, H, W, 2, 2, O)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(B, 2 * H, 2 * W, O)
    want = (y + c1 + x1) * s + t

    got = pixel_shuffle_up_bn(c2, k, c1, x1, s, t, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_backbone_fused_f1_matches_composition(monkeypatch):
    """MSA_UP_FUSED inference path == the XLA composition at the model
    level (tiny backbone; eval BN affine recovered via basis inputs)."""
    from tests.test_model_forward import TINY_BACKBONE
    from multimodal_sam_adapter_tpu.models.segmentor import EncoderDecoder

    model = EncoderDecoder(num_classes=5, head_channels=16,
                           backbone_cfg=TINY_BACKBONE)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 64, 64, 6)),
        jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # give the BN stats non-trivial values so the affine actually bites
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.1 if v.ndim == 1 else v, variables)

    monkeypatch.setenv("MSA_UP_FUSED", "0")
    want = model.apply(variables, x, train=False,
                       method=model.features)
    monkeypatch.setenv("MSA_UP_FUSED", "1")
    monkeypatch.setenv("MSA_FORCE_TPU_IMPL", "1")
    monkeypatch.setenv("MSA_PALLAS_INTERPRET", "1")
    got = model.apply(variables, x, train=False, method=model.features)
    # f1 is the fused output; f2..f4 must be bit-identical
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=2e-5, atol=2e-5)
    for a, b in zip(got[1:], want[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
