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
