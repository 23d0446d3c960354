"""PixelShuffleUp == nn.ConvTranspose(C,(2,2),strides=(2,2)) bit-for-math.

The pyramid-assembly upsample (reference adapter's `self.up` ConvTranspose2d,
image_encoder...with_cp.py) is re-expressed as dot + depth-to-space for the
MXU; same param tree, same math.
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_sam_adapter_tpu.models.backbone import PixelShuffleUp


def test_pixelshuffle_matches_convtranspose():
    C, H = 24, 6
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, H, H, C), jnp.float32)
    ref = nn.ConvTranspose(C, (2, 2), strides=(2, 2))
    v = ref.init(jax.random.PRNGKey(1), x)
    want = ref.apply(v, x)
    got = PixelShuffleUp(C).apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pixelshuffle_param_tree_matches():
    C = 16
    x = jnp.ones((1, 4, 4, C))
    a = PixelShuffleUp(C).init(jax.random.PRNGKey(0), x)["params"]
    b = nn.ConvTranspose(C, (2, 2), strides=(2, 2)).init(
        jax.random.PRNGKey(0), x)["params"]
    assert {k: v.shape for k, v in a.items()} == \
        {k: v.shape for k, v in b.items()}
