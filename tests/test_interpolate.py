"""torch-parity tests for the interpolation utilities."""
import numpy as np
import pytest
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from multimodal_sam_adapter_tpu.utils.interpolate import (
    resize_bilinear,
    resize_bicubic,
    interp_linear_1d,
)



pytestmark = pytest.mark.smoke


def torch_resize(x_nhwc, out_hw, mode):
    t = torch.from_numpy(np.moveaxis(x_nhwc, -1, 1)).double()
    r = F.interpolate(t, size=out_hw, mode=mode, align_corners=False)
    return np.moveaxis(r.numpy(), 1, -1)


@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (16, 16)), ((13, 9), (7, 21)),
                                          ((64, 64), (32, 32)), ((14, 14), (27, 27))])
def test_bilinear_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    want = torch_resize(x, out_hw, "bilinear")
    got = np.asarray(resize_bilinear(jnp.array(x), out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((64, 64), (32, 32)), ((64, 64), (70, 70)),
                                          ((5, 7), (11, 3))])
def test_bicubic_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, *in_hw, 4)).astype(np.float32)
    want = torch_resize(x, out_hw, "bicubic")
    got = np.asarray(resize_bicubic(jnp.array(x), out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("in_len,out_len", [(27, 127), (127, 27), (10, 10)])
def test_linear_1d_matches_torch(in_len, out_len):
    rng = np.random.default_rng(2)
    table = rng.standard_normal((in_len, 16)).astype(np.float32)
    t = torch.from_numpy(table).double().T[None]  # (1, C, L)
    want = F.interpolate(t, size=out_len, mode="linear").numpy()[0].T
    got = np.asarray(interp_linear_1d(jnp.array(table), out_len))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
