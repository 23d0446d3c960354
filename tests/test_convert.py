"""Converter layout-transform parity: torch modules vs flax modules fed with
converted weights. These pin down the exact kernel layout rules
(engine/convert.py) that checkpoint ingestion relies on."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
from flax import linen as fnn

from multimodal_sam_adapter_tpu.engine.convert import (
    t_linear,
    t_conv,
    t_conv_transpose,
)


import pytest

pytestmark = pytest.mark.smoke


def test_linear_mapping():
    torch.manual_seed(0)
    lin = torch.nn.Linear(8, 5)
    x = torch.randn(3, 8)
    want = lin(x).detach().numpy()
    mod = fnn.Dense(5)
    params = {"params": {"kernel": jnp.array(t_linear(lin.weight.detach().numpy())),
                         "bias": jnp.array(lin.bias.detach().numpy())}}
    got = np.asarray(mod.apply(params, jnp.array(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_conv_mapping():
    torch.manual_seed(1)
    conv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1)
    x = torch.randn(2, 4, 9, 9)
    want = conv(x).detach().numpy().transpose(0, 2, 3, 1)  # -> NHWC
    mod = fnn.Conv(6, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    params = {"params": {"kernel": jnp.array(t_conv(conv.weight.detach().numpy())),
                         "bias": jnp.array(conv.bias.detach().numpy())}}
    got = np.asarray(mod.apply(params, jnp.array(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_depthwise_conv_mapping():
    torch.manual_seed(2)
    conv = torch.nn.Conv2d(6, 6, 7, padding=3, groups=6)
    x = torch.randn(1, 6, 12, 12)
    want = conv(x).detach().numpy().transpose(0, 2, 3, 1)
    mod = fnn.Conv(6, (7, 7), padding=[(3, 3), (3, 3)], feature_group_count=6)
    params = {"params": {"kernel": jnp.array(t_conv(conv.weight.detach().numpy())),
                         "bias": jnp.array(conv.bias.detach().numpy())}}
    got = np.asarray(mod.apply(params, jnp.array(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grouped_conv_dense_matches_torch_grouped():
    """GroupedConvDense (block-diagonal dense execution) vs torch grouped
    conv with the same grouped-shaped kernel."""
    from multimodal_sam_adapter_tpu.models.fusion_neck import GroupedConvDense

    torch.manual_seed(7)
    G, Cin, Cout = 4, 12, 24
    conv = torch.nn.Conv2d(Cin, Cout, 3, padding=1, groups=G, bias=False)
    x = torch.randn(2, Cin, 10, 10)
    want = conv(x).detach().numpy().transpose(0, 2, 3, 1)
    mod = GroupedConvDense(Cout, (3, 3), groups=G, padding=1)
    params = {"params": {"kernel": jnp.array(t_conv(conv.weight.detach().numpy()))}}
    got = np.asarray(mod.apply(params, jnp.array(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_paired_dwconv_matches_torch_grouped():
    """PairedDWConv (4 depthwise convs) vs torch conv with 2 ch/group."""
    from multimodal_sam_adapter_tpu.models.fusion_neck import PairedDWConv

    torch.manual_seed(8)
    G = 6
    conv = torch.nn.Conv2d(2 * G, 2 * G, 3, padding=1, groups=G, bias=False)
    x = torch.randn(2, 2 * G, 9, 9)
    want = conv(x).detach().numpy().transpose(0, 2, 3, 1)
    mod = PairedDWConv(2 * G)
    params = {"params": {"kernel": jnp.array(t_conv(conv.weight.detach().numpy()))}}
    got = np.asarray(mod.apply(params, jnp.array(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv_transpose_mapping():
    """The backbone's `up` layer: ConvTranspose2d(C, C, 2, 2)."""
    torch.manual_seed(3)
    conv = torch.nn.ConvTranspose2d(4, 5, 2, stride=2)
    x = torch.randn(2, 4, 6, 6)
    want = conv(x).detach().numpy().transpose(0, 2, 3, 1)
    mod = fnn.ConvTranspose(5, (2, 2), strides=(2, 2))
    params = {"params": {
        "kernel": jnp.array(t_conv_transpose(conv.weight.detach().numpy())),
        "bias": jnp.array(conv.bias.detach().numpy()),
    }}
    got = np.asarray(mod.apply(params, jnp.array(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vit_attention_module_parity():
    """Full ViTAttention vs an inline-torch expression of the reference
    attention (qkv packing order, head folding, rel-pos, proj)."""
    from multimodal_sam_adapter_tpu.models.sam_vit import ViTAttention

    torch.manual_seed(4)
    B, H, W, C, nh = 2, 6, 6, 16, 2
    hd = C // nh
    qkv_l = torch.nn.Linear(C, 3 * C)
    proj_l = torch.nn.Linear(C, C)
    rel_h = torch.randn(2 * H - 1, hd)
    rel_w = torch.randn(2 * W - 1, hd)
    x = torch.randn(B, H, W, C)

    qkv = qkv_l(x).reshape(B, H * W, 3, nh, -1).permute(2, 0, 3, 1, 4)
    q, k, v = qkv.reshape(3, B * nh, H * W, -1).unbind(0)
    scale = hd ** -0.5
    attn = (q * scale) @ k.transpose(-2, -1)
    idx_h = (torch.arange(H)[:, None] - torch.arange(H)[None, :]) + H - 1
    idx_w = (torch.arange(W)[:, None] - torch.arange(W)[None, :]) + W - 1
    Rh, Rw = rel_h[idx_h], rel_w[idx_w]
    r_q = q.reshape(B * nh, H, W, hd)
    bias = (
        torch.einsum("bhwc,hkc->bhwk", r_q, Rh)[:, :, :, :, None]
        + torch.einsum("bhwc,wkc->bhwk", r_q, Rw)[:, :, :, None, :]
    )
    attn = (attn.view(B * nh, H, W, H, W) + bias).view(B * nh, H * W, H * W)
    out = (attn.softmax(-1) @ v).view(B, nh, H, W, -1).permute(0, 2, 3, 1, 4)
    want = proj_l(out.reshape(B, H, W, C)).detach().numpy()

    mod = ViTAttention(dim=C, num_heads=nh, input_size=(H, W))
    params = {"params": {
        "qkv": {"kernel": jnp.array(t_linear(qkv_l.weight.detach().numpy())),
                "bias": jnp.array(qkv_l.bias.detach().numpy())},
        "proj": {"kernel": jnp.array(t_linear(proj_l.weight.detach().numpy())),
                 "bias": jnp.array(proj_l.bias.detach().numpy())},
        "rel_pos_h": jnp.array(rel_h.numpy()),
        "rel_pos_w": jnp.array(rel_w.numpy()),
    }}
    got = np.asarray(mod.apply(params, jnp.array(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_convnext_block_parity():
    """ConvNeXtBlock vs inline torch (dw7x7 -> LN -> lin(4x) -> gelu -> lin
    -> gamma -> residual), pinning the stage key mapping."""
    from multimodal_sam_adapter_tpu.models.twin_convnext import ConvNeXtBlock

    torch.manual_seed(5)
    C = 8
    dw = torch.nn.Conv2d(C, C, 7, padding=3, groups=C)
    ln = torch.nn.LayerNorm(C, eps=1e-6)
    pw1 = torch.nn.Linear(C, 4 * C)
    pw2 = torch.nn.Linear(4 * C, C)
    gamma = torch.rand(C)
    x = torch.randn(1, C, 10, 10)

    y = dw(x).permute(0, 2, 3, 1)
    y = ln(y)
    y = pw2(torch.nn.functional.gelu(pw1(y)))
    y = y * gamma
    want = (x.permute(0, 2, 3, 1) + y).detach().numpy()

    mod = ConvNeXtBlock(channels=C, layer_scale_init_value=1.0)
    params = {"params": {
        "dwconv": {"kernel": jnp.array(t_conv(dw.weight.detach().numpy())),
                   "bias": jnp.array(dw.bias.detach().numpy())},
        "norm": {"ln": {"scale": jnp.array(ln.weight.detach().numpy()),
                        "bias": jnp.array(ln.bias.detach().numpy())}},
        "pwconv1": {"kernel": jnp.array(t_linear(pw1.weight.detach().numpy())),
                    "bias": jnp.array(pw1.bias.detach().numpy())},
        "pwconv2": {"kernel": jnp.array(t_linear(pw2.weight.detach().numpy())),
                    "bias": jnp.array(pw2.bias.detach().numpy())},
        "gamma": jnp.array(gamma.numpy()),
    }}
    got = np.asarray(mod.apply(params, jnp.array(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_checkpoint_url_source_roundtrip(tmp_path):
    """URL checkpoint sources (reference mmcv_custom/checkpoint.py:364-470
    load_url path): a file:// .pth downloads into the cache once and loads
    identically to the local path."""
    import os
    import torch
    from multimodal_sam_adapter_tpu.engine.checkpoint import (
        load_torch_checkpoint, resolve_checkpoint_source,
    )

    pth = tmp_path / "w.pth"
    torch.save({"state_dict": {"module.w": torch.arange(6.).reshape(2, 3)}},
               str(pth))
    os.environ["MSA_CHECKPOINT_CACHE"] = str(tmp_path / "cache")
    try:
        url = "file://" + str(pth)
        local = resolve_checkpoint_source(url)
        assert local != url and os.path.exists(local)
        assert resolve_checkpoint_source(local) == local  # plain path: no-op
        a = load_torch_checkpoint(url)
        b = load_torch_checkpoint(str(pth))
        np.testing.assert_array_equal(a["w"], b["w"])
        assert resolve_checkpoint_source(url) == local  # cached, no re-fetch
    finally:
        del os.environ["MSA_CHECKPOINT_CACHE"]
