"""Numerics tests for the multi-scale deformable attention op.

Oracle: torch F.grid_sample(bilinear, zeros, align_corners=False) per level
+ attention-weighted sum — the same spec the reference validates its CUDA
kernel against (reference ops/functions/ms_deform_attn_func.py:53-75 and
ops/test.py). Shapes mirror the reference's op test (N=1, M=2, D=2, L=2,
P=2, levels [(6,4),(3,2)]) plus a model-scale case.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn


def torch_oracle(value, shapes, loc, att):
    """Independent torch implementation of the MSDA spec."""
    value = torch.from_numpy(value).double()
    loc = torch.from_numpy(loc).double()
    att = torch.from_numpy(att).double()
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = loc.shape
    splits = [h * w for h, w in shapes]
    vals = value.split(splits, dim=1)
    per_level = []
    for lvl, (h, w) in enumerate(shapes):
        v = vals[lvl].permute(0, 2, 3, 1).reshape(B * M, D, h, w)
        grid = 2.0 * loc[:, :, :, lvl] - 1.0  # (B, Lq, M, P, 2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * M, Lq, P, 2)
        s = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # (B*M, D, Lq, P)
        per_level.append(s)
    stacked = torch.stack(per_level, dim=-2)  # (B*M, D, Lq, L, P)
    w_att = att.permute(0, 2, 1, 3, 4).reshape(B * M, 1, Lq, L, P)
    out = (stacked * w_att).sum((-1, -2))  # (B*M, D, Lq)
    out = out.reshape(B, M, D, Lq).permute(0, 3, 1, 2).reshape(B, Lq, M * D)
    return out.numpy()


def make_inputs(rng, B, M, D, Lq, P, shapes, spread=1.0):
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.standard_normal((B, S, M, D)).astype(np.float32)
    # locations roughly in [0,1] with some spill past the border to
    # exercise the zero-padding path
    loc = (rng.random((B, Lq, M, L, P, 2)) * (1 + 0.4 * spread) - 0.2 * spread).astype(
        np.float32
    )
    att = rng.random((B, Lq, M, L, P)).astype(np.float32) + 1e-3
    att = att / att.sum(axis=(-1, -2), keepdims=True)
    return value, loc, att


@pytest.mark.parametrize(
    "B,M,D,Lq,P,shapes",
    [
        (1, 2, 2, 2, 2, ((6, 4), (3, 2))),
        (2, 4, 8, 37, 4, ((16, 16), (8, 8), (4, 4))),
    ],
)
def test_forward_matches_grid_sample_oracle(B, M, D, Lq, P, shapes):
    rng = np.random.default_rng(0)
    value, loc, att = make_inputs(rng, B, M, D, Lq, P, shapes)
    want = torch_oracle(value, shapes, loc, att)
    got = np.asarray(ms_deform_attn(jnp.array(value), shapes, jnp.array(loc), jnp.array(att)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_out_of_bounds_samples_are_zero():
    shapes = ((4, 4),)
    B, M, D, Lq, P = 1, 1, 2, 3, 2
    rng = np.random.default_rng(1)
    value, _, att = make_inputs(rng, B, M, D, Lq, P, shapes)
    loc = np.full((B, Lq, M, 1, P, 2), 5.0, dtype=np.float32)  # far outside
    out = np.asarray(ms_deform_attn(jnp.array(value), shapes, jnp.array(loc), jnp.array(att)))
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def test_gradients_match_torch():
    """VJP parity with the autograd of the torch oracle (gradcheck analogue)."""
    shapes = ((6, 4), (3, 2))
    B, M, D, Lq, P = 1, 2, 4, 5, 2
    rng = np.random.default_rng(2)
    value, loc, att = make_inputs(rng, B, M, D, Lq, P, shapes, spread=0.0)
    cotangent = rng.standard_normal((B, Lq, M * D)).astype(np.float32)

    def f_jax(v, l, a):
        return ms_deform_attn(v, shapes, l, a)

    _, vjp = jax.vjp(f_jax, jnp.array(value), jnp.array(loc), jnp.array(att))
    gv, gl, ga = [np.asarray(g) for g in vjp(jnp.array(cotangent))]

    tv = torch.from_numpy(value).double().requires_grad_()
    tl = torch.from_numpy(loc).double().requires_grad_()
    ta = torch.from_numpy(att).double().requires_grad_()

    def torch_fwd(v, l, a):
        splits = [h * w for h, w in shapes]
        vals = v.split(splits, dim=1)
        acc = 0.0
        for lvl, (h, w) in enumerate(shapes):
            vl = vals[lvl].permute(0, 2, 3, 1).reshape(B * M, D, h, w)
            grid = (2.0 * l[:, :, :, lvl] - 1.0).permute(0, 2, 1, 3, 4).reshape(
                B * M, Lq, P, 2
            )
            s = F.grid_sample(vl, grid, mode="bilinear", padding_mode="zeros",
                              align_corners=False)
            wa = a[:, :, :, lvl].permute(0, 2, 1, 3).reshape(B * M, 1, Lq, P)
            acc = acc + (s * wa).sum(-1)
        return acc.reshape(B, M, D, Lq).permute(0, 3, 1, 2).reshape(B, Lq, M * D)

    out = torch_fwd(tv, tl, ta)
    out.backward(torch.from_numpy(cotangent).double())
    np.testing.assert_allclose(gv, tv.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(gl, tl.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ga, ta.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_module_shapes_and_zero_init_behavior():
    """With zero-init offset/attn kernels, output must be finite and query-shaped."""
    from multimodal_sam_adapter_tpu.ops.msda import MSDeformAttention

    d_model, L = 64, 3
    shapes = ((8, 8), (4, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    mod = MSDeformAttention(d_model=d_model, n_levels=L, n_heads=4, n_points=4, ratio=0.5)
    q = jnp.ones((2, 10, d_model))
    refs = jnp.tile(jnp.linspace(0.1, 0.9, 10)[None, :, None, None], (2, 1, L, 2))
    feat = jnp.ones((2, S, d_model))
    params = mod.init(jax.random.PRNGKey(0), q, refs, feat, shapes)
    out = mod.apply(params, q, refs, feat, shapes)
    assert out.shape == (2, 10, d_model)
    assert np.isfinite(np.asarray(out)).all()


def test_onehot_matches_footprint_and_oracle():
    """The gather-free one-hot-matmul core (the TPU default since the
    2026-08 libtpu gather regression) must match both the footprint-gather
    program and the torch oracle, including out-of-range zero padding."""
    from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn_onehot

    rng = np.random.default_rng(7)
    B, M, D, Lq, P = 2, 4, 32, 60, 4
    shapes = ((12, 9), (6, 5))
    S = sum(h * w for h, w in shapes)
    val = rng.normal(size=(B, S, M, D)).astype(np.float32)
    loc = rng.uniform(-0.15, 1.15, size=(B, Lq, M, 2, P, 2)).astype(np.float32)
    att = rng.uniform(0.1, 1, size=(B, Lq, M, 2, P)).astype(np.float32)
    att = (att / att.sum(-1, keepdims=True)).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        oh = np.asarray(ms_deform_attn_onehot(
            jnp.asarray(val), shapes, jnp.asarray(loc), jnp.asarray(att)))
        fp = np.asarray(ms_deform_attn(
            jnp.asarray(val), shapes, jnp.asarray(loc), jnp.asarray(att)))
    want = torch_oracle(val, shapes, loc, att)
    np.testing.assert_allclose(oh, fp, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(oh, want, rtol=1e-4, atol=1e-5)


def test_onehot_grads_match_footprint():
    from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn_onehot

    rng = np.random.default_rng(3)
    B, M, D, Lq, P = 1, 2, 8, 40, 2
    shapes = ((7, 6),)
    S = sum(h * w for h, w in shapes)
    val = jnp.asarray(rng.normal(size=(B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0.05, 0.95, size=(B, Lq, M, 1, P, 2)), jnp.float32)
    att = jnp.asarray(rng.uniform(0.1, 1, size=(B, Lq, M, 1, P)), jnp.float32)

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(lambda v, l, a: jnp.sum(
            ms_deform_attn(v, shapes, l, a) ** 2), argnums=(0, 1, 2))(val, loc, att)
        g2 = jax.grad(lambda v, l, a: jnp.sum(
            ms_deform_attn_onehot(v, shapes, l, a) ** 2), argnums=(0, 1, 2))(val, loc, att)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_onehot_bf16_close_to_f32_oracle():
    """The TPU-default path runs the one-hot build + matmul in bf16 when the
    model is bf16 (msda.py mm_dtype). Guard its precision at flagship-like
    per-head shapes against the f32 torch oracle."""
    from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn_onehot

    rng = np.random.default_rng(11)
    B, M, D, Lq, P = 1, 4, 32, 128, 4
    shapes = ((16, 16), (8, 8))
    S = sum(h * w for h, w in shapes)
    val = rng.normal(size=(B, S, M, D)).astype(np.float32)
    loc = rng.uniform(-0.05, 1.05, size=(B, Lq, M, 2, P, 2)).astype(np.float32)
    att = rng.uniform(0.1, 1, size=(B, Lq, M, 2, P)).astype(np.float32)
    att = (att / att.sum((-1, -2), keepdims=True)).astype(np.float32)

    want = torch_oracle(val, shapes, loc, att)
    got = np.asarray(ms_deform_attn_onehot(
        jnp.asarray(val, jnp.bfloat16), shapes,
        jnp.asarray(loc, jnp.bfloat16), jnp.asarray(att, jnp.bfloat16),
    ).astype(jnp.float32))
    # bf16 mantissa is 8 bits; sampling locations quantize too, so allow a
    # looser absolute band scaled to the O(1) outputs
    err = np.abs(got - want)
    assert float(err.max()) < 0.12, float(err.max())
    assert float(err.mean()) < 0.02, float(err.mean())
