"""Pallas MSDA kernel vs the XLA gather oracle (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn
from multimodal_sam_adapter_tpu.ops.msda_pallas import (
    ms_deform_attn_pallas_fwd,
    make_ms_deform_attn,
)
from tests.test_msda import make_inputs

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("variant", ["gather", "loads"])
@pytest.mark.parametrize(
    "B,M,D,Lq,P,shapes",
    [
        (1, 2, 32, 37, 4, ((16, 16), (8, 8), (4, 4))),
        (2, 4, 32, 130, 2, ((8, 8),)),
    ],
)
def test_pallas_forward_matches_xla(B, M, D, Lq, P, shapes, variant):
    rng = np.random.default_rng(0)
    value, loc, att = make_inputs(rng, B, M, D, Lq, P, shapes)
    want = np.asarray(ms_deform_attn(jnp.array(value), shapes, jnp.array(loc),
                                     jnp.array(att)))
    got = np.asarray(ms_deform_attn_pallas_fwd(
        jnp.array(value), shapes, jnp.array(loc), jnp.array(att),
        variant=variant, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_custom_vjp_matches_xla_grads():
    shapes = ((8, 8), (4, 4))
    B, M, D, Lq, P = 1, 2, 32, 13, 2
    rng = np.random.default_rng(1)
    value, loc, att = make_inputs(rng, B, M, D, Lq, P, shapes)
    cot = rng.standard_normal((B, Lq, M * D)).astype(np.float32)

    fused = make_ms_deform_attn(shapes, interpret=True)
    out_f, vjp_f = jax.vjp(fused, jnp.array(value), jnp.array(loc),
                           jnp.array(att))
    out_x, vjp_x = jax.vjp(
        lambda v, l, a: ms_deform_attn(v, shapes, l, a),
        jnp.array(value), jnp.array(loc), jnp.array(att),
    )
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=1e-4, atol=1e-5)
    for gf, gx in zip(vjp_f(jnp.array(cot)), vjp_x(jnp.array(cot))):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=1e-4, atol=1e-5)


def test_digit_variant_matches_oracle_and_grads():
    """Digit-decomposed kernel (lo-digit MXU contraction + hi-digit select):
    exact match with the XLA one-hot forward (both are exact re-expressions
    of the bilinear spec) and correct custom-VJP grads."""
    from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn_onehot

    rng = np.random.default_rng(13)
    # odd H/W + multiple levels exercise quadrant padding and the
    # slots->LO*HI padding; Lq below/above the 512 tile both covered
    shapes = ((19, 13), (5, 4))
    S = sum(h * w for h, w in shapes)
    B, M, D, Lq, P = 2, 2, 32, 600, 4
    val = jnp.asarray(rng.normal(size=(B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, size=(B, Lq, M, 2, P, 2)),
                      jnp.float32)
    att = jnp.asarray(rng.uniform(0.1, 1, size=(B, Lq, M, 2, P)),
                      jnp.float32)

    fn = make_ms_deform_attn(shapes, variant="digit", interpret=True)
    with jax.default_matmul_precision("highest"):
        got = fn(val, loc, att)
        want = ms_deform_attn_onehot(val, shapes, loc, att)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

        g1 = jax.grad(lambda v, l, a: jnp.sum(fn(v, l, a) ** 2),
                      argnums=(0, 1, 2))(val, loc, att)
        g2 = jax.grad(
            lambda v, l, a: jnp.sum(ms_deform_attn_onehot(v, shapes, l, a) ** 2),
            argnums=(0, 1, 2))(val, loc, att)
    # the two impls' FORWARD outputs differ by f32 rounding; the squared
    # loss doubles that into the cotangent, so grads carry ~1e-3 relative
    # accumulation noise
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_onehot_variant_matches_xla_and_grads():
    """Fused one-hot kernel (the TPU-default forward): exact match with the
    XLA one-hot and correct custom-VJP grads (backward = XLA one-hot)."""
    from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn_onehot
    from multimodal_sam_adapter_tpu.ops.msda_pallas import (
        make_ms_deform_attn,
    )

    rng = np.random.default_rng(9)
    shapes = ((10, 7), (5, 4))
    S = sum(h * w for h, w in shapes)
    B, M, D, Lq, P = 2, 4, 32, 150, 4
    val = jnp.asarray(rng.normal(size=(B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, size=(B, Lq, M, 2, P, 2)),
                      jnp.float32)
    att = jnp.asarray(rng.uniform(0.1, 1, size=(B, Lq, M, 2, P)),
                      jnp.float32)

    fn = make_ms_deform_attn(shapes, variant="onehot", interpret=True)
    with jax.default_matmul_precision("highest"):
        got = fn(val, loc, att)
        want = ms_deform_attn_onehot(val, shapes, loc, att)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

        g1 = jax.grad(lambda v, l, a: jnp.sum(fn(v, l, a) ** 2),
                      argnums=(0, 1, 2))(val, loc, att)
        g2 = jax.grad(
            lambda v, l, a: jnp.sum(ms_deform_attn_onehot(v, shapes, l, a) ** 2),
            argnums=(0, 1, 2))(val, loc, att)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_digit_flat_matches_xla_and_grads():
    """Flat-projection digit entry (the module's TPU path): forward and
    grads vs the generic XLA formulation reconstructed from the same flats
    (reference ms_deform_attn.py:83-118 semantics: softmax over L*P,
    per-level offset normalization)."""
    import jax

    from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn
    from multimodal_sam_adapter_tpu.ops.msda_pallas import (
        make_ms_deform_attn_flat,
    )

    key = jax.random.PRNGKey(3)
    B, M, D, P = 2, 4, 8, 3
    shapes = ((10, 14), (6, 8))
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    Lq = 37
    ks = jax.random.split(key, 4)
    value_flat = jax.random.normal(ks[0], (B, S, M * D), jnp.float32)
    offs = jax.random.normal(ks[1], (B, Lq, M * L * P * 2), jnp.float32) * 2
    attn = jax.random.normal(ks[2], (B, Lq, M * L * P), jnp.float32)
    ref = jax.random.uniform(ks[3], (B, Lq, L, 2), jnp.float32)
    ref_T = ref.transpose(0, 2, 3, 1).reshape(B, L * 2, Lq)

    fn = make_ms_deform_attn_flat(shapes, M, P, interpret=True)
    normalizer = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)

    def oracle(vf, o, a, r4):
        v = vf.reshape(B, S, M, D)
        offs6 = o.reshape(B, Lq, M, L, P, 2)
        attn_sm = jax.nn.softmax(
            a.reshape(B, Lq, M, L * P), -1
        ).reshape(B, Lq, M, L, P)
        loc = (r4[:, :, None, :, None, :]
               + offs6 / normalizer[None, None, None, :, None, :])
        return ms_deform_attn(v, shapes, loc, attn_sm)

    got = fn(value_flat, offs, attn, ref_T)
    want = oracle(value_flat, offs, attn, ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    g1 = jax.grad(lambda *a_: jnp.sum(fn(*a_) ** 2), (0, 1, 2))(
        value_flat, offs, attn, ref_T)
    g2 = jax.grad(lambda *a_: jnp.sum(oracle(*a_) ** 2), (0, 1, 2))(
        value_flat, offs, attn, ref)
    for a_, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=2e-4, rtol=1e-4)


def test_digit_flat_batch_broadcast_refpoints():
    """B>1 with batch-1 (broadcast) reference points — the adapter generates
    ref grids once and broadcasts; the flat path must not bake batch=1
    (regression: B=2 eval crashed on the ref_T reshape)."""
    import jax

    from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn
    from multimodal_sam_adapter_tpu.ops.msda_pallas import (
        make_ms_deform_attn_flat,
    )

    key = jax.random.PRNGKey(5)
    B, M, D, P = 3, 2, 8, 2
    shapes = ((8, 8),)
    S, Lq, L = 64, 21, 1
    ks = jax.random.split(key, 4)
    vflat = jax.random.normal(ks[0], (B, S, M * D), jnp.float32)
    offs = jax.random.normal(ks[1], (B, Lq, M * L * P * 2), jnp.float32)
    attn = jax.random.normal(ks[2], (B, Lq, M * L * P), jnp.float32)
    ref1 = jax.random.uniform(ks[3], (1, Lq, L, 2), jnp.float32)
    ref_T = ref1.transpose(0, 2, 3, 1).reshape(1, L * 2, Lq)

    fn = make_ms_deform_attn_flat(shapes, M, P, interpret=True)
    got = fn(vflat, offs, attn, ref_T)

    value = vflat.reshape(B, S, M, D)
    offs6 = offs.reshape(B, Lq, M, L, P, 2)
    attn_sm = jax.nn.softmax(attn.reshape(B, Lq, M, L * P), -1)
    attn_sm = attn_sm.reshape(B, Lq, M, L, P)
    nm = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    loc = (ref1[:, :, None, :, None, :]
           + offs6 / nm[None, None, None, :, None, :])
    want = ms_deform_attn(value, shapes, loc, attn_sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)
