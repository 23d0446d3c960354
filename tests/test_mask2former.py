"""Mask2Former family smoke + semantics tests."""
import numpy as np
import jax
import jax.numpy as jnp

from multimodal_sam_adapter_tpu.models.mask2former import (
    Mask2FormerHead,
    MaskFormerHead,
    hungarian_assign,
    mask2former_loss,
)


def _pyramid(B=1, C=32, h4=16):
    rng = np.random.default_rng(0)
    return [
        jnp.array(rng.standard_normal((B, h4 // (2 ** i), h4 // (2 ** i), C))
                  .astype(np.float32))
        for i in range(4)
    ]


def test_mask2former_head_shapes():
    feats = _pyramid()
    head = Mask2FormerHead(num_classes=7, feat_channels=32, num_queries=10,
                           num_decoder_layers=3, num_encoder_layers=1)
    variables = head.init(jax.random.PRNGKey(0), feats)
    all_cls, all_masks = head.apply(variables, feats)
    assert len(all_cls) == 4  # pre-layer + 3 layers
    assert all_cls[-1].shape == (1, 10, 8)
    assert all_masks[-1].shape == (1, 10, 16, 16)
    seg = Mask2FormerHead.semantic_inference(all_cls[-1], all_masks[-1])
    assert seg.shape == (1, 16, 16, 7)
    assert np.isfinite(np.asarray(seg)).all()


def test_maskformer_head_shapes():
    feats = _pyramid()
    head = MaskFormerHead(num_classes=5, feat_channels=32, num_queries=8,
                          num_decoder_layers=2)
    variables = head.init(jax.random.PRNGKey(0), feats)
    all_cls, all_masks = head.apply(variables, feats)
    assert all_cls[-1].shape == (1, 8, 6)
    assert all_masks[-1].shape == (1, 8, 16, 16)


def test_hungarian_assignment_correctness():
    cost = jnp.array([[1.0, 10.0, 10.0],
                      [10.0, 1.0, 10.0],
                      [10.0, 10.0, 10.0],
                      [10.0, 10.0, 1.0]])
    valid = jnp.array([True, True, False])
    out = np.asarray(hungarian_assign(cost, valid))
    assert out[0] == 0 and out[1] == 1
    assert (out == 2).sum() == 0  # invalid gt never assigned
    assert (out >= 0).sum() == 2


def test_mask2former_loss_finite_and_grads():
    rng = np.random.default_rng(1)
    B, Q, K, h = 2, 6, 4, 8
    cls_logits = jnp.array(rng.standard_normal((B, Q, K + 1)), jnp.float32)
    mask_logits = jnp.array(rng.standard_normal((B, Q, h, h)), jnp.float32)
    gt = jnp.array(rng.integers(0, K, (B, 32, 32)), jnp.int32)

    def loss_fn(c, m):
        return mask2former_loss(c, m, gt, jax.random.PRNGKey(0), K,
                                num_points=64)

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        cls_logits, mask_logits
    )
    assert np.isfinite(float(loss))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
