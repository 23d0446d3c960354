"""Mask2Former family smoke + semantics tests."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from multimodal_sam_adapter_tpu.models.mask2former import (
    Mask2FormerHead,
    MaskFormerHead,
    hungarian_assign,
    mask2former_loss,
)

pytestmark = pytest.mark.slow


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


def test_point_sample_and_cost_matrix_match_torch():
    """Cost-matrix parity against the reference formulas (ClassificationCost
    -softmax[gt], CrossEntropyLossCost BCE/n, DiceCost eps in num+den,
    match_costs.py:93-240) with mmcv point_sample semantics
    (grid_sample(2u-1, bilinear, align_corners=False))."""
    import torch
    import torch.nn.functional as F
    from scipy.optimize import linear_sum_assignment

    from multimodal_sam_adapter_tpu.models.mask2former.losses import (
        point_sample,
    )
    from multimodal_sam_adapter_tpu.models.mask2former.matching import (
        classification_cost,
        dice_cost,
        hungarian_assign,
        mask_bce_cost,
    )

    rng = np.random.default_rng(0)
    Q, G, K, h, w, P = 6, 4, 4, 9, 11, 37
    cls_l = rng.normal(size=(Q, K + 1)).astype(np.float32)
    masks = rng.normal(size=(Q, h, w)).astype(np.float32)
    gt_masks = (rng.random((G, h, w)) > 0.5).astype(np.float32)
    gt_labels = rng.integers(0, K, (G,))
    coords = rng.random((P, 2)).astype(np.float32)

    # --- torch oracle
    def t_point_sample(m, c):
        grid = torch.tensor(2 * c - 1.0)[None, None].expand(m.shape[0], 1,
                                                            P, 2)
        return F.grid_sample(torch.tensor(m)[:, None], grid.float(),
                             mode="bilinear", align_corners=False,
                             padding_mode="zeros")[:, 0, 0]

    mp_t = t_point_sample(masks, coords)          # (Q, P)
    gp_t = t_point_sample(gt_masks, coords)       # (G, P)
    cls_cost_t = -torch.tensor(cls_l).softmax(-1)[:, gt_labels] * 2.0
    pos = F.binary_cross_entropy_with_logits(
        mp_t, torch.ones_like(mp_t), reduction="none")
    neg = F.binary_cross_entropy_with_logits(
        mp_t, torch.zeros_like(mp_t), reduction="none")
    bce_cost_t = (torch.einsum("nc,mc->nm", pos, gp_t)
                  + torch.einsum("nc,mc->nm", neg, 1 - gp_t)) / P * 5.0
    pred = mp_t.sigmoid()
    num = 2 * torch.einsum("nc,mc->nm", pred, gp_t)
    den = pred.sum(-1)[:, None] + gp_t.sum(-1)[None, :]
    dice_cost_t = (1 - (num + 1e-3) / (den + 1e-3)) * 5.0
    cost_t = (cls_cost_t + bce_cost_t + dice_cost_t).numpy()
    rows, cols = linear_sum_assignment(cost_t)

    # --- this framework
    mp = point_sample(jnp.asarray(masks), jnp.asarray(coords))
    gp = point_sample(jnp.asarray(gt_masks), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(mp), mp_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), gp_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    cost = (classification_cost(jnp.asarray(cls_l), jnp.asarray(gt_labels),
                                2.0)
            + mask_bce_cost(mp, gp, 5.0)
            + dice_cost(mp, gp, 5.0))
    np.testing.assert_allclose(np.asarray(cost), cost_t, rtol=1e-4,
                               atol=1e-4)
    assign = np.asarray(hungarian_assign(
        jnp.asarray(cost), jnp.ones((G,), bool)))
    want = np.full((Q,), -1, np.int32)
    want[rows] = cols
    np.testing.assert_array_equal(assign, want)


def test_uncertain_point_coords_importance_sampling():
    """get_uncertain_point_coords_with_randomness semantics: of the returned
    num_points coords, the first 75% must be the most-uncertain (highest
    -|sampled logit|) of the oversampled pool."""
    from multimodal_sam_adapter_tpu.models.mask2former.losses import (
        point_sample,
        uncertain_point_coords,
    )

    key = jax.random.PRNGKey(0)
    # a mask whose logits are near zero in a band -> uncertain there
    h = w = 32
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    logits = ((yy - h / 2) / 2.0).astype(np.float32)  # 0-crossing at y=h/2
    masks = jnp.asarray(logits)[None]

    num_points, ratio = 64, 0.75
    coords = uncertain_point_coords(key, masks, num_points, 3.0, ratio)
    assert coords.shape == (1, num_points, 2)
    n_unc = int(num_points * ratio)
    picked = point_sample(masks, coords[0, :n_unc])
    rest = point_sample(masks, coords[0, n_unc:])
    # the importance-picked points hug the zero crossing
    assert float(jnp.abs(picked).mean()) < float(jnp.abs(rest).mean())
    assert float(jnp.abs(picked).max()) < 3.0


@pytest.mark.slow
def test_mask2former_head_end_to_end_in_segmentor():
    """head_type='mask2former' through the full segmentor: forward logits,
    deep-supervised matched loss, and one optimizer step (the reference
    registers Mask2FormerHead as a decode-head alternative,
    mask2former_head.py:579)."""
    import jax

    from multimodal_sam_adapter_tpu.configs import get_config
    from multimodal_sam_adapter_tpu.engine.train import (
        init_train_state,
        make_train_step,
    )
    from multimodal_sam_adapter_tpu.models.segmentor import EncoderDecoder

    cfg = get_config("deliver_tiny_m2f")
    m = cfg["model"]
    model = EncoderDecoder(
        num_classes=m["num_classes"], head_channels=m["head_channels"],
        dropout_ratio=m["dropout_ratio"], backbone_cfg=m["backbone"],
        head_type=m["head_type"], head_cfg=m["head"],
    )
    img = jnp.ones((1, 64, 64, 6), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    logits = model.apply(variables, img, train=False)
    assert logits.shape == (1, 64, 64, 25)
    assert bool(jnp.isfinite(logits).all())

    state = init_train_state(
        model, (1, 64, 64, 6), jax.random.PRNGKey(1),
        optimizer_kwargs=dict(steps_per_epoch=4, max_epochs=2,
                              warmup_epochs=0),
    )
    step = make_train_step(model, donate=False)
    gt = jnp.zeros((1, 64, 64), jnp.int32).at[:, 8:, 8:].set(3)
    state, metrics = step(state, {"img": img, "gt": gt},
                          jax.random.PRNGKey(2))
    assert bool(jnp.isfinite(metrics["loss"]))


def test_sample_semantic_points_matches_fullres_masks():
    """Corner-decomposed semantic sampling == point_sample of materialized
    full-resolution per-class masks (reference ToMask + point_sample,
    mask2former_head.py:234-243)."""
    from multimodal_sam_adapter_tpu.models.mask2former.losses import (
        point_sample,
        sample_semantic_points,
        sample_semantic_points_for_classes,
    )

    rng = np.random.default_rng(3)
    K, H, W, P = 5, 37, 53, 200
    gt = jnp.array(rng.integers(0, K, (H, W)), jnp.int32)
    coords = jnp.array(rng.uniform(-0.05, 1.05, (P, 2)), jnp.float32)

    masks = (gt[None] == jnp.arange(K)[:, None, None]).astype(jnp.float32)
    want = np.asarray(point_sample(masks, coords))          # (K, P)
    got, valid_w = sample_semantic_points(gt, coords, K, ignore_index=255)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    # no ignored pixels: every in-bounds point fully valid
    assert np.asarray(valid_w).min() >= 0.0
    np.testing.assert_allclose(np.asarray(valid_w).max(), 1.0, atol=1e-6)

    # per-class variant agrees with the dense one
    Q = 4
    qcoords = jnp.array(rng.uniform(0, 1, (Q, P, 2)), jnp.float32)
    cids = jnp.array(rng.integers(0, K, (Q,)), jnp.int32)
    gq, _ = sample_semantic_points_for_classes(gt, qcoords, cids, 255)
    for q in range(Q):
        dense, _ = sample_semantic_points(gt, qcoords[q], K, 255)
        np.testing.assert_allclose(np.asarray(gq[q]),
                                   np.asarray(dense[cids[q]]), atol=1e-5)


def test_mask2former_loss_ignores_ignore_index():
    """Pixels labeled ignore_index must not act as negative targets: the
    loss on gt with an ignored band equals the loss where that band is
    deleted only from the valid sample mass (here: two gts identical except
    ignored band vs class-0 band must give DIFFERENT losses, and the
    ignored version must not penalize confident predictions inside the
    band).

    DELIBERATE DEVIATION from the reference loss (ADVICE r3): the
    reference's point losses treat ignored pixels as NEGATIVES and divide
    by the full num_points (mask2former loss via point sampling); this
    repo zeroes ignored points' weights and divides by the sum of valid
    weights. Loss values/gradients therefore do not numerically match the
    reference when ignore regions exist — by design, not a parity bug. A
    future reference-exact training-parity effort must bridge this gap
    explicitly (losses.py:250)."""
    rng = np.random.default_rng(7)
    B, Q, K, h, H = 1, 4, 3, 16, 64
    cls_logits = jnp.array(rng.standard_normal((B, Q, K + 1)), jnp.float32)
    # query 0 predicts a strong positive mask everywhere
    mask_logits = jnp.full((B, Q, h, h), -8.0, jnp.float32)
    mask_logits = mask_logits.at[0, 0].set(8.0)

    # gt: class 1 everywhere except a big ignored band
    gt_ign = jnp.ones((B, H, H), jnp.int32)
    gt_ign = gt_ign.at[:, H // 2:].set(255)
    # same but the band is class 0 (a real negative for class 1)
    gt_neg = jnp.ones((B, H, H), jnp.int32)
    gt_neg = gt_neg.at[:, H // 2:].set(0)

    def loss(gt):
        return float(mask2former_loss(cls_logits, mask_logits, gt,
                                      jax.random.PRNGKey(0), K,
                                      num_points=256))

    l_ign, l_neg = loss(gt_ign), loss(gt_neg)
    assert np.isfinite(l_ign) and np.isfinite(l_neg)
    # with the band ignored, the all-positive query matched to class 1 is
    # only judged on the top half (where it is correct): lower loss than
    # when the band is a true negative it gets wrong
    assert l_ign < l_neg
