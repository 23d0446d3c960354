"""Mask2Former matching/loss numerics vs the reference's own torch formulas.

Oracles are inline torch re-statements of:
- ClassificationCost (reference mmseg_custom/models/losses/match_costs.py:93-132)
- CrossEntropyLossCost (match_costs.py:183-230)
- DiceCost (match_costs.py:135-180, pred_act=True)
- point_sample (mmcv: grid_sample(2*coords-1, bilinear, align_corners=False))
- uncertainty = -|logit| + top-k pick
  (reference mmseg_custom/models/utils/point_sample.py:32-96)

These check the formulas, not just shapes/finiteness (VERDICT r1, next #10).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from multimodal_sam_adapter_tpu.models.mask2former.matching import (
    classification_cost,
    dice_cost,
    hungarian_assign,
    mask_bce_cost,
)
from multimodal_sam_adapter_tpu.models.mask2former.losses import (
    point_sample,
    uncertain_point_coords,
)

pytestmark = pytest.mark.slow


def test_classification_cost_matches_reference():
    rng = np.random.default_rng(0)
    Q, K, G = 10, 7, 4
    logits = rng.normal(size=(Q, K + 1)).astype(np.float32)
    gt = rng.integers(0, K, size=(G,))

    # reference match_costs.py:130-132
    want = -torch.from_numpy(logits).softmax(-1)[:, torch.from_numpy(gt)]
    got = classification_cost(jnp.asarray(logits), jnp.asarray(gt), 1.0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_crossentropy_cost_matches_reference():
    rng = np.random.default_rng(1)
    Q, G, N = 8, 5, 64
    pred = rng.normal(size=(Q, N)).astype(np.float32)
    gt = (rng.random((G, N)) > 0.5).astype(np.float32)

    # reference match_costs.py:200-221
    p = torch.from_numpy(pred)
    g = torch.from_numpy(gt)
    pos = F.binary_cross_entropy_with_logits(p, torch.ones_like(p),
                                             reduction="none")
    neg = F.binary_cross_entropy_with_logits(p, torch.zeros_like(p),
                                             reduction="none")
    want = (torch.einsum("nc,mc->nm", pos, g)
            + torch.einsum("nc,mc->nm", neg, 1 - g)) / N
    got = mask_bce_cost(jnp.asarray(pred), jnp.asarray(gt), 1.0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_dice_cost_matches_reference():
    rng = np.random.default_rng(2)
    Q, G, N = 8, 5, 64
    pred = rng.normal(size=(Q, N)).astype(np.float32)
    gt = (rng.random((G, N)) > 0.5).astype(np.float32)

    # reference match_costs.py:149-180 with pred_act=True, eps=1e-3
    p = torch.from_numpy(pred).sigmoid()
    g = torch.from_numpy(gt)
    num = 2 * torch.einsum("nc,mc->nm", p, g)
    den = p.sum(-1)[:, None] + g.sum(-1)[None, :]
    want = 1 - (num + 1e-3) / (den + 1e-3)
    got = dice_cost(jnp.asarray(pred), jnp.asarray(gt), 1.0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_point_sample_matches_mmcv_grid_sample():
    rng = np.random.default_rng(3)
    N, h, w, P = 3, 9, 13, 40
    masks = rng.normal(size=(N, h, w)).astype(np.float32)
    coords = rng.random((N, P, 2)).astype(np.float32)

    # mmcv point_sample: grid_sample(2*coords-1, align_corners=False)
    m = torch.from_numpy(masks)[:, None]          # (N, 1, h, w)
    c = torch.from_numpy(coords)[:, None]         # (N, 1, P, 2)
    want = F.grid_sample(m, 2.0 * c - 1.0, mode="bilinear",
                         padding_mode="zeros", align_corners=False)
    want = want[:, 0, 0].numpy()                  # (N, P)
    got = point_sample(jnp.asarray(masks), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_uncertain_point_coords_semantics():
    """Importance sampling per reference point_sample.py:32-96: the first
    importance_sample_ratio*num_points picked coords must be the top-k most
    uncertain (-|logit|) of the oversampled pool; the rest are random."""
    rng = jax.random.PRNGKey(0)
    N, h, w = 2, 16, 16
    num_points, oversample, ratio = 16, 3.0, 0.75
    logits = jnp.asarray(
        np.random.default_rng(4).normal(size=(N, h, w)).astype(np.float32) * 3
    )
    coords = uncertain_point_coords(rng, logits, num_points, oversample, ratio)
    assert coords.shape == (N, num_points, 2)
    n_unc = int(num_points * ratio)
    picked = np.asarray(point_sample(logits, coords))[:, :n_unc]
    # every importance-picked point must be more uncertain than the bulk
    # median of a fresh random sample (weak but value-checking property)
    rand_coords = jax.random.uniform(jax.random.PRNGKey(5), (N, 256, 2))
    rand_abs = np.median(np.abs(np.asarray(point_sample(logits, rand_coords))),
                         axis=1)
    assert (np.abs(picked).mean(1) < rand_abs).all()


def test_hungarian_assign_minimizes_cost():
    rng = np.random.default_rng(6)
    Q, G = 12, 5
    cost = rng.normal(size=(Q, G)).astype(np.float32)
    valid = np.array([True, True, False, True, True])

    got = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.asarray(valid)))
    # compare against scipy on the valid columns directly
    from scipy.optimize import linear_sum_assignment

    c = cost.copy()
    c[:, ~valid] = 1e9
    rows, cols = linear_sum_assignment(c)
    want = np.full(Q, -1, np.int32)
    for r, cc in zip(rows, cols):
        if valid[cc]:
            want[r] = cc
    np.testing.assert_array_equal(got, want)
    assert (got[got >= 0] != 2).all()  # invalid gt never assigned
