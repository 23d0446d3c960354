"""Mask2Former training loss: Hungarian-matched CE + mask BCE + dice with
uniform point sampling (reference mask2former_head loss + core/point_sample;
the reference samples 12544 points with importance sampling — here uniform
random points, the documented simplification for v1).

Ground truth comes from a semantic map converted to per-class binary masks
(semantic segmentation setting, classes present in the image = instances).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .matching import (
    classification_cost,
    dice_cost,
    hungarian_assign,
    mask_bce_cost,
)


def semantic_to_masks(gt_seg: jnp.ndarray, num_classes: int,
                      ignore_index: int = 255):
    """(H, W) label map -> (K, H, W) binary masks + (K,) labels + valid (K,).

    One gt slot per class id; slots for absent classes are invalid.
    """
    K = num_classes
    classes = jnp.arange(K)
    masks = (gt_seg[None] == classes[:, None, None]).astype(jnp.float32)
    valid = masks.sum((1, 2)) > 0
    return masks, classes, valid


def _sample_points(rng, masks_qn, masks_gn, n_points: int):
    """Uniformly sample the same N points from (Q, H*W) and (G, H*W)."""
    total = masks_qn.shape[-1]
    idx = jax.random.randint(rng, (n_points,), 0, total)
    return masks_qn[:, idx], masks_gn[:, idx]


def mask2former_loss(
    cls_logits: jnp.ndarray,      # (B, Q, K+1)
    mask_logits: jnp.ndarray,     # (B, Q, h, w)
    gt_seg: jnp.ndarray,          # (B, H, W) int
    rng,
    num_classes: int,
    ignore_index: int = 255,
    num_points: int = 12544,
    cls_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    no_object_weight: float = 0.1,
) -> jnp.ndarray:
    B, Q = cls_logits.shape[:2]
    h, w = mask_logits.shape[2:]

    def per_image(cls_l, mask_l, gt, key):
        # downsample gt to mask resolution (nearest)
        ys = (jnp.arange(h) * gt.shape[0] // h)
        xs = (jnp.arange(w) * gt.shape[1] // w)
        gt_small = gt[ys][:, xs]
        gt_masks, gt_labels, valid = semantic_to_masks(
            gt_small, num_classes, ignore_index
        )
        mflat = mask_l.reshape(Q, h * w)
        gflat = gt_masks.reshape(num_classes, h * w)

        cost = (
            classification_cost(cls_l, gt_labels, cls_weight)
            + mask_bce_cost(mflat, gflat, mask_weight)
            + dice_cost(mflat, gflat, dice_weight)
        )
        assign = hungarian_assign(cost, valid)  # (Q,) gt idx or -1

        # classification target: matched class or the no-object class K
        tgt = jnp.where(assign >= 0, assign, num_classes)
        logp = jax.nn.log_softmax(cls_l.astype(jnp.float32), -1)
        w_cls = jnp.where(tgt == num_classes, no_object_weight, 1.0)
        loss_cls = -(jnp.take_along_axis(logp, tgt[:, None], 1)[:, 0] * w_cls)
        loss_cls = loss_cls.sum() / jnp.maximum(w_cls.sum(), 1.0)

        matched = assign >= 0
        safe = jnp.maximum(assign, 0)
        gt_m = gflat[safe]  # (Q, hw)
        pm, gm = _sample_points(key, mflat, gt_m, num_points)
        # BCE
        bce = (jax.nn.softplus(-pm) * gm + jax.nn.softplus(pm) * (1 - gm))
        bce = (bce.mean(-1) * matched).sum() / jnp.maximum(matched.sum(), 1)
        # dice
        p = jax.nn.sigmoid(pm.astype(jnp.float32))
        num = 2 * (p * gm).sum(-1)
        den = p.sum(-1) + gm.sum(-1)
        dice = ((1 - (num + 1e-3) / (den + 1e-3)) * matched).sum() / (
            jnp.maximum(matched.sum(), 1)
        )
        return (cls_weight * loss_cls + mask_weight * bce
                + dice_weight * dice)

    keys = jax.random.split(rng, B)
    losses = jax.vmap(per_image)(cls_logits, mask_logits, gt_seg, keys)
    return losses.mean()
