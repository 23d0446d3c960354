"""Mask2Former training loss: Hungarian-matched CE + mask BCE + dice with
the reference's point-sampling scheme (mask2former_head.py:230-340 +
models/utils/point_sample.py):

- matching costs are computed on `num_points` UNIFORM random coords,
  bilinearly point-sampled from both prediction and gt masks (:234-243);
- the mask losses sample `oversample_ratio * num_points` random coords,
  keep the `importance_sample_ratio * num_points` most UNCERTAIN ones
  (uncertainty = -|logit| of the sampled prediction), and top up with
  fresh random coords (get_uncertain_point_coords_with_randomness).

Ground truth comes from a semantic map converted to per-class binary masks
(semantic segmentation setting, classes present in the image = instances).

TPU note: point_sample is a scattered bilinear gather; this loss is an
auxiliary component (no shipped MM-SAM config trains Mask2Former), so it
uses plain XLA gathers rather than the one-hot MSDA machinery.
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


def point_sample(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """mmcv point_sample semantics: bilinear sample at [0, 1]^2 (x, y)
    coords with align_corners=False and zero padding.

    masks: (N, h, w); coords: (P, 2) shared or (N, P, 2) per mask.
    Returns (N, P).
    """
    N, h, w = masks.shape
    if coords.ndim == 2:
        coords = jnp.broadcast_to(coords[None], (N,) + coords.shape)
    x = coords[..., 0].astype(jnp.float32) * w - 0.5
    y = coords[..., 1].astype(jnp.float32) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(yy, xx):
        inb = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)).astype(
            jnp.float32)
        yc = jnp.clip(yy, 0, h - 1)
        xc = jnp.clip(xx, 0, w - 1)
        flat = masks.reshape(N, h * w)
        v = jnp.take_along_axis(flat, yc * w + xc, axis=1)
        return v.astype(jnp.float32) * inb

    return (corner(y0i, x0i) * (1 - ty) * (1 - tx)
            + corner(y0i, x0i + 1) * (1 - ty) * tx
            + corner(y0i + 1, x0i) * ty * (1 - tx)
            + corner(y0i + 1, x0i + 1) * ty * tx)


def uncertain_point_coords(rng, mask_logits: jnp.ndarray, num_points: int,
                           oversample_ratio: float = 3.0,
                           importance_sample_ratio: float = 0.75):
    """get_uncertain_point_coords_with_randomness (reference
    models/utils/point_sample.py:32-96): per mask, sample
    oversample_ratio*num_points random coords, keep the
    importance_sample_ratio*num_points with the highest uncertainty
    (-|sampled logit|), append fresh random coords for the rest."""
    N = mask_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    k1, k2 = jax.random.split(rng)
    coords = jax.random.uniform(k1, (N, n_sampled, 2))
    logits = point_sample(mask_logits, coords)          # (N, n_sampled)
    uncertainty = -jnp.abs(logits)
    _, top = jax.lax.top_k(uncertainty, n_unc)          # (N, n_unc)
    picked = jnp.take_along_axis(coords, top[..., None], axis=1)
    if n_rand > 0:
        extra = jax.random.uniform(k2, (N, n_rand, 2))
        picked = jnp.concatenate([picked, extra], axis=1)
    return picked


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


def mask2former_loss(
    cls_logits: jnp.ndarray,      # (B, Q, K+1)
    mask_logits: jnp.ndarray,     # (B, Q, h, w)
    gt_seg: jnp.ndarray,          # (B, H, W) int
    rng,
    num_classes: int,
    ignore_index: int = 255,
    num_points: int = 12544,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    cls_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    no_object_weight: float = 0.1,
) -> jnp.ndarray:
    B, Q = cls_logits.shape[:2]
    h, w = mask_logits.shape[2:]

    def per_image(cls_l, mask_l, gt, key):
        k_match, k_loss = jax.random.split(key)
        # downsample gt to mask resolution (nearest)
        ys = (jnp.arange(h) * gt.shape[0] // h)
        xs = (jnp.arange(w) * gt.shape[1] // w)
        gt_small = gt[ys][:, xs]
        gt_masks, gt_labels, valid = semantic_to_masks(
            gt_small, num_classes, ignore_index
        )
        # matching costs on num_points UNIFORM point-sampled values
        # (reference mask2former_head.py:234-243)
        match_coords = jax.random.uniform(k_match, (num_points, 2))
        m_pts = point_sample(mask_l, match_coords)           # (Q, P)
        g_pts = point_sample(gt_masks, match_coords)         # (K, P)
        cost = (
            classification_cost(cls_l, gt_labels, cls_weight)
            + mask_bce_cost(m_pts, g_pts, mask_weight)
            + dice_cost(m_pts, g_pts, dice_weight)
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
        # importance-sampled loss points per query (oversample 3x, keep the
        # 75% most uncertain + fresh random)
        loss_coords = uncertain_point_coords(
            k_loss, mask_l, num_points, oversample_ratio,
            importance_sample_ratio,
        )
        pm = point_sample(mask_l, loss_coords)               # (Q, P)
        gm = jax.vmap(
            lambda gi, c: point_sample(gt_masks[gi][None], c)[0]
        )(safe, loss_coords)                                 # (Q, P)
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
