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
GT masks are point-sampled at FULL label resolution (the reference's ToMask
masks live at pad_shape and are sampled directly, mask2former_head.py:
234-243) via bilinear corner decomposition of the semantic map, and sample
points whose bilinear mass falls on ignore_index pixels are excluded from
the match costs and the mask/dice losses (weight 1 - ignored mass).

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
    """(H, W) label map -> (K, H, W) binary masks + (K,) labels + valid (K,)
    + (H, W) per-pixel weight (0 where gt == ignore_index).

    One gt slot per class id; slots for absent classes are invalid
    (reference ToMask, formatting.py:53-83: one mask per present class,
    ignore_index excluded from the label set). Ignored pixels are 0 in every
    class mask AND carry weight 0 so downstream point losses can exclude
    them rather than treating them as negatives.
    """
    K = num_classes
    classes = jnp.arange(K)
    masks = (gt_seg[None] == classes[:, None, None]).astype(jnp.float32)
    valid = masks.sum((1, 2)) > 0
    pixel_weight = (gt_seg != ignore_index).astype(jnp.float32)
    return masks, classes, valid, pixel_weight


def _bilinear_corners(gt_seg: jnp.ndarray, coords: jnp.ndarray):
    """The four bilinear corner (label, weight) pairs of each sample point.

    gt_seg: (H, W) int label map; coords: (..., 2) normalized (x, y) in
    [0, 1]^2, align_corners=False. Returns (labels (..., 4) int32,
    weights (..., 4) f32); weights are zero for out-of-bounds corners
    (grid_sample zero padding).
    """
    H, W = gt_seg.shape
    x = coords[..., 0].astype(jnp.float32) * W - 0.5
    y = coords[..., 1].astype(jnp.float32) * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = gt_seg.reshape(-1)
    labs, ws = [], []
    for dy, dx, wgt in (
        (0, 0, (1 - ty) * (1 - tx)),
        (0, 1, (1 - ty) * tx),
        (1, 0, ty * (1 - tx)),
        (1, 1, ty * tx),
    ):
        yy = y0i + dy
        xx = x0i + dx
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        yc = jnp.clip(yy, 0, H - 1)
        xc = jnp.clip(xx, 0, W - 1)
        labs.append(flat[(yc * W + xc).reshape(-1)].reshape(yy.shape))
        ws.append(wgt * inb.astype(jnp.float32))
    return jnp.stack(labs, -1), jnp.stack(ws, -1)


def sample_semantic_points(gt_seg: jnp.ndarray, coords: jnp.ndarray,
                           num_classes: int, ignore_index: int = 255):
    """Point-sample every class's FULL-RESOLUTION binary gt mask at once.

    Bilinear-sampling the binary mask (gt == c) at a point equals summing
    the bilinear corner weights whose label is c — so this matches the
    reference exactly (ToMask builds full-res masks, mask2former_head.py:
    234-243 point-samples them) without materializing (K, H, W).

    Returns (g_pts (K, P), valid_w (P,)): sampled per-class mask values and
    a per-point validity weight 1 - (bilinear mass landing on ignore_index
    pixels). Out-of-bounds mass counts as valid zero (grid_sample zero
    padding), matching the reference.
    """
    labs, ws = _bilinear_corners(gt_seg, coords)            # (P, 4)
    onehot = (labs[..., None] == jnp.arange(num_classes)).astype(jnp.float32)
    g_pts = jnp.einsum("pj,pjk->kp", ws, onehot)
    valid_w = 1.0 - (ws * (labs == ignore_index)).sum(-1)
    return g_pts, valid_w


def sample_semantic_points_for_classes(gt_seg: jnp.ndarray,
                                       coords: jnp.ndarray,
                                       class_ids: jnp.ndarray,
                                       ignore_index: int = 255):
    """Per-query variant: coords (Q, P, 2) with one target class per query.

    Returns (g_pts (Q, P), valid_w (Q, P))."""
    labs, ws = _bilinear_corners(gt_seg, coords)            # (Q, P, 4)
    g_pts = (ws * (labs == class_ids[:, None, None])).sum(-1)
    valid_w = 1.0 - (ws * (labs == ignore_index)).sum(-1)
    return g_pts, valid_w


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
        # gt slot per class id; valid = class present at FULL resolution
        # (reference ToMask enumerates np.unique(gt) minus ignore_index)
        flat = gt.reshape(-1)
        inb = (flat >= 0) & (flat < num_classes)
        hist = jnp.zeros((num_classes,), jnp.int32).at[
            jnp.where(inb, flat, 0)
        ].add(inb.astype(jnp.int32))
        valid = hist > 0
        gt_labels = jnp.arange(num_classes)
        # matching costs on num_points UNIFORM point-sampled values; gt
        # masks point-sampled at FULL resolution (mask2former_head.py:
        # 234-243 samples the ToMask full-res masks); ignored pixels get
        # point weight 0 instead of acting as negatives
        match_coords = jax.random.uniform(k_match, (num_points, 2))
        m_pts = point_sample(mask_l, match_coords)           # (Q, P)
        g_pts, v_pts = sample_semantic_points(
            gt, match_coords, num_classes, ignore_index
        )                                                    # (K, P), (P,)
        cost = (
            classification_cost(cls_l, gt_labels, cls_weight)
            + mask_bce_cost(m_pts, g_pts, mask_weight, point_weights=v_pts)
            + dice_cost(m_pts, g_pts, dice_weight, point_weights=v_pts)
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
        # gt sampled at full resolution; safe == class id (one slot/class)
        gm, vm = sample_semantic_points_for_classes(
            gt, loss_coords, safe, ignore_index
        )                                                    # (Q, P) each
        vsum = jnp.maximum(vm.sum(-1), 1e-6)
        # BCE over valid (non-ignored) points only
        bce = (jax.nn.softplus(-pm) * gm + jax.nn.softplus(pm) * (1 - gm))
        bce = (bce * vm).sum(-1) / vsum
        bce = (bce * matched).sum() / jnp.maximum(matched.sum(), 1)
        # dice over valid points only
        p = jax.nn.sigmoid(pm.astype(jnp.float32))
        num = 2 * (vm * p * gm).sum(-1)
        den = (vm * p).sum(-1) + (vm * gm).sum(-1)
        dice = ((1 - (num + 1e-3) / (den + 1e-3)) * matched).sum() / (
            jnp.maximum(matched.sum(), 1)
        )
        return (cls_weight * loss_cls + mask_weight * bce
                + dice_weight * dice)

    keys = jax.random.split(rng, B)
    losses = jax.vmap(per_image)(cls_logits, mask_logits, gt_seg, keys)
    return losses.mean()
