"""Segmentation losses, jit-native (static shapes, masked semantics).

`ohem_cross_entropy` is the training loss of all MM-SAM configs, a
PIDNet-style OHEM (reference mmseg_custom/models/losses/ohem_cross_entropy_loss.py:15-101):
keep the pixels whose predicted probability of the true class is below
max(thresh, k-th smallest prob) where k = min_kept, then mean their CE.
The torch version does masked sorting with dynamic sizes; here the same
selection is expressed with a full sort + masked reduction, which is
TPU-friendly (one O(N log N) sort over ~1M pixels, no dynamic shapes).

Also provided (registered-but-unused in the reference's shipped configs, see
SURVEY.md 2.2): plain CE, Dice, Focal.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _flatten_logits_labels(logits, labels):
    """logits (B, H, W, C) or (N, C); labels (B, H, W) or (N,)."""
    C = logits.shape[-1]
    return logits.reshape(-1, C), labels.reshape(-1)


def ohem_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
    thresh: float = 0.7,
    min_kept: int = 100_000,
    loss_weight: float = 1.0,
    class_weight=None,
    per_sample: bool = False,
) -> jnp.ndarray:
    """OHEM cross entropy over NHWC logits and (B, H, W) int labels.

    per_sample: threshold scope. The reference computes the min_kept
    threshold over each RANK'S LOCAL batch (ohem_cross_entropy_loss.py:
    56-96, on the per-GPU batch before DDP's gradient mean). A jitted
    sharded loss has no "rank-local" view, so the two faithful jit-native
    scopes are:
      - False (default): one threshold over the whole batch the call
        sees — torch-equivalent for any SINGLE-process batch (the oracle
        test feeds this).
      - True: one threshold PER SAMPLE, then mean of per-sample means —
        bit-equivalent to the reference's per-rank scope at the shipped
        samples_per_gpu=1 for ANY data-parallel degree (each rank's batch
        IS one sample, and DDP's grad-mean == the sample mean here), and
        invariant to device topology. The train step uses this. See
        PARITY.md.
    """
    B = logits.shape[0] if (per_sample and logits.ndim >= 3) else 1
    logits, labels = _flatten_logits_labels(logits, labels)
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)

    logp = jax.nn.log_softmax(logits, axis=-1)
    logp_t = jnp.take_along_axis(logp, safe_labels[:, None], axis=1)[:, 0]
    pixel_losses = -logp_t
    if class_weight is not None:
        w = jnp.asarray(class_weight, jnp.float32)[safe_labels]
        pixel_losses = pixel_losses * w
    prob_t = jnp.exp(logp_t)

    # rows = threshold scopes (1 global row, or B per-sample rows)
    N = pixel_losses.size // B
    valid = valid.reshape(B, N)
    prob_t = prob_t.reshape(B, N)
    pixel_losses = pixel_losses.reshape(B, N)

    # k-th smallest true-class probability among valid pixels per row
    # (invalid pixels sort to +inf so they never enter the threshold)
    sort_key = jnp.where(valid, prob_t, jnp.inf)
    sorted_probs = jnp.sort(sort_key, axis=1)
    n_valid = jnp.sum(valid, axis=1)
    k = jnp.minimum(jnp.asarray(min_kept, jnp.int32),
                    jnp.maximum(n_valid - 1, 0))
    min_value = jnp.take_along_axis(sorted_probs, k[:, None], axis=1)[:, 0]
    threshold = jnp.maximum(min_value, thresh)

    keep = valid & (prob_t < threshold[:, None])
    n_keep = jnp.sum(keep, axis=1)
    row_loss = (jnp.sum(jnp.where(keep, pixel_losses, 0.0), axis=1)
                / jnp.maximum(n_keep, 1))
    # a row with no valid pixels contributes 0 (reference returns 0.0;
    # DDP still averages the zero into the gradient mean)
    row_loss = jnp.where(n_valid > 0, row_loss, 0.0)
    return loss_weight * jnp.mean(row_loss)


def cross_entropy_loss(
    logits, labels, ignore_index: int = 255, loss_weight: float = 1.0,
    class_weight=None,
) -> jnp.ndarray:
    logits, labels = _flatten_logits_labels(logits, labels)
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    if class_weight is not None:
        cw = jnp.asarray(class_weight, jnp.float32)
        nll = nll * cw[safe]
        denom = jnp.sum(jnp.where(valid, cw[safe], 0.0))
    else:
        denom = jnp.maximum(jnp.sum(valid), 1)
    return loss_weight * jnp.sum(jnp.where(valid, nll, 0.0)) / denom


def dice_loss(
    logits, labels, ignore_index: int = 255, smooth: float = 1.0,
    exponent: float = 2.0, loss_weight: float = 1.0,
) -> jnp.ndarray:
    logits, labels = _flatten_logits_labels(logits, labels)
    C = logits.shape[-1]
    valid = (labels != ignore_index)[:, None]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * valid
    onehot = jax.nn.one_hot(jnp.where(valid[:, 0], labels, 0), C) * valid
    num = 2.0 * jnp.sum(probs * onehot, axis=0) + smooth
    den = jnp.sum(probs**exponent + onehot**exponent, axis=0) + smooth
    return loss_weight * jnp.mean(1.0 - num / den)


def focal_loss(
    logits, labels, ignore_index: int = 255, gamma: float = 2.0,
    alpha: float = 0.25, loss_weight: float = 1.0,
) -> jnp.ndarray:
    logits, labels = _flatten_logits_labels(logits, labels)
    C = logits.shape[-1]
    valid = labels != ignore_index
    onehot = jax.nn.one_hot(jnp.where(valid, labels, 0), C)
    logits = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * onehot + (1 - p) * (1 - onehot)
    a_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    fl = a_t * (1 - p_t) ** gamma * ce
    fl = fl * valid[:, None]
    return loss_weight * jnp.sum(fl) / jnp.maximum(jnp.sum(valid), 1)
