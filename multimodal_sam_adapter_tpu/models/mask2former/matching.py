"""Match costs + Hungarian assignment (reference mmseg_custom assigner /
match_costs, TPU re-design).

Costs are computed as dense (Q, G) matrices under jit; the Hungarian solve
itself is a tiny host callback (scipy linear_sum_assignment) — the same
CPU-side solver the reference uses, invoked via pure_callback so the rest of
the loss stays compiled. Gradients don't flow through the assignment
(it's an argmin), matching torch semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def classification_cost(cls_logits, gt_labels, weight: float = 1.0):
    """-(softmax prob of gt class): (Q, K+1) x (G,) -> (Q, G)."""
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), -1)
    return -probs[:, gt_labels] * weight


def mask_bce_cost(mask_logits, gt_masks, weight: float = 1.0,
                  point_weights=None):
    """Per-pixel BCE cost between (Q, N) mask logits and (G, N) binary masks.

    point_weights (N,) optionally down-weights individual sample points
    (0 = ignored pixel); None reproduces the reference's plain mean."""
    m = mask_logits.astype(jnp.float32)
    pos = jax.nn.softplus(-m)   # -log sigmoid(m)
    neg = jax.nn.softplus(m)    # -log(1 - sigmoid(m))
    if point_weights is None:
        denom = float(mask_logits.shape[-1])
    else:
        v = point_weights.astype(jnp.float32)
        pos = pos * v
        neg = neg * v
        denom = jnp.maximum(v.sum(), 1e-6)
    cost = jnp.einsum("qn,gn->qg", pos, gt_masks) + jnp.einsum(
        "qn,gn->qg", neg, 1.0 - gt_masks
    )
    return cost / denom * weight


def dice_cost(mask_logits, gt_masks, weight: float = 1.0, eps: float = 1e-3,
              point_weights=None):
    p = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    if point_weights is None:
        num = 2.0 * jnp.einsum("qn,gn->qg", p, gt_masks)
        den = p.sum(-1)[:, None] + gt_masks.sum(-1)[None, :]
    else:
        # weighted dice: num = 2 Σ v·p·g, den = Σ v·p + Σ v·g
        v = point_weights.astype(jnp.float32)
        num = 2.0 * jnp.einsum("qn,gn->qg", p * v[None], gt_masks)
        den = ((p * v[None]).sum(-1)[:, None]
               + (gt_masks * v[None]).sum(-1)[None, :])
    return (1.0 - (num + eps) / (den + eps)) * weight


def hungarian_assign(cost: jnp.ndarray, valid_gt: jnp.ndarray):
    """Solve assignment on host. cost (Q, G); valid_gt (G,) bool mask for
    padded gt slots. Returns (assigned_gt (Q,) int32 with -1 = unassigned)."""
    Q, G = cost.shape

    def solve(c, v):
        from scipy.optimize import linear_sum_assignment

        c = np.asarray(c, np.float64).copy()
        v = np.asarray(v, bool)
        c[:, ~v] = 1e9
        rows, cols = linear_sum_assignment(c)
        out = np.full((c.shape[0],), -1, np.int32)
        for r, cc in zip(rows, cols):
            if v[cc]:
                out[r] = cc
        return out

    # the assignment is an argmin: no gradients flow through it
    cost = jax.lax.stop_gradient(cost)
    return jax.pure_callback(
        solve, jax.ShapeDtypeStruct((Q,), jnp.int32), cost, valid_gt,
        vmap_method="sequential",
    )
