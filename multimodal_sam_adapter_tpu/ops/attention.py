"""Windowed attention with decomposed relative position bias (ViTDet-style).

TPU-first design: windows are folded into the batch dimension, so a 64x64
token grid with 14x14 windows becomes 25 independent 196-token attentions
that XLA batches onto the MXU. The decomposed rel-pos bias
(attn[q, kh, kw] += q.Rh[qh, kh] + q.Rw[qw, kw]) is computed as two small
einsums and added before softmax. Numerics follow the reference SAM image
encoder (reference mmseg_custom/models/backbones/base/image_encoder.py:426-623).

The default path materializes the attention matrix (as the reference does);
a Pallas flash-attention path that rebuilds the decomposed bias inside the
kernel tile is provided in `flash_attention.py` and used for global blocks.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.interpolate import interp_linear_1d


def window_partition(x: jnp.ndarray, window_size: int):
    """(B, H, W, C) -> (B*nW, ws, ws, C) with zero padding as needed.

    Returns the windows and the padded (Hp, Wp). Mirrors reference
    base/image_encoder.py:504-526.
    """
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C)
    return windows, (Hp, Wp)


def window_unpartition(
    windows: jnp.ndarray,
    window_size: int,
    pad_hw: Tuple[int, int],
    hw: Tuple[int, int],
) -> jnp.ndarray:
    """Inverse of `window_partition`, cropping the padding back off."""
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.reshape(
        B, Hp // window_size, Wp // window_size, window_size, window_size, -1
    )
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    if Hp > H or Wp > W:
        x = x[:, :H, :W]
    return x


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Select (and if needed resize) rel-pos rows for q/k sizes.

    Static-shape port of reference base/image_encoder.py:554-584: the table is
    linearly resized to 2*max(q,k)-1 rows, then indexed by the relative
    coordinate grid.
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    rel_pos = interp_linear_1d(rel_pos, max_rel_dist)
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def rel_pos_bias_terms(
    q: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_hw: Tuple[int, int],
    k_hw: Tuple[int, int],
):
    """Decomposed rel-pos bias terms.

    Args:
      q: (B, q_h*q_w, head_dim) per-(batch*head) queries.
    Returns:
      rel_h: (B, q_h, q_w, k_h), rel_w: (B, q_h, q_w, k_w); the full bias is
      rel_h[..., :, None] + rel_w[..., None, :] over (k_h, k_w).
    """
    q_h, q_w = q_hw
    k_h, k_w = k_hw
    Rh = get_rel_pos(q_h, k_h, rel_pos_h)  # (q_h, k_h, d)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w)  # (q_w, k_w, d)
    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh.astype(q.dtype))
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw.astype(q.dtype))
    return rel_h, rel_w


def attention_with_decomposed_rel_pos(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_hw: Tuple[int, int],
    scale: float,
) -> jnp.ndarray:
    """Softmax attention with the decomposed rel-pos bias.

    Args:
      q, k, v: (B, N, d) where B folds batch*heads(*windows) and N = H*W.
    Returns: (B, N, d)

    Softmax runs in f32 for stability regardless of input dtype.
    """
    q_h, q_w = q_hw
    attn = jnp.einsum("bqd,bkd->bqk", q * scale, k, preferred_element_type=jnp.float32)
    rel_h, rel_w = rel_pos_bias_terms(q, rel_pos_h, rel_pos_w, q_hw, q_hw)
    B, N, _ = q.shape
    attn = attn.reshape(B, q_h, q_w, q_h, q_w)
    attn = attn + rel_h[..., :, None].astype(attn.dtype)
    attn = attn + rel_w[..., None, :].astype(attn.dtype)
    attn = attn.reshape(B, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", attn.astype(v.dtype), v)
