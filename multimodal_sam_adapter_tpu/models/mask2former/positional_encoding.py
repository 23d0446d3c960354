"""Sine positional encoding (reference mmseg_custom positional_encoding,
DETR-style, normalize=True)."""
from __future__ import annotations

import math

import jax.numpy as jnp


def sine_positional_encoding(h: int, w: int, num_feats: int = 128,
                             temperature: float = 10000.0,
                             normalize: bool = True,
                             scale: float = 2 * math.pi,
                             eps: float = 1e-6,
                             dtype=jnp.float32) -> jnp.ndarray:
    """Returns (h, w, 2*num_feats) position embedding (no mask variant)."""
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None].repeat(w, 1)
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :].repeat(h, 0)
    if normalize:
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = temperature ** (
        2 * (jnp.arange(num_feats, dtype=jnp.float32) // 2) / num_feats
    )
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3
    ).reshape(h, w, -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3
    ).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


class SinePositionalEncoding:
    def __init__(self, num_feats: int = 128, normalize: bool = True):
        self.num_feats = num_feats
        self.normalize = normalize

    def __call__(self, h: int, w: int, dtype=jnp.float32):
        return sine_positional_encoding(
            h, w, self.num_feats, normalize=self.normalize, dtype=dtype
        )
