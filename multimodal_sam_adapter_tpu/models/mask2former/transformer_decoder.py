"""Mask2Former transformer decoder: masked cross-attention over multi-scale
memories (reference mmseg_custom/models/decode_heads/mask2former_head.py +
models/utils/transformer.py, TPU re-design).

Per layer: masked cross-attention (attention restricted to the foreground of
the previous layer's mask prediction, with the all-background fallback) ->
self-attention over queries -> FFN. Layers cycle through the 3 memory levels
(stride 32, 16, 8). All static shapes; the attention mask is a bias tensor.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import LayerNorm

NEG_INF = -1e9


class MultiheadAttention(nn.Module):
    dim: int
    num_heads: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q, k, v, bias=None):
        """q: (B, Nq, C), k/v: (B, Nk, C), bias: (B, heads, Nq, Nk) or None."""
        B, Nq, C = q.shape
        hd = C // self.num_heads

        def split(t, name):
            t = nn.Dense(C, dtype=self.dtype, name=name)(t)
            return t.reshape(B, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh = split(q, "q_proj")
        kh = split(k, "k_proj")
        vh = split(v, "v_proj")
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh * (hd ** -0.5), kh,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias
        attn = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class DecoderLayer(nn.Module):
    dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, queries, query_pos, memory, memory_pos, attn_bias):
        # masked cross attention (pre-norm=False, post-norm ordering as ref)
        y = MultiheadAttention(self.dim, self.num_heads, dtype=self.dtype,
                               name="cross_attn")(
            queries + query_pos, memory + memory_pos, memory, attn_bias
        )
        queries = LayerNorm(eps=1e-5, dtype=self.dtype, name="norm1")(
            queries + y
        )
        y = MultiheadAttention(self.dim, self.num_heads, dtype=self.dtype,
                               name="self_attn")(
            queries + query_pos, queries + query_pos, queries
        )
        queries = LayerNorm(eps=1e-5, dtype=self.dtype, name="norm2")(
            queries + y
        )
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(queries)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(y)
        queries = LayerNorm(eps=1e-5, dtype=self.dtype, name="norm3")(
            queries + y
        )
        return queries


class Mask2FormerDecoder(nn.Module):
    """num_layers decoder layers cycling over the memory levels."""

    num_classes: int
    dim: int = 256
    num_heads: int = 8
    num_layers: int = 9
    num_queries: int = 100
    ffn_dim: int = 2048
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.dim),
        )
        self.query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0),
            (self.num_queries, self.dim),
        )
        # per-memory-level embedding ADDED TO the decoder inputs (reference
        # mask2former_head.py:118,477: decoder_input + level_embed); distinct
        # from the pixel decoder's own level_encoding
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (3, self.dim),
        )
        self.layers = [
            DecoderLayer(dim=self.dim, num_heads=self.num_heads,
                         ffn_dim=self.ffn_dim, dtype=self.dtype,
                         name=f"layer{i}")
            for i in range(self.num_layers)
        ]
        self.cls_head = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                                 name="cls_head")
        self.mask_mlp = [
            nn.Dense(self.dim, dtype=self.dtype, name=f"mask_mlp{i}")
            for i in range(3)
        ]
        self.decoder_norm = LayerNorm(eps=1e-5, dtype=self.dtype,
                                      name="decoder_norm")

    def _predict(self, queries, mask_features):
        """-> (cls_logits (B, Q, K+1), mask_logits (B, Q, H/4, W/4))."""
        q = self.decoder_norm(queries)
        cls_logits = self.cls_head(q)
        emb = q
        for i, mlp in enumerate(self.mask_mlp):
            emb = mlp(emb)
            if i < 2:
                emb = nn.relu(emb)
        mask_logits = jnp.einsum("bqc,bhwc->bqhw", emb, mask_features)
        return cls_logits, mask_logits

    def _attn_bias(self, mask_logits, level_hw, num_heads):
        """Foreground-restricted attention bias from the previous prediction,
        with the all-background fallback (attend everywhere if a query's
        mask is empty)."""
        from ...utils.interpolate import resize_bilinear

        B, Q = mask_logits.shape[:2]
        m = resize_bilinear(
            mask_logits.transpose(0, 2, 3, 1), level_hw
        ).transpose(0, 3, 1, 2)  # (B, Q, h, w)
        m = (jax.nn.sigmoid(m.astype(jnp.float32)) > 0.5)
        m = m.reshape(B, Q, -1)
        empty = ~jnp.any(m, axis=-1, keepdims=True)
        keep = m | empty
        bias = jnp.where(keep, 0.0, NEG_INF)[:, None]  # (B, 1, Q, Nk)
        return jnp.broadcast_to(bias, (B, num_heads) + bias.shape[2:])

    def __call__(self, mask_features, memories: List[jnp.ndarray],
                 memory_pos: List[jnp.ndarray]):
        """memories: per level (B, h, w, C) coarse->fine. Returns per-layer
        (cls, mask) predictions, final last."""
        B = mask_features.shape[0]
        queries = jnp.broadcast_to(
            self.query_feat[None], (B, self.num_queries, self.dim)
        ).astype(mask_features.dtype)
        qpos = jnp.broadcast_to(
            self.query_embed[None], (B, self.num_queries, self.dim)
        ).astype(mask_features.dtype)

        preds = [self._predict(queries, mask_features)]
        for i, layer in enumerate(self.layers):
            lvl = i % len(memories)
            mem = memories[lvl]
            h, w = mem.shape[1], mem.shape[2]
            bias = self._attn_bias(preds[-1][1], (h, w), self.num_heads)
            mem_tokens = (mem.reshape(B, h * w, self.dim)
                          + self.level_embed[lvl].astype(mem.dtype))
            queries = layer(
                queries, qpos,
                mem_tokens,
                memory_pos[lvl].reshape(1, h * w, self.dim).astype(mem.dtype),
                bias,
            )
            preds.append(self._predict(queries, mask_features))
        return preds
