"""Mask2Former / MaskFormer heads (reference
mmseg_custom/models/decode_heads/mask2former_head.py:579,
maskformer_head.py:519 — TPU re-design over the shared pixel decoder).

Semantic segmentation inference follows the reference einsum:
  seg = softmax(cls)[..., :-1] (x) sigmoid(masks)  -> (B, H/4, W/4, K)
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .pixel_decoder import MSDeformAttnPixelDecoder
from .positional_encoding import sine_positional_encoding
from .transformer_decoder import Mask2FormerDecoder, MultiheadAttention
from ...nn.layers import LayerNorm


class Mask2FormerHead(nn.Module):
    num_classes: int
    feat_channels: int = 256
    num_queries: int = 100
    num_decoder_layers: int = 9
    num_encoder_layers: int = 6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        """feats: 4-level NHWC pyramid. Returns (all_cls, all_masks) lists
        (one per decoder layer + the pre-layer prediction)."""
        mask_features, memories = MSDeformAttnPixelDecoder(
            feat_channels=self.feat_channels,
            num_encoder_layers=self.num_encoder_layers,
            dtype=self.dtype, name="pixel_decoder",
        )(feats)
        memory_pos = [
            sine_positional_encoding(m.shape[1], m.shape[2],
                                     self.feat_channels // 2)
            for m in memories
        ]
        preds = Mask2FormerDecoder(
            num_classes=self.num_classes, dim=self.feat_channels,
            num_layers=self.num_decoder_layers, num_queries=self.num_queries,
            dtype=self.dtype, name="decoder",
        )(mask_features, memories, memory_pos)
        all_cls = [p[0] for p in preds]
        all_masks = [p[1] for p in preds]
        return all_cls, all_masks

    @staticmethod
    def semantic_inference(cls_logits, mask_logits):
        """-> (B, H/4, W/4, num_classes) semantic logits-like scores."""
        probs = jax.nn.softmax(cls_logits.astype(jnp.float32), -1)[..., :-1]
        masks = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
        return jnp.einsum("bqk,bqhw->bhwk", probs, masks)


class MaskFormerHead(nn.Module):
    """Per-pixel-embedding variant (MaskFormer): plain transformer decoder
    over the coarsest memory, no masked attention."""

    num_classes: int
    feat_channels: int = 256
    num_queries: int = 100
    num_decoder_layers: int = 6
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        from .transformer_decoder import DecoderLayer

        mask_features, memories = MSDeformAttnPixelDecoder(
            feat_channels=self.feat_channels, num_encoder_layers=0,
            dtype=self.dtype, name="pixel_decoder",
        )(feats)
        mem = memories[0]
        B, h, w, C = mem.shape
        mem_tokens = mem.reshape(B, h * w, C)
        mem_pos = sine_positional_encoding(h, w, C // 2).reshape(
            1, h * w, C
        ).astype(mem.dtype)
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, C),
        )
        queries = jnp.zeros((B, self.num_queries, C), mem.dtype)
        qpos = jnp.broadcast_to(query_embed[None],
                                (B, self.num_queries, C)).astype(mem.dtype)
        for i in range(self.num_decoder_layers):
            queries = DecoderLayer(dim=C, dtype=self.dtype,
                                   name=f"layer{i}")(
                queries, qpos, mem_tokens, mem_pos, None
            )
        queries = LayerNorm(eps=1e-5, dtype=self.dtype, name="norm")(queries)
        cls_logits = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                              name="cls_head")(queries)
        emb = queries
        for i in range(3):
            emb = nn.Dense(C, dtype=self.dtype, name=f"mask_mlp{i}")(emb)
            if i < 2:
                emb = nn.relu(emb)
        mask_logits = jnp.einsum("bqc,bhwc->bqhw", emb, mask_features)
        return [cls_logits], [mask_logits]
