"""Tensor parallelism: parameter sharding rules over the 'model' mesh axis.

The reference has no TP (SURVEY.md 2.6); this is a TPU-native extension.
Implementation is pure pjit: params get NamedShardings from the rule table
below and the forward stays UNCHANGED — XLA's SPMD partitioner turns the
head-parallel attention and column/row-parallel MLPs into megatron-style
compute with the all-reduces inserted automatically over ICI.

Rules (path-regex -> partition of the weight dims):
- ViT qkv / mlp.lin1: column-parallel (shard output features)
- ViT proj / mlp.lin2: row-parallel (shard input features)
- MSDA value/output projections: likewise (head-dim sharded)
- everything else: replicated
"""
from __future__ import annotations

import re
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec builder) — applied to 2-D kernels only
_RULES = [
    (r"attn/qkv/kernel$", P(None, "model")),
    (r"attn/proj/kernel$", P("model", None)),
    (r"mlp/lin1/kernel$", P(None, "model")),
    (r"mlp/lin2/kernel$", P("model", None)),
    (r"attn/value_proj/kernel$", P(None, "model")),
    (r"attn/output_proj/kernel$", P("model", None)),
    (r"ffn/fc1/kernel$", P(None, "model")),
    (r"ffn/fc2/kernel$", P("model", None)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def tp_spec(path: str, leaf) -> P:
    if getattr(leaf, "ndim", 0) == 2:
        for pat, spec in _RULES:
            if re.search(pat, path):
                return spec
    return P()


def tp_shardings(params, mesh: Mesh):
    """NamedSharding pytree for the param tree under `mesh` (axes include
    'model'). Shapes that don't divide the axis stay replicated."""
    msize = mesh.shape.get("model", 1)

    def one(path, leaf):
        spec = tp_spec(_path_str(path), leaf)
        if spec != P():
            # replicate anything that doesn't divide the model axis
            dim = 0 if spec[0] == "model" else 1
            if leaf.shape[dim] % msize:
                spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params_tp(params, mesh: Mesh):
    sh = tp_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)
