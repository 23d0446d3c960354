"""Parameter-storage utilities."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_inference_params(variables, dtype=jnp.bfloat16):
    """Cast matmul/conv weights (ndim >= 2 floats in 'params') to `dtype`
    for inference.

    Modules already cast these params to their compute dtype at every use;
    storing them pre-cast is numerically IDENTICAL for the dtype-cast path
    while halving parameter HBM traffic and removing per-forward
    f32->bf16 convert ops (measured as end-of-forward param-fetch stalls
    at the SegFormer head). Kept f32: 1-D params (biases, LN/BN affine —
    several modules apply those in f32, e.g. _LNCore's affine, where
    pre-casting WOULD change numerics), batch_stats, rel-pos tables
    (their rows feed f32 interpolation when inference runs off the
    pretrain grid), and tiny (<1024-element) tensors like the neck's
    per-head temperature scales, which several modules apply in f32.

    Profile note: even small f32 conv weights (e.g. the 54 ConvNeXt
    (7,7,1,384) dwconv kernels) showed up as ~1 ms/fwd of device-blocking
    parameter-copy waits — hence a low size cutoff.
    """
    def cast(path, p):
        if any("rel_pos" in getattr(k, "key", "") for k in path):
            return p
        if (hasattr(p, "ndim") and p.ndim >= 2 and p.size >= 1024
                and jnp.issubdtype(p.dtype, jnp.floating)):
            return p.astype(dtype)
        return p

    out = dict(variables)
    if "params" in out:
        out["params"] = jax.tree_util.tree_map_with_path(
            cast, out["params"])
    return out
