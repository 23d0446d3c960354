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
    pre-casting WOULD change numerics), batch_stats, and anything under
    64K elements (small tables like rel_pos feed f32 side-math such as
    off-grid interpolation; their traffic is negligible anyway).
    """
    def cast(p):
        if (hasattr(p, "ndim") and p.ndim >= 2 and p.size >= 65536
                and jnp.issubdtype(p.dtype, jnp.floating)):
            return p.astype(dtype)
        return p

    out = dict(variables)
    if "params" in out:
        out["params"] = jax.tree_util.tree_map(cast, out["params"])
    return out
