"""ZeRO-style optimizer-state sharding over the 'data' axis.

The per-chip memory wall for 1024^2 training is Adam state (~5.5 GB f32 for
the 460M-param flagship) on top of activations. With pjit, ZeRO-1 is just a
placement decision: shard every optimizer-state tensor over 'data' on its
largest divisible axis and leave the update math unchanged — the SPMD
partitioner inserts the reduce-scatter (grads -> sharded moments) and
all-gather (sharded update -> replicated params) over ICI.

This shards STATE only (params stay replicated), cutting per-chip optimizer
memory by the data-parallel degree.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(leaf, dp: int) -> P:
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    # shard the largest axis divisible by the data-parallel degree
    order = np.argsort(shape)[::-1]
    for ax in order:
        if shape[ax] % dp == 0 and shape[ax] >= dp:
            spec = [None] * len(shape)
            spec[ax] = "data"
            return P(*spec)
    return P()


def zero_shardings(opt_state, mesh: Mesh):
    dp = mesh.shape.get("data", 1)
    return jax.tree.map(
        lambda x: NamedSharding(mesh, _spec_for(x, dp)), opt_state
    )


def shard_opt_state(opt_state, mesh: Mesh):
    return jax.tree.map(jax.device_put, opt_state, zero_shardings(opt_state, mesh))
