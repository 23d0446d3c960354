"""Device mesh + sharding layer.

The reference's distributed story is NCCL data parallelism
(MMDistributedDataParallel + DistributedSampler + SyncBN + seed broadcast,
SURVEY.md 2.6). The TPU-native equivalent collapses all of it into ONE
sharded jit program:

- `make_mesh(('data',))` over ICI (multi-host: `jax.distributed.initialize`
  then the same call — the mesh spans hosts transparently)
- batch arrays sharded on 'data'; params/optimizer state replicated
- gradients: the loss mean over the global batch makes XLA insert the
  psum — the DDP all-reduce with zero code
- SyncBN: BatchNorm reduces over the *global* batch axis for free
- seed broadcast: same jax.random key everywhere by construction
- eval gather: process_allgather (engine/evaluator.py) over DCN

An optional 'model' axis is reserved for tensor parallelism of the ViT
(attention heads / MLP shards); round-1 programs use data=all, model=1.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Create a Mesh over the available devices.

    Default: all devices on one 'data' axis. `shape` splits them, e.g.
    axes=('data','model'), shape=(4, 2).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    return Mesh(devices.reshape(tuple(shape)), tuple(axes))


def data_parallel_shardings(mesh: Mesh):
    """(batch_sharding, replicated_sharding) for the given mesh."""
    return (
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P()),
    )


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (leading batch axis) sharded over 'data'."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def gather_results(tree):
    """Gather per-process eval results across hosts.

    The reference ships collect_results_cpu/gpu (tmpdir files / pickled
    all_gather over NCCL, apis/test_bs.py:13). The TPU equivalent is one
    process_allgather over DCN; on a single process it's the identity.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


def init_distributed():
    """Multi-host bring-up: call once before building the mesh on each host
    (replaces torch.distributed.launch + init_dist, reference train.py:133)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-host
