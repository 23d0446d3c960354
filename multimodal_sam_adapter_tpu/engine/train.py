"""Training engine: one sharded train step + epoch loop scaffolding.

Replaces the mmcv runner/hook machinery the reference drives training with
(EpochBasedRunner + GradientCumulativeOptimizerHook + LR hooks + EvalHook,
SURVEY.md 2.4): the hot path is ONE jitted function
(loss -> grads -> optimizer update -> BN stats update) compiled over a
batch-sharded mesh; everything episodic (eval, checkpointing, early
stopping, logging) is plain Python around it.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.segmentor import EncoderDecoder
from .optim import make_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx, opt_state=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params) if opt_state is None else opt_state,
            tx=tx,
        )


def make_train_step(model: EncoderDecoder, ignore_index: int = 255,
                    ohem_thresh: float = 0.7, ohem_min_kept: int = 100_000,
                    ohem_per_sample: bool = True, donate: bool = True):
    """Build the jitted train step.

    batch: {'img': (B, H, W, C) NHWC float, 'gt': (B, H, W) int32}. Under a
    mesh with batch sharded on 'data' and state replicated, XLA inserts the
    gradient all-reduce and makes every BatchNorm a SyncBN.

    ohem_per_sample=True reproduces the reference's per-RANK OHEM
    threshold scope at the shipped samples_per_gpu=1 for any DP degree
    (see models/losses.py:ohem_cross_entropy and PARITY.md).
    """

    def loss_fn(params, batch_stats, img, gt, rng):
        (loss, logits), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            img, gt,
            ignore_index=ignore_index,
            ohem_thresh=ohem_thresh,
            ohem_min_kept=ohem_min_kept,
            ohem_per_sample=ohem_per_sample,
            method=model.loss,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        return loss, updates["batch_stats"]

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch["img"], batch["gt"], rng
        )
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, {"loss": loss}

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def init_train_state(
    model: EncoderDecoder,
    input_shape,
    rng,
    optimizer_kwargs: Optional[dict] = None,
) -> TrainState:
    # ONE jitted init program. Eager model.init dispatches hundreds of
    # per-initializer ops; through this environment's remote compiler that
    # is minutes of compile round-trips (bench.py hit the same thing).
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, jnp.zeros(input_shape, jnp.float32), train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(params, **(optimizer_kwargs or {}))
    opt_state = jax.jit(tx.init)(params)
    return TrainState.create(params, batch_stats, tx, opt_state=opt_state)
