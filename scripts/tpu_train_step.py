"""Train-step timing at a given resolution (default 1024^2, batch 1).

Usage: bash scripts/run_tpu.sh scripts/tpu_train_step.py [size]
The N steps chain through the donated state, so the single float() sync at
the end amortizes host latency over all of them.
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from __graft_entry__ import _flagship_model
from multimodal_sam_adapter_tpu.engine.train import (
    init_train_state, make_train_step,
)

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

model = _flagship_model(dtype=jnp.bfloat16)
key = jax.random.PRNGKey(0)
state = init_train_state(
    model, (1, SIZE, SIZE, 6), key,
    optimizer_kwargs=dict(steps_per_epoch=100, max_epochs=100,
                          grad_accum_steps=1))
step = make_train_step(model, donate=True)
img = jax.random.normal(key, (1, SIZE, SIZE, 6), jnp.bfloat16).astype(
    jnp.float32)
gt = jax.random.randint(key, (1, SIZE, SIZE), 0, 25)
batch = {"img": img, "gt": gt}
rng = jax.random.PRNGKey(1)

state, m = step(state, batch, rng)
print("compiled; loss:", float(m["loss"]), flush=True)
best = float("inf")
for trial in range(3):
    t0 = time.perf_counter()
    N = 6
    for i in range(N):
        state, m = step(state, batch, rng)
    v = float(m["loss"])
    dt = (time.perf_counter() - t0) / N
    best = min(best, dt)
print(f"train step @ {SIZE}^2: {best*1000:.1f} ms (loss {v:.4f})",
      flush=True)
