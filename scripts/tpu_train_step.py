"""Train-step timing at 768^2 batch 1 (1024^2 fits too: ~966 ms/step)."""
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from __graft_entry__ import _flagship_model
from multimodal_sam_adapter_tpu.engine.train import init_train_state, make_train_step

model = _flagship_model(dtype=jnp.bfloat16)
key = jax.random.PRNGKey(0)
state = init_train_state(model, (1, 768, 768, 6), key,
                         optimizer_kwargs=dict(steps_per_epoch=100, max_epochs=100,
                                               grad_accum_steps=1))
step = make_train_step(model, donate=True)
img = jax.random.normal(key, (1, 768, 768, 6), jnp.bfloat16).astype(jnp.float32)
gt = jax.random.randint(key, (1, 768, 768), 0, 25)
batch = {"img": img, "gt": gt}
rng = jax.random.PRNGKey(1)

state, m = step(state, batch, rng)
print("compiled; loss:", float(m["loss"]), flush=True)
t0 = time.perf_counter()
N = 6
for i in range(N):
    state, m = step(state, batch, rng)
v = float(m["loss"])
dt = (time.perf_counter() - t0) / N
print(f"train step: {dt*1000:.1f} ms (loss {v:.4f})", flush=True)
