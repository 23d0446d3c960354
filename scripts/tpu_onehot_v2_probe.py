"""Injector-shape timing + on-device correctness for pallas-onehot-v2."""
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)
from multimodal_sam_adapter_tpu.ops.msda_pallas import ms_deform_attn_pallas_fwd
from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn_onehot

def scan_over(fn_of_c, n):
    def f():
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn_of_c(c)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f

def measure(name, fn_of_c, n_big=9):
    try:
        ts = {}
        for n in (1, n_big):
            fn = jax.jit(scan_over(fn_of_c, n))
            float(fn())
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); float(fn())
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        print(f"{name}: {(ts[n_big]-ts[1])/(n_big-1)*1000:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)

D, M = 32, 16
val_i = jax.random.normal(key, (1, 21504, M, D), jnp.bfloat16)
loc_i = jax.random.uniform(key, (1, 4096, M, 3, 4, 2), jnp.bfloat16)
att_i = jax.nn.softmax(jax.random.normal(key, (1, 4096, M, 3, 4)), -1).astype(jnp.bfloat16)
shapes_i = ((128, 128), (64, 64), (32, 32))

a = ms_deform_attn_pallas_fwd(val_i, shapes_i, loc_i, att_i, variant="onehot")
b = ms_deform_attn_onehot(val_i, shapes_i, loc_i, att_i)
print("pallas-v2 vs xla injector max diff:",
      float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))), flush=True)
measure("pallas-onehot-v2 injector", lambda c: jnp.sum(
    ms_deform_attn_pallas_fwd(val_i + c, shapes_i, loc_i, att_i, variant="onehot").astype(jnp.float32)))
val_e = jax.random.normal(key, (1, 4096, M, D), jnp.bfloat16)
loc_e = jax.random.uniform(key, (1, 21504, M, 1, 4, 2), jnp.bfloat16)
att_e = jax.nn.softmax(jax.random.normal(key, (1, 21504, M, 1, 4)), -1).astype(jnp.bfloat16)
a = ms_deform_attn_pallas_fwd(val_e, ((64, 64),), loc_e, att_e, variant="onehot")
b = ms_deform_attn_onehot(val_e, ((64, 64),), loc_e, att_e)
print("pallas-v2 vs xla extractor max diff:",
      float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))), flush=True)
