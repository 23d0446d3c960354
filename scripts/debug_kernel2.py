import time, traceback, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)
from multimodal_sam_adapter_tpu.ops.msda_pallas import ms_deform_attn_pallas_fwd
from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn
D, M = 32, 16
val = jax.random.normal(key, (1, 4096, M, D), jnp.bfloat16)
loc = jax.random.uniform(key, (1, 21504, M, 1, 4, 2), jnp.bfloat16)
att = jax.nn.softmax(jax.random.normal(key, (1, 21504, M, 1, 4)), -1).astype(jnp.bfloat16)

def scan_over(fn_of_c, n):
    def f():
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn_of_c(c)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f

def measure(name, fn_of_c):
    try:
        ts = {}
        for n in (1, 9):
            fn = jax.jit(scan_over(fn_of_c, n))
            float(fn())
            t0 = time.perf_counter(); float(fn()); ts[n] = time.perf_counter() - t0
        print(f"{name}: {(ts[9]-ts[1])/8*1000:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)

measure("extractor loads", lambda c: jnp.sum(ms_deform_attn_pallas_fwd(val + c, ((64,64),), loc, att, variant="loads").astype(jnp.float32)))
# correctness vs xla on TPU
a = ms_deform_attn_pallas_fwd(val, ((64,64),), loc, att, variant="loads")
b = ms_deform_attn(val, ((64,64),), loc, att)
print("max diff vs xla:", float(jnp.max(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)))), flush=True)
