"""Flash attention tuning probe + plain-matmul MFU calibration."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)

from multimodal_sam_adapter_tpu.ops.flash_attention import flash_attention_rel_pos


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
            t0 = time.perf_counter(); float(fn()); ts[n] = time.perf_counter() - t0
        print(f"{name}: {(ts[n_big]-ts[1])/(n_big-1)*1000:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)


# plain matmul MFU calibration (flagship MLP shape)
a = jax.random.normal(key, (4096, 1024), jnp.bfloat16)
b = jax.random.normal(key, (1024, 4096), jnp.bfloat16)
measure("matmul 4096x1024x4096 bf16 (17.2 GFLOP)", lambda c: jnp.sum(
    jax.lax.dot(a + c, b, preferred_element_type=jnp.float32)))

q0 = jax.random.normal(key, (16, 4096, 64), jnp.bfloat16)
rp = jax.random.normal(key, (127, 64), jnp.bfloat16)
for bq, bkr in ((256, 4), (256, 16), (512, 16), (512, 32), (1024, 16)):
    measure(f"flash bq={bq} bkr={bkr}", lambda c, bq=bq, bkr=bkr: jnp.sum(
        flash_attention_rel_pos(q0 + c, q0, q0, rp, rp, (64, 64), 0.125,
                                block_q=bq, block_k_rows=bkr)
        .astype(jnp.float32)))
