"""Flash-attention tile shootout after the bf16-QK change.
Shapes: SAM global block (B=16 heads, N=4096, d=64, 64x64 grid)."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
key = jax.random.PRNGKey(0)

from multimodal_sam_adapter_tpu.ops.flash_attention import (
    flash_attention_rel_pos,
)


def scan_over(fn_of_c, n):
    def f(*args):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn_of_c(c, *args)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn_of_c, *args, n_big=17):
    try:
        ts = {}
        for n in (1, n_big):
            fn = jax.jit(scan_over(fn_of_c, n))
            float(fn(*args))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter(); float(fn(*args))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        per = (ts[n_big] - ts[1]) / (n_big - 1)
        print(f"{name}: {per*1000:.3f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)


B, N, d, H = 16, 4096, 64, 64
q = jax.random.normal(key, (B, N, d), jnp.bfloat16)
k = jax.random.normal(key, (B, N, d), jnp.bfloat16)
v = jax.random.normal(key, (B, N, d), jnp.bfloat16)
rph = jax.random.normal(key, (127, d), jnp.bfloat16) * 0.5
rpw = jax.random.normal(key, (127, d), jnp.bfloat16) * 0.5

qkvt = jnp.stack([q, k, v])
for bq in (512, 1024, 2048, 4096):
    for bkr in (32, 64, 128):
        measure(f"flash bq={bq} rows={bkr}", lambda c, bq=bq, bkr=bkr: jnp.sum(
            flash_attention_rel_pos(qkvt.at[0].add(c), rph, rpw, (H, H),
                                    0.125, block_q=bq, block_k_rows=bkr)
            .astype(jnp.float32)))
