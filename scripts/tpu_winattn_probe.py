"""Probe: fused window-attention kernel vs the dense XLA path.

Shapes: 20 windowed SAM blocks at 1024^2 -> 25 windows x 16 heads = 400
batch, N=196 tokens, d=64.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)


def scan_over(fn_of_c, n):
    def f(*args):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn_of_c(c, *args)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn_of_c, *args, n_small=1, n_big=9):
    try:
        ts = {}
        for n in (n_small, n_big):
            fn = jax.jit(scan_over(fn_of_c, n))
            float(fn(*args))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); float(fn(*args))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        per = (ts[n_big] - ts[n_small]) / (n_big - n_small)
        print(f"{name}: {per*1000:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)


from multimodal_sam_adapter_tpu.ops.attention import (
    attention_with_decomposed_rel_pos,
)
from multimodal_sam_adapter_tpu.ops.window_attention import (
    window_attention_fused,
)

B, N, d, ws = 400, 196, 64, 14
q = jax.random.normal(key, (B, N, d), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (B, N, d), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (B, N, d), jnp.bfloat16)
rph = jax.random.normal(jax.random.PRNGKey(3), (2 * ws - 1, d),
                        jnp.bfloat16) * 0.1
rpw = jax.random.normal(jax.random.PRNGKey(4), (2 * ws - 1, d),
                        jnp.bfloat16) * 0.1

# correctness first
ref = attention_with_decomposed_rel_pos(q, k, v, rph, rpw, (ws, ws), 0.125)
for g in (4, 8, 16, 25):
    try:
        got = window_attention_fused(q, k, v, rph, rpw, ws, 0.125, group=g)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"fused g={g} max err vs dense: {err:.5f}", flush=True)
    except Exception as e:
        print(f"fused g={g} FAILED {str(e)[:200]}", flush=True)

measure("window-attn-dense", lambda c: jnp.sum(
    attention_with_decomposed_rel_pos(q + c, k, v, rph, rpw, (ws, ws),
                                      0.125).astype(jnp.float32)))
for g in (4, 8, 16, 25):
    measure(f"window-attn-fused g={g}", lambda c, g=g: jnp.sum(
        window_attention_fused(q + c, k, v, rph, rpw, ws, 0.125,
                               group=g).astype(jnp.float32)))

# full windowed block with each attention impl
from multimodal_sam_adapter_tpu.models.sam_vit import ViTBlock

x_tok = jax.random.normal(key, (1, 4096, 1024), jnp.bfloat16)
for impl in ("dense", "win_fused"):
    blk = ViTBlock(dim=1024, num_heads=16, window_size=14,
                   input_size=(64, 64), dtype=jnp.bfloat16)
    import os
    os.environ["MSA_ATTN_IMPL"] = impl
    try:
        vw = blk.init(key, x_tok, 64, 64)
        measure(f"vit-block-windowed impl={impl}", lambda c, v: jnp.sum(
            blk.apply(v, x_tok + c, 64, 64).astype(jnp.float32)), vw)
    except Exception as e:
        print(f"block impl={impl} FAILED {str(e)[:200]}", flush=True)
    finally:
        del os.environ["MSA_ATTN_IMPL"]
