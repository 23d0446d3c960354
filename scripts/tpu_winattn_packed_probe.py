"""Probe: packed window-attention kernel (production path) group sweep +
bias-algebra check.

r3 change: the in-kernel rel-pos expansion dots (2 x (N,N)@(N,N)) were
replaced by collapse-to-ws dots + a (ws,N) expansion / pltpu.repeat —
~54% fewer kernel MACs. This measures the packed kernel across head-group
sizes at flagship shape (25 windows x 16 heads, N=196, d=64).
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)

from multimodal_sam_adapter_tpu.ops.attention import (
    attention_with_decomposed_rel_pos,
)
from multimodal_sam_adapter_tpu.ops.window_attention import (
    window_attention_packed,
)

Wn, H, N, d, ws = 25, 16, 196, 64, 14
B = Wn * H
qkvt = jax.random.normal(key, (3, B, N, d), jnp.bfloat16)
rph = jax.random.normal(jax.random.PRNGKey(3), (2 * ws - 1, d),
                        jnp.bfloat16) * 0.1
rpw = jax.random.normal(jax.random.PRNGKey(4), (2 * ws - 1, d),
                        jnp.bfloat16) * 0.1

ref = attention_with_decomposed_rel_pos(
    qkvt[0], qkvt[1], qkvt[2], rph, rpw, (ws, ws), 0.125)
ref = ref.reshape(Wn, H, N, d).transpose(0, 2, 1, 3).reshape(Wn, N, H * d)
for g in (4, 8, 16):
    got = window_attention_packed(qkvt, rph, rpw, ws, 0.125, num_heads=H,
                                  group=g)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"packed g={g} max err vs dense: {err:.5f}", flush=True)


def scan_over(fn_of_c, n):
    def f(*args):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn_of_c(c, *args)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn_of_c, *args):
    ts = {}
    for n in (1, 9):
        fn = jax.jit(scan_over(fn_of_c, n))
        float(fn(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    per = (ts[9] - ts[1]) / 8
    print(f"{name}: {per*1000:.2f} ms/iter", flush=True)


for g in (4, 8, 16):
    measure(f"packed g={g}", lambda c, g=g: jnp.sum(
        window_attention_packed(qkvt + c, rph, rpw, ws, 0.125, num_heads=H,
                                group=g).astype(jnp.float32)))
