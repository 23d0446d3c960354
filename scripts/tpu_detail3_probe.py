"""Probe: the neck detail3 Mlp project_in conv (1,32,32,1536)x(1536,3072).

The round-3 trace shows MSA prefetching this 9.4 MB weight into S(1) with a
~24 ms device-idle stall (copy-start.1 in the forward HLO). Measure the op
isolated, as a dot, and split into two 1536->1536 halves.
"""
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (1, 32, 32, 1536), jnp.bfloat16)
w = jax.random.normal(key, (1, 1, 1536, 3072), jnp.bfloat16)
w2d = w[0, 0]


def timed(name, fn, *args):
    import numpy as np
    def scan_fn(n):
        @jax.jit
        def f(*a):
            def body(c, _):
                out = fn(*(a[:-1] + (a[-1] + c,)))
                return c + jnp.bfloat16(1e-3), jnp.sum(out.astype(jnp.float32))
            _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
            return s.sum()
        return f
    ts = {}
    for n in (1, 33):
        f = scan_fn(n)
        float(f(*args))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter(); float(f(*args)); best = min(best, time.perf_counter() - t0)
        ts[n] = best
    per = (ts[33] - ts[1]) / 32 * 1e3
    print(f"{name}: {per:.3f} ms/call")


timed("conv1x1 (1536->3072)", lambda w, x: jax.lax.conv_general_dilated(
    x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")), w, x)
timed("dot    (1536->3072)", lambda w, x: (x.reshape(-1, 1536) @ w).reshape(1, 32, 32, 3072), w2d, x)
wa, wb = w2d[:, :1536], w2d[:, 1536:]
timed("split dots 2x(1536->1536)",
      lambda wab, x: jnp.concatenate([(x.reshape(-1, 1536) @ wab[0]).reshape(1, 32, 32, 1536),
                                      (x.reshape(-1, 1536) @ wab[1]).reshape(1, 32, 32, 1536)], -1),
      jnp.stack([wa, wb]), x)
