"""Probe: LayerNorm stat formulations at ConvNeXt widths.

The r3 flagship trace shows `%fusion f32[64,64]` x45 at ~0.09 ms each (the
TwinConvNeXt stage-3 LN2d stats over (4096, 384)) — ~25x off bandwidth,
suggesting XLA strength-reduces the (C, 1) stat dot of _matmul_moments back
into a cross-lane reduce at small C. Variants, each fused into a full
LN-normalize (so the comparison includes the consumer):

  A: current _matmul_moments ((C, 1) ones dot)
  B: (C, 128) ones block, slice column 0 (forces a real MXU dot)
  C: jnp.mean/var (plain reduce)
  D: one dot with 2 columns: [mean_w | mean_w] against [x | x*x] rows
     stacked — single pass? (stacks double the stream; included as control)

Timing: (scan(9)-scan(1))/8 min-of-5 per variant, over 32 chained LNs to
amortize; shapes (4096, 384) bf16 like ConvNeXt-S stage 3.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, C = 4096, 384
REPS = 32
x0 = jax.random.normal(jax.random.PRNGKey(0), (N, C), jnp.bfloat16)
g = jax.random.normal(jax.random.PRNGKey(1), (C,), jnp.float32) * 0.1 + 1.0
b = jax.random.normal(jax.random.PRNGKey(2), (C,), jnp.float32) * 0.1


def ln_with(stats):
    def ln(x):
        m, m2 = stats(x)
        var = jnp.maximum(m2 - m * m, 0.0)
        inv = jax.lax.rsqrt(var + 1e-6)[..., None]
        y = (x.astype(jnp.float32) - m[..., None]) * inv
        return (y * g + b).astype(x.dtype)
    return ln


def stats_dot1(x):
    xf = x.astype(jnp.float32)
    w = jnp.full((C, 1), 1.0 / C, jnp.float32)
    m = jax.lax.dot_general(xf, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)[..., 0]
    m2 = jax.lax.dot_general(xf * xf, w, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)[..., 0]
    return m, m2


def stats_dot128(x):
    xf = x.astype(jnp.float32)
    w = jnp.zeros((C, 128), jnp.float32).at[:, 0].set(1.0 / C)
    w = w.at[:, 1].set(1.0 / C)  # col1 unused; keeps XLA from re-slimming
    m = jax.lax.dot_general(xf, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)[..., 0]
    m2 = jax.lax.dot_general(xf * xf, w, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)[..., 0]
    return m, m2


def stats_reduce(x):
    xf = x.astype(jnp.float32)
    return jnp.mean(xf, -1), jnp.mean(xf * xf, -1)


def stats_joint(x):
    xf = x.astype(jnp.float32)
    w = jnp.full((C, 1), 1.0 / C, jnp.float32)
    both = jnp.concatenate([xf, xf * xf], 0)        # (2N, C)
    mm = jax.lax.dot_general(both, w, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)[..., 0]
    return mm[:N], mm[N:]


def bench(name, stats):
    ln = ln_with(stats)

    def make(n):
        @jax.jit
        def fn(x):
            def body(c, _):
                y = c
                for _ in range(REPS):
                    y = ln(y) + jnp.bfloat16(1e-3)
                return y, ()
            y, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(y.astype(jnp.float32))
        return fn

    ts = {}
    for n in (1, 9):
        fn = make(n)
        float(fn(x0))
        best = float("inf")
        for _ in range(5):
            t = time.perf_counter()
            float(fn(x0))
            best = min(best, time.perf_counter() - t)
        ts[n] = best
    per = (ts[9] - ts[1]) / 8 / REPS * 1e3
    print(f"{name:10s} {per:.4f} ms/LN")


bench("dot1", stats_dot1)
bench("dot128", stats_dot128)
bench("reduce", stats_reduce)
bench("joint", stats_joint)
