"""LN formulation in the real consumer chain (ln -> pw1 -> gelu -> pw2),
stage-2 ConvNeXt shape: which stat formulation is cheapest IN CONTEXT."""
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
key = jax.random.PRNGKey(0)


def scan_over(fn_of_c, n):
    def f(*args):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn_of_c(c, *args)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn_of_c, *args, n_big=33):
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


N, C, D = 4096, 384, 1536
x = jax.random.normal(key, (N, C), jnp.bfloat16)
w1 = jax.random.normal(key, (C, D), jnp.bfloat16) * 0.02
w2 = jax.random.normal(key, (D, C), jnp.bfloat16) * 0.02
sc = jax.random.normal(key, (C,), jnp.float32)


def chain(y, ):
    h = jax.nn.gelu(y @ w1, approximate=False)
    return jnp.sum((h @ w2).astype(jnp.float32))


def ln_f32dots(x):
    xf = x.astype(jnp.float32)
    w = jnp.full((C, 1), 1.0 / C, jnp.float32)
    m = (xf @ w)[..., 0]
    m2 = ((xf * xf) @ w)[..., 0]
    var = jnp.maximum(m2 - m * m, 0.0)
    y = (xf - m[..., None]) * jax.lax.rsqrt(var + 1e-6)[..., None]
    return (y * sc).astype(x.dtype)


def ln_bf16dots(x):
    w = jnp.full((C, 1), 1.0 / C, jnp.bfloat16)
    m = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)[..., 0]
    m2 = jax.lax.dot_general(x * x, w, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)[..., 0]
    var = jnp.maximum(m2 - m * m, 0.0)
    y = ((x.astype(jnp.float32) - m[..., None])
         * jax.lax.rsqrt(var + 1e-6)[..., None])
    return (y * sc).astype(x.dtype)


def ln_flax(x):
    return nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16,
                        use_bias=False).apply(
        {'params': {'scale': sc}}, x)


measure("chain only (no ln)", lambda c: chain(x + c))
measure("ln-f32dots + chain", lambda c: chain(ln_f32dots(x + c)))
measure("ln-bf16dots + chain", lambda c: chain(ln_bf16dots(x + c)))
measure("ln-flax + chain", lambda c: chain(ln_flax(x + c)))
