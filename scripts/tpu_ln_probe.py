"""LayerNorm formulation shootout at ViT-block shape (1,4096,1024) bf16.

Variants: flax reduce, current matmul-moments (two N=1 dots), single
concat dot (N=2), N=128 ones matrix, transposed-stats.
"""
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
        print(f"{name}: {per*1000:.4f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)


x = jax.random.normal(key, (1, 4096, 1024), jnp.bfloat16)
sc = jax.random.normal(key, (1024,), jnp.float32)
bi = jax.random.normal(key, (1024,), jnp.float32)
eps = 1e-6


def finish(x, m, m2):
    var = jnp.maximum(m2 - m * m, 0.0)
    inv = jax.lax.rsqrt(var + eps)[..., None]
    y = (x.astype(jnp.float32) - m[..., None]) * inv
    return ((y * sc + bi).astype(x.dtype))


def ln_flax(c, x):
    mdl = nn.LayerNorm(epsilon=eps, dtype=jnp.bfloat16)
    return jnp.sum(mdl.apply({'params': {'scale': sc, 'bias': bi}}, x + c)
                   .astype(jnp.float32))


measure("flax-reduce", ln_flax, x)


def ln_two_dots(c, x):
    x = x + c
    C = x.shape[-1]
    xf = x.astype(jnp.float32)
    w = jnp.full((C, 1), 1.0 / C, jnp.float32)
    m = jax.lax.dot_general(xf, w, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)[..., 0]
    m2 = jax.lax.dot_general(xf * xf, w, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)[..., 0]
    return jnp.sum(finish(x, m, m2).astype(jnp.float32))


measure("two-N1-dots (current)", ln_two_dots, x)


def ln_concat_dot(c, x):
    x = x + c
    C = x.shape[-1]
    xf = x.astype(jnp.float32)
    aug = jnp.concatenate([xf, xf * xf], axis=-1)       # (.., 2C)
    w = jnp.zeros((2 * C, 2), jnp.float32)
    w = w.at[:C, 0].set(1.0 / C).at[C:, 1].set(1.0 / C)
    s = jax.lax.dot_general(aug, w, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.sum(finish(x, s[..., 0], s[..., 1]).astype(jnp.float32))


measure("concat-N2-dot", ln_concat_dot, x)


def ln_bf16_dots(c, x):
    # dots on bf16 operands (x and bf16 x^2), f32 accumulate
    x = x + c
    C = x.shape[-1]
    w = jnp.full((C, 1), 1.0 / C, jnp.bfloat16)
    m = jax.lax.dot_general(x, w, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)[..., 0]
    m2 = jax.lax.dot_general(x * x, w, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)[..., 0]
    return jnp.sum(finish(x, m, m2).astype(jnp.float32))


measure("two-bf16-dots", ln_bf16_dots, x)


def ln_wide_dot(c, x):
    x = x + c
    C = x.shape[-1]
    xf = x.astype(jnp.float32)
    w = jnp.concatenate([jnp.full((C, 1), 1.0 / C, jnp.float32)] * 8, 1)
    m = jax.lax.dot_general(xf, w, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)[..., 0]
    m2 = jax.lax.dot_general(xf * xf, w, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)[..., 0]
    return jnp.sum(finish(x, m, m2).astype(jnp.float32))


measure("two-N8-dots", ln_wide_dot, x)
