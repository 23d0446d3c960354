"""Is stacked batch-2 execution of the twin ConvNeXt matmuls faster than
two sequential matmuls? Stage-2 shapes (64x64, 384ch), ConvNeXt-S."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
key = jax.random.PRNGKey(0)


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


N, C, D = 4096, 384, 1536
x2 = jax.random.normal(key, (2, N, C), jnp.bfloat16)
w2 = jax.random.normal(key, (2, C, D), jnp.bfloat16) * 0.02
wd2 = jax.random.normal(key, (2, D, C), jnp.bfloat16) * 0.02

# full ConvNeXt MLP: pw1 -> gelu -> pw2, sequential per branch
def seq(c, x2, w2, wd2):
    outs = []
    for g in range(2):
        h = (x2[g] + c) @ w2[g]
        h = jax.nn.gelu(h, approximate=False)
        outs.append(h @ wd2[g])
    return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)


measure("mlp sequential 2x", seq, x2, w2, wd2)


def stacked(c, x2, w2, wd2):
    h = jax.lax.dot_general(x2 + c, w2, (((2,), (1,)), ((0,), (0,))))
    h = jax.nn.gelu(h, approximate=False)
    o = jax.lax.dot_general(h, wd2, (((2,), (1,)), ((0,), (0,))))
    return jnp.sum(o.astype(jnp.float32))


measure("mlp stacked bmm", stacked, x2, w2, wd2)

# with LN in front (the per-block chain LN -> pw1 -> gelu -> pw2)
sc = jax.random.normal(key, (2, C), jnp.float32)

def ln(x, g):
    xf = x.astype(jnp.float32)
    w = jnp.full((C, 1), 1.0 / C, jnp.float32)
    m = (xf @ w)[..., 0]
    m2 = ((xf * xf) @ w)[..., 0]
    var = jnp.maximum(m2 - m * m, 0.0)
    y = (xf - m[..., None]) * jax.lax.rsqrt(var + 1e-6)[..., None]
    return (y * sc[g]).astype(x.dtype)


def seq_ln(c, x2, w2, wd2):
    outs = []
    for g in range(2):
        h = ln(x2[g] + c, g) @ w2[g]
        h = jax.nn.gelu(h, approximate=False)
        outs.append(h @ wd2[g])
    return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)


measure("ln+mlp sequential 2x", seq_ln, x2, w2, wd2)


def stacked_ln(c, x2, w2, wd2):
    x = x2 + c
    xf = x.astype(jnp.float32)
    w = jnp.full((C, 1), 1.0 / C, jnp.float32)
    m = jax.lax.dot_general(xf, w, (((2,), (0,)), ((), ())))[..., 0]
    m2 = jax.lax.dot_general(xf * xf, w, (((2,), (0,)), ((), ())))[..., 0]
    var = jnp.maximum(m2 - m * m, 0.0)
    y = (xf - m[..., None]) * jax.lax.rsqrt(var + 1e-6)[..., None]
    y = (y * sc[:, None, :]).astype(x.dtype)
    h = jax.lax.dot_general(y, w2, (((2,), (1,)), ((0,), (0,))))
    h = jax.nn.gelu(h, approximate=False)
    o = jax.lax.dot_general(h, wd2, (((2,), (1,)), ((0,), (0,))))
    return jnp.sum(o.astype(jnp.float32))


measure("ln+mlp stacked bmm", stacked_ln, x2, w2, wd2)
