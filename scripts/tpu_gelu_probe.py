"""Probe: is the exact-erf GELU epilogue the MLP-fusion rate limiter?

The scanned trace shows every fc1+GELU fusion running at ~66 M elements/ms
(ViT MLP 0.337 ms vs 0.175 ms matmul ideal; ConvNeXt stage-3 0.0997 vs
0.0245) — an elementwise rate, not an MXU rate. Times the flagship ViT MLP
fc1 shape (4096,1024)@(1024,4096) with different epilogues, plus candidate
cheap GELUs accurate to bf16 output resolution.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)

N, C, H = 4096, 1024, 4096
x = jax.random.normal(key, (N, C), jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (C, H), jnp.bfloat16) * 0.02
w2 = jax.random.normal(jax.random.PRNGKey(2), (H, C), jnp.bfloat16) * 0.02


def gelu_exact(h):
    return jax.nn.gelu(h, approximate=False)


def gelu_tanh(h):
    return jax.nn.gelu(h, approximate=True)


def gelu_sigmoid(h):
    return h * jax.nn.sigmoid(1.702 * h.astype(jnp.float32)).astype(h.dtype)


def gelu_poly(h):
    # odd minimax-ish polynomial for Phi(x)-like cdf on clamped range;
    # exactness target: <= bf16 output ulp (checked below)
    z = jnp.clip(h.astype(jnp.float32), -5.0, 5.0)
    z2 = z * z
    # tanh-form via exp2-free rational: t = z*(a1 + z2*(a3 + z2*(a5+z2*a7)))
    t = z * (0.7978845608 + z2 * (0.044715 * 0.7978845608))
    # tanh(t) via rational approx r(t) = t*(27+t^2)/(27+9t^2) clamped
    t2 = t * t
    th = jnp.clip(t * (27.0 + t2) / (27.0 + 9.0 * t2), -1.0, 1.0)
    return (0.5 * z * (1.0 + th)).astype(h.dtype)


def scan_over(fn, n):
    def f(x):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn(x + c).astype(jnp.float32).sum()
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn, *args, n_big=17):
    ts = {}
    for n in (1, n_big):
        f = jax.jit(scan_over(fn, n))
        float(f(*args))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter(); float(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    per = (ts[n_big] - ts[1]) / (n_big - 1)
    print(f"{name}: {per*1000:.3f} ms/iter", flush=True)


# accuracy vs exact at f32, expressed in bf16 ulps of the output
zs = jnp.linspace(-8, 8, 200001).astype(jnp.float32)
exact = jax.nn.gelu(zs, approximate=False)
for nm, g in (("tanh", gelu_tanh), ("sigmoid", gelu_sigmoid),
              ("poly", gelu_poly)):
    got = g(zs)
    err = np.abs(np.asarray(got - exact))
    # bf16 ulp of the exact output magnitude
    ulp = np.maximum(np.abs(np.asarray(exact)), 2.0**-126) * 2.0**-8
    print(f"{nm}: max abs err {err.max():.2e}, max err/ulp_bf16 "
          f"{(err/ulp).max():.2f}", flush=True)
    gb = np.asarray(g(zs.astype(jnp.bfloat16)).astype(jnp.float32))
    eb = np.asarray(exact.astype(jnp.bfloat16).astype(jnp.float32))
    frac = (gb != eb).mean()
    print(f"    bf16(out) mismatch fraction vs bf16(exact): {frac:.4f}",
          flush=True)

measure("matmul only", lambda x: x @ w, x)
measure("matmul + exact gelu", lambda x: gelu_exact(x @ w), x)
measure("matmul + tanh gelu", lambda x: gelu_tanh(x @ w), x)
measure("matmul + sigmoid gelu", lambda x: gelu_sigmoid(x @ w), x)
measure("matmul + poly gelu", lambda x: gelu_poly(x @ w), x)
measure("full mlp exact", lambda x: gelu_exact(x @ w) @ w2, x)
measure("full mlp poly", lambda x: gelu_poly(x @ w) @ w2, x)
measure("full mlp tanh", lambda x: gelu_tanh(x @ w) @ w2, x)
