"""Probe 2: per-DMA latency for small once-used params.

tpu_param_dma_probe.py showed big-weight streaming at ~450 GB/s, so the
~34 ms async-only bucket in the flagship forward is not bytes. Remaining
hypothesis: per-transfer latency on the ~1100 small param arrays (each
prefetched into S(1) right before its consumer). This probe makes the
param count the only variable:

  S    : 96-matmul chain, one (1024,1024) weight each     (96 DMAs/chain)
  S8   : same chain, plus 8 distinct (1024,) biases per step summed into
         the matmul epilogue                             (+768 DMAs/chain)
  S8p  : same math, the 768 biases packed as one (96,8,1024) param
Per-DMA latency estimate = (S8 - S) / 768.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, NB = 96, 8
Ws = tuple(jax.random.normal(jax.random.PRNGKey(i), (1024, 1024),
                             jnp.bfloat16) * 0.03 for i in range(N))
bs = tuple(jax.random.normal(jax.random.PRNGKey(1000 + i), (1024,),
                             jnp.bfloat16) for i in range(N * NB))
bp = jnp.stack(bs).reshape(N, NB, 1024)
y0 = jax.random.normal(jax.random.PRNGKey(0), (256, 1024), jnp.bfloat16)


def make_scan(chain, n):
    @jax.jit
    def f(y, ws, bias):
        def body(c, _):
            out = chain(y + c, ws, bias)
            return c + jnp.bfloat16(1e-3), jnp.sum(out.astype(jnp.float32))
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def chain_s(y, ws, bias):
    for w in ws:
        y = jax.nn.relu(y @ w)
    return y


def chain_s8(y, ws, bias):
    for i, w in enumerate(ws):
        b = bias[i * NB]
        for j in range(1, NB):
            b = b + bias[i * NB + j]
        y = jax.nn.relu(y @ w + b)
    return y


def chain_s8p(y, ws, bp):
    for i, w in enumerate(ws):
        y = jax.nn.relu(y @ w + jnp.sum(bp[i], 0))
    return y


def timed(name, chain, bias):
    ts = {}
    for n in (1, 9):
        f = make_scan(chain, n)
        float(f(y0, Ws, bias))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(y0, Ws, bias))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    per = (ts[9] - ts[1]) / 8
    print(f"{name}: {per*1e3:8.3f} ms/chain", flush=True)
    return per


tS = timed("S   no biases          ", chain_s, bs)
t8 = timed("S8  768 sep biases     ", chain_s8, bs)
t8p = timed("S8p packed (96,8,1024) ", chain_s8p, bp)
print(f"  S8-S : {(t8-tS)*1e3:7.3f} ms -> {(t8-tS)/768*1e6:6.2f} us/DMA",
      flush=True)
print(f"  S8p-S: {(t8p-tS)*1e3:7.3f} ms", flush=True)
