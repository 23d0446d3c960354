"""Probe: weight-streaming bandwidth of this TPU runtime.

The r3 trace shows ~34 ms/forward where only DMAs run (param prefetches
into S(1)); the model streams ~165 MB of bf16 weights per forward. If the
effective prefetch bandwidth is ~5 GB/s, that bucket IS weight streaming
and the lever is bytes, not op structure.

Chains of 96 matmuls [256,1024]x[1024,1024]:
  R: one shared weight reused 96x       (2 MB resident -> compute floor)
  S: 96 distinct weights                (192 MB streamed per chain)
  P: distinct weights packed (96,1024,1024), indexed statically
  H: distinct weights, chain split into 2 parallel 48-chains (overlap test)
Timing: (scan(9)-scan(1))/8, min-of-5 (host syncs are tens of ms here).
Streaming BW estimate = 190 MB / (S - R).
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 96
key = jax.random.PRNGKey(0)
Ws = [jax.random.normal(jax.random.PRNGKey(i), (1024, 1024),
                        jnp.bfloat16) * 0.03 for i in range(N)]
Wp = jnp.stack(Ws)
y0 = jax.random.normal(key, (256, 1024), jnp.bfloat16)


def make_scan(chain, n):
    @jax.jit
    def f(y, ws):
        def body(c, _):
            out = chain(y + c, ws)
            return c + jnp.bfloat16(1e-3), jnp.sum(out.astype(jnp.float32))
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def chain_reuse(y, ws):
    for _ in range(N):
        y = jax.nn.relu(y @ ws[0])
    return y


def chain_sep(y, ws):
    for w in ws:
        y = jax.nn.relu(y @ w)
    return y


def chain_pack(y, wp):
    for i in range(N):
        y = jax.nn.relu(y @ wp[i])
    return y


def chain_half(y, ws):
    a, b = y, y
    for i in range(N // 2):
        a = jax.nn.relu(a @ ws[2 * i])
        b = jax.nn.relu(b @ ws[2 * i + 1])
    return a + b


def timed(name, chain, ws):
    ts = {}
    for n in (1, 9):
        f = make_scan(chain, n)
        float(f(y0, ws))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(y0, ws))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    per = (ts[9] - ts[1]) / 8
    print(f"{name}: {per*1e3:8.3f} ms/chain", flush=True)
    return per


tR = timed("R reuse 1 weight   ", chain_reuse, tuple(Ws))
tS = timed("S 96 sep weights   ", chain_sep, tuple(Ws))
tP = timed("P packed (96,1k,1k)", chain_pack, Wp)
tH = timed("H 2 parallel halves", chain_half, tuple(Ws))
mb = 190 * 2 * 1024 * 1024 / 1e6
for nm, t in (("S", tS), ("P", tP), ("H", tH)):
    if t > tR:
        print(f"  {nm}-R: {(t-tR)*1e3:7.3f} ms -> streaming BW "
              f"~{mb/1e3/(t-tR):6.1f} GB/s", flush=True)
