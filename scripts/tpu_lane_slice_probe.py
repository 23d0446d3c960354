"""Does Mosaic handle unaligned (64-offset) static lane slices cheaply?

Kernel A: load (196,1024) block, accumulate 16 slices of 64 lanes (64-offset
slices -> relayout?).
Kernel B: same data pre-transposed so slices are 128-aligned pairs.
Kernel C: per-head dots q_h @ k_h^T for all 16 heads from 64-offset slices
(the actual window-attention inner op).
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)


W, N, C, H, D = 25, 196, 1024, 16, 64


def _slice_kernel(x_ref, o_ref):
    acc = jnp.zeros((N, D), jnp.float32)
    for h in range(H):
        acc += x_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def slice_sum(x):
    return pl.pallas_call(
        _slice_kernel,
        grid=(W,),
        in_specs=[pl.BlockSpec((1, N, C), lambda w: (w, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, D), lambda w: (w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, N, D), jnp.bfloat16),
    )(x)


x = jax.random.normal(key, (W, N, C), jnp.bfloat16)
measure("A: 16x 64-offset lane slices + add", lambda c, x=x: jnp.sum(
    slice_sum(x + c).astype(jnp.float32)))


def _dot_kernel(q_ref, k_ref, o_ref):
    acc = jnp.zeros((N, N), jnp.float32)
    for h in range(H):
        q = q_ref[0, :, h * D:(h + 1) * D]
        k = k_ref[0, :, h * D:(h + 1) * D]
        acc += jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def dot16(q, k):
    return pl.pallas_call(
        _dot_kernel,
        grid=(W,),
        in_specs=[pl.BlockSpec((1, N, C), lambda w: (w, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, N, N), lambda w: (w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, N, N), jnp.float32),
    )(q, k)


q = jax.random.normal(key, (W, N, C), jnp.bfloat16)
k = jax.random.normal(key, (W, N, C), jnp.bfloat16)
measure("C: 16 per-head qk dots via 64-offset slices", lambda c, q=q, k=k:
        jnp.sum(dot16(q + c, k).astype(jnp.float32)))

# baseline: current-style (400,196,64) aligned per-head dot, G=8
def _dot_kernel_b(G, q_ref, k_ref, o_ref):
    for g in range(G):
        o_ref[g] = jax.lax.dot_general(
            q_ref[g], k_ref[g], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def dotb(q, k, G=8):
    B = q.shape[0]
    return pl.pallas_call(
        functools.partial(_dot_kernel_b, G),
        grid=(B // G,),
        in_specs=[pl.BlockSpec((G, N, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((G, N, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
    )(q, k)


qb = jax.random.normal(key, (W * H, N, D), jnp.bfloat16)
kb = jax.random.normal(key, (W * H, N, D), jnp.bfloat16)
measure("B: baseline aligned per-head dots (400,196,64)", lambda c, q=qb,
        k=kb: jnp.sum(dotb(q + c, k).astype(jnp.float32)))
