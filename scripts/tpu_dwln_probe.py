"""Probe: fused dwconv7x7 + LayerNorm Pallas kernel for ConvNeXt blocks.

The per-block XLA chain (dwconv fusion 0.026 + layout copies 0.012 + LN
stat fusion 0.0325 + normalize 0.0022 ms at stage-3 geometry) runs ~2x
over its compute floor and burns ~5 ms/forward across 54 stage-3 blocks.
This kernel keeps the whole (H, W, C) map in VMEM: dy shifts are free
outer-dim indexing, dx shifts are in-register rolls + edge masks, LN
stats are in-kernel MXU ones-dots. Output = normalized dwconv result,
ready for the (near-peak) XLA fc1 matmul.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)


def _dwln_kernel(H, W, C, eps, x_ref, w_ref, b_ref, g_ref, bt_ref, o_ref):
    x = x_ref[0]                                    # (H, W, C)
    dt = x.dtype
    acc = jnp.zeros((H, W, C), jnp.float32)
    wiota = jax.lax.broadcasted_iota(jnp.int32, (H, W, C), 1)
    for dy in range(-3, 4):
        # dy indexes the untiled outer dim: a shifted static slice of the
        # zero-extended row range
        lo, hi = max(0, -dy), min(H, H - dy)
        xs = x[max(0, dy):min(H, H + dy)]           # rows that exist
        for dx in range(-3, 4):
            w = w_ref[dy + 3, dx + 3, 0].astype(jnp.float32)  # (C,)
            rolled = pltpu.roll(xs, (-dx) % W, 1)
            ok = (wiota[lo:hi] + dx >= 0) & (wiota[lo:hi] + dx < W)
            t = jnp.where(ok, rolled.astype(jnp.float32), 0.0) * w
            acc = acc.at[lo:hi].add(t)
    acc = acc + b_ref[...].astype(jnp.float32)
    ones = jnp.full((C, 1), 1.0 / C, jnp.float32)
    flat = acc.reshape(H * W, C)
    m = jax.lax.dot_general(flat, ones, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m2 = jax.lax.dot_general(flat * flat, ones, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    var = jnp.maximum(m2 - m * m, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = (flat - m) * inv * g_ref[...].astype(jnp.float32) \
        + bt_ref[...].astype(jnp.float32)
    o_ref[0] = y.reshape(H, W, C).astype(o_ref.dtype)


def dwconv_ln_fused(x, w, b, g, bt, eps=1e-6, interpret=False):
    B, H, W, C = x.shape
    return pl.pallas_call(
        functools.partial(_dwln_kernel, H, W, C, eps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b_: (b_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, 7, 1, C), lambda b_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b_: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b_: (b_, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, w, b, g, bt)


def dwln_xla(x, w, b, g, bt, eps=1e-6):
    C = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(3, 3), (3, 3)], feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    yf = y.astype(jnp.float32)
    m = yf.mean(-1, keepdims=True)
    var = yf.var(-1, keepdims=True)
    out = (yf - m) * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32) \
        + bt.astype(jnp.float32)
    return out.astype(x.dtype)


def scan_over(fn, n):
    def f(x, *rest):
        def body(c, _):
            return (c + jnp.bfloat16(1e-3),
                    fn(x + c, *rest).astype(jnp.float32).sum())
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn, *args, n_big=17):
    try:
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
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)


for (S, C, label) in ((64, 384, "stage3"), (32, 768, "stage4"),
                      (128, 192, "stage2"), (256, 96, "stage1")):
    x = jax.random.normal(key, (1, S, S, C), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 1, C),
                          jnp.bfloat16) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (C,), jnp.bfloat16) * 0.1
    g = 1 + jax.random.normal(jax.random.PRNGKey(3), (C,),
                              jnp.bfloat16) * 0.1
    bt = jax.random.normal(jax.random.PRNGKey(4), (C,), jnp.bfloat16) * 0.1
    try:
        got = dwconv_ln_fused(x, w, b, g, bt).astype(jnp.float32)
        want = dwln_xla(x, w, b, g, bt).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got - want)))
        print(f"{label} ({S}^2,{C}): max err {err:.5f}", flush=True)
    except Exception as e:
        print(f"{label}: compile FAILED {str(e)[:200]}", flush=True)
        continue
    measure(f"{label} xla chain", dwln_xla, x, w, b, g, bt)
    measure(f"{label} fused kernel", dwconv_ln_fused, x, w, b, g, bt)
