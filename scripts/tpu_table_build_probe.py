"""Probe: MSDA digit-table build — two-step (reshape/transpose to (BM,HW,D)
then _digit_tables) vs the single 8-D transpose straight from the flat
value (_digit_tables_flat).

The r2b note said the flat build measured ~7 ms slower END-TO-END; the r5
trace prices the two-step injector build at ~1.2 ms/fwd of materialized
copies, so re-measure both in isolation at current toolchain.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multimodal_sam_adapter_tpu.ops.msda_pallas import (
    _digit_lo, _digit_tables, _digit_tables_flat,
)


def scan_over(fn, n):
    def f(x):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), jax.tree.map(
                lambda t: t.astype(jnp.float32).sum(), fn(x + c))
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return jax.tree.reduce(lambda a, b: a + b, s)
    return f


def measure(name, fn, x, n_big=65):
    ts = {}
    for n in (1, n_big):
        f = jax.jit(scan_over(fn, n))
        float(f(x))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter(); float(f(x))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    per = (ts[n_big] - ts[1]) / (n_big - 1)
    print(f"  {name}: {per*1000:.3f} ms/iter", flush=True)


B, M, D = 1, 16, 32
for (H, W) in [(128, 128), (64, 64)]:
    HWq = ((H + 1) // 2) * ((W + 1) // 2)
    LO = _digit_lo(HWq)
    HI = -(-HWq // LO)
    val_flat = jax.random.normal(jax.random.PRNGKey(0), (B, H * W, M * D),
                                 jnp.bfloat16)

    def two_step(vf):
        val = vf.reshape(B, H * W, M, D).transpose(0, 2, 1, 3)
        val = val.reshape(B * M, H * W, D)
        return _digit_tables(val, H, W, LO, HI)

    def one_step(vf):
        return _digit_tables_flat(vf, B, H, W, M, D, LO, HI)

    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        two_step(v).astype(jnp.float32) -
        one_step(v).astype(jnp.float32))))(val_flat))
    print(f"({H},{W}) LO={LO} HI={HI}: max|a-b| = {err}", flush=True)
    measure("two_step ", two_step, val_flat)
    measure("one_step ", one_step, val_flat)
