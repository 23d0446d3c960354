"""Probe: fused ConvNeXt block kernel vs the XLA module path.

Flagship TwinConvNeXt-small stage shapes: stage3 (64,64,384)x54 blocks,
stage4 (32,32,768)x6. Compares per-block time, bf16.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multimodal_sam_adapter_tpu.models.twin_convnext import ConvNeXtBlock
from multimodal_sam_adapter_tpu.ops.convnext_block import (
    convnext_block_fused,
)


def scan_over(fn_of_c, n):
    def f(*args):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn_of_c(c, *args)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn_of_c, *args, reps=8):
    ts = {}
    for n in (1, 9):
        fn = jax.jit(scan_over(fn_of_c, n))
        float(fn(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    per = (ts[9] - ts[1]) / 8 / reps
    print(f"{name}: {per*1000:.3f} ms/block", flush=True)


REPS = 8
for (H, C) in ((64, 384), (32, 768)):
    HID = 4 * C
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, H, H, C), jnp.bfloat16)
    module = ConvNeXtBlock(channels=C, layer_scale_init_value=1.0,
                           dtype=jnp.bfloat16)
    mp = module.init(jax.random.PRNGKey(1), x)
    pp = mp["params"]
    p = dict(
        dw=pp["dwconv"]["kernel"], dw_b=pp["dwconv"]["bias"],
        ln_g=pp["norm"]["ln"]["scale"],
        ln_b=pp["norm"]["ln"]["bias"], w1=pp["pwconv1"]["kernel"],
        b1=pp["pwconv1"]["bias"], w2=pp["pwconv2"]["kernel"],
        b2=pp["pwconv2"]["bias"], gamma=pp["gamma"],
    )
    # correctness on-device
    got = x + convnext_block_fused(x, **p)
    want = module.apply(mp, x)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(f"({H},{C}) max err fused vs module: {err:.4f}", flush=True)

    def chain_mod(c, x):
        y = x + c
        for _ in range(REPS):
            y = module.apply(mp, y)
        return jnp.sum(y.astype(jnp.float32))

    def chain_fused(c, x):
        y = x + c
        for _ in range(REPS):
            y = y + convnext_block_fused(y, **p)
        return jnp.sum(y.astype(jnp.float32))

    measure(f"module ({H},{C})", chain_mod, x)
    measure(f"fused  ({H},{C})", chain_fused, x)
