"""Digit-decomposed MSDA kernel vs the XLA one-hot default, flagship shapes.

Also checks numerics on-device and times the full Injector/Extractor modules
under MSA_MSDA_IMPL to estimate the in-context effect.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)

from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn_onehot
from multimodal_sam_adapter_tpu.ops.msda_pallas import (
    make_ms_deform_attn,
    ms_deform_attn_pallas_fwd,
)


def scan_over(fn_of_c, n):
    def f():
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn_of_c(c)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn_of_c, n_big=9):
    try:
        ts = {}
        for n in (1, n_big):
            fn = jax.jit(scan_over(fn_of_c, n))
            float(fn())
            t0 = time.perf_counter(); float(fn()); ts[n] = time.perf_counter() - t0
        print(f"{name}: {(ts[n_big]-ts[1])/(n_big-1)*1000:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)


D, M = 32, 16
# extractor shape: Lq=21504 queries over a single (64,64) value level
val_e = jax.random.normal(key, (1, 4096, M, D), jnp.bfloat16)
loc_e = jax.random.uniform(key, (1, 21504, M, 1, 4, 2), jnp.bfloat16)
att_e = jax.nn.softmax(jax.random.normal(key, (1, 21504, M, 1, 4)), -1).astype(jnp.bfloat16)
# injector shape: Lq=4096 queries over (128,128),(64,64),(32,32) levels
val_i = jax.random.normal(key, (1, 21504, M, D), jnp.bfloat16)
loc_i = jax.random.uniform(key, (1, 4096, M, 3, 4, 2), jnp.bfloat16)
att_i = jax.nn.softmax(jax.random.normal(key, (1, 4096, M, 3, 4)), -1).astype(jnp.bfloat16)
shapes_i = ((128, 128), (64, 64), (32, 32))

# numerics on-device first
a = ms_deform_attn_pallas_fwd(val_e, ((64, 64),), loc_e, att_e, variant="digit")
b = ms_deform_attn_onehot(val_e, ((64, 64),), loc_e, att_e)
print("digit-vs-onehot extractor max diff:",
      float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
      flush=True)
a = ms_deform_attn_pallas_fwd(val_i, shapes_i, loc_i, att_i, variant="digit")
b = ms_deform_attn_onehot(val_i, shapes_i, loc_i, att_i)
print("digit-vs-onehot injector max diff:",
      float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
      flush=True)

measure("onehot-XLA extractor", lambda c: jnp.sum(
    ms_deform_attn_onehot(val_e + c, ((64, 64),), loc_e, att_e).astype(jnp.float32)))
measure("digit-pallas extractor", lambda c: jnp.sum(
    ms_deform_attn_pallas_fwd(val_e + c, ((64, 64),), loc_e, att_e,
                              variant="digit").astype(jnp.float32)))
measure("onehot-XLA injector", lambda c: jnp.sum(
    ms_deform_attn_onehot(val_i + c, shapes_i, loc_i, att_i).astype(jnp.float32)))
measure("digit-pallas injector", lambda c: jnp.sum(
    ms_deform_attn_pallas_fwd(val_i + c, shapes_i, loc_i, att_i,
                              variant="digit").astype(jnp.float32)))

# --- in-context: full Injector/Extractor modules with each impl ---
from multimodal_sam_adapter_tpu.models.adapter import Extractor, Injector

x_tok = jax.random.normal(key, (1, 4096, 1024), jnp.bfloat16)
c_tok = jax.random.normal(key, (1, 21504, 1024), jnp.bfloat16)
shapes_c = ((128, 128), (64, 64), (32, 32))
for impl in ("onehot", "pallas_digit"):
    import os
    os.environ["MSA_MSDA_IMPL"] = impl
    inj = Injector(dim=1024, query_hw=(64, 64), value_shapes=shapes_c,
                   num_heads=16, n_points=4, deform_ratio=0.5,
                   init_values=1e-6, dtype=jnp.bfloat16)
    vi = jax.jit(inj.init)(key, x_tok, c_tok)
    measure(f"injector-full[{impl}]", lambda c, v=vi, m=inj: jnp.sum(
        m.apply(v, x_tok + c, c_tok).astype(jnp.float32)))
    ext = Extractor(dim=1024, query_shapes=shapes_c, value_shapes=((64, 64),),
                    hw=(64, 64), num_heads=16, n_points=4, deform_ratio=0.5,
                    with_cffn=True, cffn_ratio=0.25, dtype=jnp.bfloat16)
    ve = jax.jit(ext.init)(key, c_tok, x_tok)
    measure(f"extractor-full[{impl}]", lambda c, v=ve, m=ext: jnp.sum(
        m.apply(v, c_tok + c, x_tok).astype(jnp.float32)))
