"""Is the 2026-08 libtpu gather regression still present?

The digit-MSDA one-hot formulation pays ~P*HW*D MXU MACs per query*head
(the gather-free price). If XLA gathers / tpu.dynamic_gather are fast
again, a true-gather MSDA costs ~P*4 row loads per query instead and the
19 ms/img MSDA bucket collapses. This probe times, at flagship extractor
and injector shapes:
  - raw jnp.take_along_axis row gather at the MSDA access pattern
  - the Pallas 'gather' variant (tpu.dynamic_gather)
  - the Pallas 'digit' variant (current production default)
  - the XLA footprint formulation (current bwd/fallback)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)
from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn
from multimodal_sam_adapter_tpu.ops.msda_pallas import ms_deform_attn_pallas_fwd


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
        print(f"{name}: {(ts[n_big]-ts[1])/(n_big-1)*1000:.3f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)


D, M = 32, 16
# extractor: Lq=21504 queries, value 64x64, L=1, P=4
Lq_e, HW_e = 21504, 4096
val_e = jax.random.normal(key, (M, HW_e, D), jnp.bfloat16)
ridx_e = jax.random.randint(key, (M, Lq_e, 16), 0, HW_e, jnp.int32)
w_e = jax.random.normal(key, (M, Lq_e, 16), jnp.float32)


def raw_gather(c):
    # 16 corner rows per (query, head): gather (M, Lq, 16, D) then reduce
    v = val_e + c
    g = jnp.take_along_axis(v[:, :, None, :], ridx_e[..., None], axis=1)
    return jnp.sum((g * w_e[..., None].astype(jnp.bfloat16)).astype(jnp.float32))


measure("raw take_along_axis extractor-shape", raw_gather)

loc_e = jax.random.uniform(key, (1, Lq_e, M, 1, 4, 2), jnp.bfloat16)
att_e = jax.nn.softmax(jax.random.normal(key, (1, Lq_e, M, 1, 4)), -1).astype(jnp.bfloat16)
val_e4 = val_e.reshape(1, HW_e, M, D) if False else jax.random.normal(key, (1, HW_e, M, D), jnp.bfloat16)
for variant in ("gather", "loads", "digit"):
    measure(f"pallas-{variant} extractor",
            lambda c, v=variant: jnp.sum(ms_deform_attn_pallas_fwd(
                val_e4 + c, ((64, 64),), loc_e, att_e, variant=v).astype(jnp.float32)))
measure("xla-footprint extractor",
        lambda c: jnp.sum(ms_deform_attn(val_e4 + c, ((64, 64),), loc_e, att_e).astype(jnp.float32)))

# injector: Lq=4096 queries, value pyramid 128^2+64^2+32^2, L=3, P=4
val_i = jax.random.normal(key, (1, 21504, M, D), jnp.bfloat16)
loc_i = jax.random.uniform(key, (1, 4096, M, 3, 4, 2), jnp.bfloat16)
att_i = jax.nn.softmax(jax.random.normal(key, (1, 4096, M, 3, 4)), -1).astype(jnp.bfloat16)
shapes_i = ((128, 128), (64, 64), (32, 32))
for variant in ("gather", "digit"):
    measure(f"pallas-{variant} injector",
            lambda c, v=variant: jnp.sum(ms_deform_attn_pallas_fwd(
                val_i + c, shapes_i, loc_i, att_i, variant=v).astype(jnp.float32)))
