"""Kernel shootout on TPU: XLA vs Pallas MSDA, dense vs flash attention."""
import time, functools, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def measure(name, make_fn, n_small=1, n_big=9):
    try:
        ts = {}
        for n in (n_small, n_big):
            fn = jax.jit(make_fn(n))
            float(fn())  # compile + sync
            t0 = time.perf_counter(); float(fn()); ts[n] = time.perf_counter() - t0
        per = (ts[n_big] - ts[n_small]) / (n_big - n_small)
        print(f"{name}: {per*1000:.2f} ms/iter (t{n_small}={ts[n_small]:.3f} t{n_big}={ts[n_big]:.3f})", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

key = jax.random.PRNGKey(0)
from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn
from multimodal_sam_adapter_tpu.ops.msda_pallas import ms_deform_attn_pallas_fwd
D, M = 32, 16

def scan_over(fn_of_c, n):
    def f():
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn_of_c(c)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f

# extractor shapes
val_e = jax.random.normal(key, (1, 4096, M, D), jnp.bfloat16)
loc_e = jax.random.uniform(key, (1, 21504, M, 1, 4, 2), jnp.bfloat16)
att_e = jax.nn.softmax(jax.random.normal(key, (1, 21504, M, 1, 4)), -1).astype(jnp.bfloat16)
measure("msda-xla extractor", lambda n: scan_over(
    lambda c: jnp.sum(ms_deform_attn(val_e + c, ((64, 64),), loc_e, att_e).astype(jnp.float32)), n))
measure("msda-pallas-gather extractor", lambda n: scan_over(
    lambda c: jnp.sum(ms_deform_attn_pallas_fwd(val_e + c, ((64, 64),), loc_e, att_e, variant="gather").astype(jnp.float32)), n))
measure("msda-pallas-loads extractor", lambda n: scan_over(
    lambda c: jnp.sum(ms_deform_attn_pallas_fwd(val_e + c, ((64, 64),), loc_e, att_e, variant="loads").astype(jnp.float32)), n))

# injector shapes
val_i = jax.random.normal(key, (1, 21504, M, D), jnp.bfloat16)
loc_i = jax.random.uniform(key, (1, 4096, M, 3, 4, 2), jnp.bfloat16)
att_i = jax.nn.softmax(jax.random.normal(key, (1, 4096, M, 3, 4)), -1).astype(jnp.bfloat16)
shapes_i = ((128, 128), (64, 64), (32, 32))
measure("msda-xla injector", lambda n: scan_over(
    lambda c: jnp.sum(ms_deform_attn(val_i + c, shapes_i, loc_i, att_i).astype(jnp.float32)), n))
measure("msda-pallas-gather injector", lambda n: scan_over(
    lambda c: jnp.sum(ms_deform_attn_pallas_fwd(val_i + c, shapes_i, loc_i, att_i, variant="gather").astype(jnp.float32)), n))
measure("msda-pallas-loads injector", lambda n: scan_over(
    lambda c: jnp.sum(ms_deform_attn_pallas_fwd(val_i + c, shapes_i, loc_i, att_i, variant="loads").astype(jnp.float32)), n))

# global attention
from multimodal_sam_adapter_tpu.ops.attention import attention_with_decomposed_rel_pos
from multimodal_sam_adapter_tpu.ops.flash_attention import flash_attention_rel_pos
q0 = jax.random.normal(key, (16, 4096, 64), jnp.bfloat16)
rp = jax.random.normal(key, (127, 64), jnp.bfloat16)
measure("attn-dense global", lambda n: scan_over(
    lambda c: jnp.sum(attention_with_decomposed_rel_pos(q0 + c, q0, q0, rp, rp, (64, 64), 0.125).astype(jnp.float32)), n))
measure("attn-flash global", lambda n: scan_over(
    lambda c: jnp.sum(flash_attention_rel_pos(q0 + c, q0, q0, rp, rp, (64, 64), 0.125).astype(jnp.float32)), n))

# window attention (one block)
qw = jax.random.normal(key, (400, 196, 64), jnp.bfloat16)
rpw = jax.random.normal(key, (27, 64), jnp.bfloat16)
measure("attn-dense window x25", lambda n: scan_over(
    lambda c: jnp.sum(attention_with_decomposed_rel_pos(qw + c, qw, qw, rpw, rpw, (14, 14), 0.125).astype(jnp.float32)), n))

# mlp reference point
w1 = jax.random.normal(key, (1024, 4096), jnp.bfloat16); w2 = jax.random.normal(key, (4096, 1024), jnp.bfloat16)
xb = jax.random.normal(key, (4096, 1024), jnp.bfloat16)
measure("mlp 4096x1024x4x", lambda n: scan_over(
    lambda c: jnp.sum(((jax.nn.gelu((xb + c) @ w1)) @ w2).astype(jnp.float32)), n))
