"""Amortized device timing through the slow-sync tunnel: time scan(N=2) vs
scan(N=12) of each op; per-op time = (t12 - t2) / 10."""
import time, functools, numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def measure(name, make_fn, n_small=2, n_big=12):
    ts = {}
    for n in (n_small, n_big):
        fn = jax.jit(make_fn(n))
        fn()  # compile+enqueue
        float(fn())  # sync once post-compile
        t0 = time.perf_counter()
        v = float(fn())
        ts[n] = time.perf_counter() - t0
    per = (ts[n_big] - ts[n_small]) / (n_big - n_small)
    print(f"{name}: {per*1000:.1f} ms/iter  (t2={ts[n_small]:.3f}s t12={ts[n_big]:.3f}s)", flush=True)

key = jax.random.PRNGKey(0)

# ---- extractor-shaped MSDA
from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn
D, M = 32, 16
val_e = jax.random.normal(key, (1, 4096, M, D), jnp.bfloat16)
loc_e = jax.random.uniform(key, (1, 21504, M, 1, 4, 2), jnp.bfloat16)
att_e = jax.nn.softmax(jax.random.normal(key, (1, 21504, M, 1, 4)), -1).astype(jnp.bfloat16)

def mk_ext(n):
    def fn():
        def body(c, _):
            o = ms_deform_attn(val_e + c, ((64, 64),), loc_e, att_e)
            return c + 1e-6, jnp.sum(o.astype(jnp.float32))
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return fn

measure("msda extractor", mk_ext)

# ---- injector-shaped MSDA
val_i = jax.random.normal(key, (1, 21504, M, D), jnp.bfloat16)
loc_i = jax.random.uniform(key, (1, 4096, M, 3, 4, 2), jnp.bfloat16)
att_i = jax.nn.softmax(jax.random.normal(key, (1, 4096, M, 3, 4)), -1).astype(jnp.bfloat16)

def mk_inj(n):
    def fn():
        def body(c, _):
            o = ms_deform_attn(val_i + c, ((128, 128), (64, 64), (32, 32)), loc_i, att_i)
            return c + 1e-6, jnp.sum(o.astype(jnp.float32))
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return fn

measure("msda injector", mk_inj)

# ---- global attention
from multimodal_sam_adapter_tpu.ops.attention import attention_with_decomposed_rel_pos
q0 = jax.random.normal(key, (16, 4096, 64), jnp.bfloat16)
rp = jax.random.normal(key, (127, 64), jnp.bfloat16)

def mk_gattn(n):
    def fn():
        def body(c, _):
            o = attention_with_decomposed_rel_pos(q0 + c, q0, q0, rp, rp, (64, 64), 0.125)
            return c + 1e-6, jnp.sum(o.astype(jnp.float32))
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return fn

measure("global attn", mk_gattn)

# ---- window attention (one block's worth: 25 windows x 16 heads)
qw = jax.random.normal(key, (400, 196, 64), jnp.bfloat16)
rpw = jax.random.normal(key, (27, 64), jnp.bfloat16)

def mk_wattn(n):
    def fn():
        def body(c, _):
            o = attention_with_decomposed_rel_pos(qw + c, qw, qw, rpw, rpw, (14, 14), 0.125)
            return c + 1e-6, jnp.sum(o.astype(jnp.float32))
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return fn

measure("window attn x25", mk_wattn)

# ---- full flagship forward
from __graft_entry__ import _flagship_model
model = _flagship_model(dtype=jnp.bfloat16)
img = jax.random.normal(key, (1, 1024, 1024, 6), jnp.bfloat16)
variables = jax.jit(model.init, static_argnames=("train",))(key, img, train=False)

def mk_fwd(n):
    def fn():
        def body(c, _):
            o = model.apply(variables, img + c, train=False)
            return c + 1e-6, jnp.sum(o.astype(jnp.float32))
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return fn

measure("full forward 1024", mk_fwd, 1, 5)
