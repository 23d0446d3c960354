"""Round-2 forward breakdown at flagship shapes (scan-amortized device time).

Times each hot component standalone, plus full ViT blocks and batch-2
feasibility, to direct the perf work (VERDICT round 1, weak #2).
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)


def scan_over(fn_of_c, n):
    def f(*args):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn_of_c(c, *args)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn_of_c, *args, n_small=1, n_big=9):
    try:
        ts = {}
        for n in (n_small, n_big):
            fn = jax.jit(scan_over(fn_of_c, n))
            float(fn(*args))
            t0 = time.perf_counter(); float(fn(*args)); ts[n] = time.perf_counter() - t0
        per = (ts[n_big] - ts[n_small]) / (n_big - n_small)
        print(f"{name}: {per*1000:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)


from multimodal_sam_adapter_tpu.models.sam_vit import ViTBlock

# --- one windowed ViT block (B=1, 64x64 grid, window 14) incl. qkv/mlp
blk_w = ViTBlock(dim=1024, num_heads=16, window_size=14, input_size=(64, 64),
                 dtype=jnp.bfloat16)
x_tok = jax.random.normal(key, (1, 4096, 1024), jnp.bfloat16)
vw = blk_w.init(key, x_tok, 64, 64)
measure("vit-block-windowed", lambda c, v: jnp.sum(
    blk_w.apply(v, x_tok + c, 64, 64).astype(jnp.float32)), vw)

# --- one global ViT block (flash picked by auto)
blk_g = ViTBlock(dim=1024, num_heads=16, window_size=0, input_size=(64, 64),
                 dtype=jnp.bfloat16)
vg = blk_g.init(key, x_tok, 64, 64)
measure("vit-block-global-auto", lambda c, v: jnp.sum(
    blk_g.apply(v, x_tok + c, 64, 64).astype(jnp.float32)), vg)

# --- attention-only pieces
from multimodal_sam_adapter_tpu.ops.attention import attention_with_decomposed_rel_pos
qw = jax.random.normal(key, (400, 196, 64), jnp.bfloat16)
rpw = jax.random.normal(key, (27, 64), jnp.bfloat16)
measure("window-attn-core(25w x16h)", lambda c: jnp.sum(
    attention_with_decomposed_rel_pos(qw + c, qw, qw, rpw, rpw, (14, 14),
                                      0.125).astype(jnp.float32)))

q0 = jax.random.normal(key, (16, 4096, 64), jnp.bfloat16)
rp = jax.random.normal(key, (127, 64), jnp.bfloat16)
measure("global-attn-dense", lambda c: jnp.sum(
    attention_with_decomposed_rel_pos(q0 + c, q0, q0, rp, rp, (64, 64),
                                      0.125).astype(jnp.float32)))
from multimodal_sam_adapter_tpu.ops.flash_attention import flash_attention_rel_pos_diff
measure("global-attn-flash", lambda c: jnp.sum(
    flash_attention_rel_pos_diff(q0 + c, q0, q0, rp, rp, (64, 64),
                                 0.125).astype(jnp.float32)))

# --- adapter interaction stage cost (1 injector + 6 blocks is the stage;
# here: injector alone, extractor alone incl. ConvFFN)
from multimodal_sam_adapter_tpu.models.adapter import Injector, Extractor
c_tok = jax.random.normal(key, (1, 21504, 1024), jnp.bfloat16)
shapes_c = ((128, 128), (64, 64), (32, 32))
inj = Injector(dim=1024, query_hw=(64, 64), value_shapes=shapes_c,
               num_heads=16, n_points=4, deform_ratio=0.5,
               init_values=1e-6, dtype=jnp.bfloat16)
vi = jax.jit(inj.init)(key, x_tok, c_tok)
measure("injector-full", lambda c, v: jnp.sum(
    inj.apply(v, x_tok + c, c_tok).astype(jnp.float32)), vi)

ext = Extractor(dim=1024, query_shapes=shapes_c, value_shapes=((64, 64),),
                hw=(64, 64), num_heads=16, n_points=4, deform_ratio=0.5,
                with_cffn=True, cffn_ratio=0.25, dtype=jnp.bfloat16)
ve = jax.jit(ext.init)(key, c_tok, x_tok)
measure("extractor-full", lambda c, v: jnp.sum(
    ext.apply(v, c_tok + c, x_tok).astype(jnp.float32)), ve)

# --- full forward B=1 and B=2
from __graft_entry__ import _flagship_model
model = _flagship_model(dtype=jnp.bfloat16)
img1 = jax.random.normal(key, (1, 1024, 1024, 6), jnp.bfloat16)
variables = jax.jit(model.init, static_argnames=("train",))(key, img1, train=False)
measure("full-forward-B1", lambda c, v: jnp.sum(
    model.apply(v, img1 + c, train=False).astype(jnp.float32)), variables,
    n_small=1, n_big=2)
img2 = jax.random.normal(key, (2, 1024, 1024, 6), jnp.bfloat16)
measure("full-forward-B2", lambda c, v: jnp.sum(
    model.apply(v, img2 + c, train=False).astype(jnp.float32)), variables,
    n_small=1, n_big=2)
