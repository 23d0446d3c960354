"""Quick per-component timing: ViT blocks + injector/extractor only."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)
T0 = time.time()


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
            print(f"  [{time.time()-T0:.0f}s] {name} n={n} compiled", flush=True)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter(); float(fn(*args))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        per = (ts[n_big] - ts[n_small]) / (n_big - n_small)
        print(f"{name}: {per*1000:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)


from multimodal_sam_adapter_tpu.models.sam_vit import ViTBlock

x_tok = jax.random.normal(key, (1, 4096, 1024), jnp.bfloat16)
blk_w = ViTBlock(dim=1024, num_heads=16, window_size=14, input_size=(64, 64),
                 dtype=jnp.bfloat16)
vw = jax.jit(blk_w.init, static_argnums=(2, 3))(key, x_tok, 64, 64)
measure("vit-block-windowed", lambda c, v: jnp.sum(
    blk_w.apply(v, x_tok + c, 64, 64).astype(jnp.float32)), vw)

blk_g = ViTBlock(dim=1024, num_heads=16, window_size=0, input_size=(64, 64),
                 dtype=jnp.bfloat16)
vg = jax.jit(blk_g.init, static_argnums=(2, 3))(key, x_tok, 64, 64)
measure("vit-block-global", lambda c, v: jnp.sum(
    blk_g.apply(v, x_tok + c, 64, 64).astype(jnp.float32)), vg)

from multimodal_sam_adapter_tpu.models.adapter import Extractor, Injector

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
