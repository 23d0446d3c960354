"""Per-block neck timing at level-0 (256^2) shapes."""
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)
from multimodal_sam_adapter_tpu.models import fusion_neck as fn

def scan_over(f2, n):
    def f(v, x):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), f2(v, x + c)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f

def measure(name, mod, x, n_big=9):
    try:
        v = jax.jit(mod.init)(key, x)
        f2 = lambda v, x: jnp.sum(mod.apply(v, x).astype(jnp.float32))
        ts = {}
        for n in (1, n_big):
            g = jax.jit(scan_over(f2, n))
            float(g(v, x))
            t0 = time.perf_counter(); float(g(v, x)); ts[n] = time.perf_counter() - t0
        print(f"{name}: {(ts[n_big]-ts[1])/(n_big-1)*1000:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)

H = 256
half = jax.random.normal(key, (1, H, H, 96), jnp.bfloat16)
full = jax.random.normal(key, (1, H, H, 192), jnp.bfloat16)
measure("GFE l0", fn.GFE(dim=96, num_heads=8, groups=32, dtype=jnp.bfloat16), half)
measure("GFFM l0", fn.GFFM(dtype=jnp.bfloat16), full)
measure("Mlp l0", fn.GatedDWConvMlp(in_features=192, dtype=jnp.bfloat16), full)
measure("CA l0", fn.CoordinateAttention(channels=192, dtype=jnp.bfloat16), full)
measure("MobileNet l0", fn.MobileNetV2Block(channels=96, dtype=jnp.bfloat16), half)
measure("FFRM l0", fn.FFRM(channels=192, dtype=jnp.bfloat16), full)
# level 3 mlp (big dense expansion check)
full3 = jax.random.normal(key, (1, 32, 32, 1536), jnp.bfloat16)
measure("Mlp l3", fn.GatedDWConvMlp(in_features=1536, dtype=jnp.bfloat16), full3)
measure("GFE l3", fn.GFE(dim=768, num_heads=8, groups=32, dtype=jnp.bfloat16),
        jax.random.normal(key, (1, 32, 32, 768), jnp.bfloat16))
