"""Account for the forward-time residual after the digit-MSDA upgrade:
SPM (twin ConvNeXt + neck), head, pyramid, global-block sub-pieces,
full forward B1/B2.
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


# --- SPM bimodal at 1024^2 (twin ConvNeXt-small + RoadFormer2 neck + conv stem)
from multimodal_sam_adapter_tpu.models.adapter import SpatialPriorModuleBimodal

rgb = jax.random.normal(key, (1, 1024, 1024, 3), jnp.bfloat16)
aux = jax.random.normal(key, (1, 1024, 1024, 3), jnp.bfloat16)
spm = SpatialPriorModuleBimodal(embed_dim=1024, conv_inplane=64, arch="small",
                                dtype=jnp.bfloat16)
vs = jax.jit(lambda k: spm.init(k, rgb, aux, False, True))(key)
measure("spm-bimodal-1024", lambda c, v: sum(
    jnp.sum(t.astype(jnp.float32)) for t in
    spm.apply(v, rgb + c, aux, False, True)), vs)

# --- full forward B1 / B2
from __graft_entry__ import _flagship_model

model = _flagship_model(dtype=jnp.bfloat16)
img1 = jax.random.normal(key, (1, 1024, 1024, 6), jnp.bfloat16)
variables = jax.jit(model.init, static_argnames=("train",))(key, img1,
                                                            train=False)
measure("full-forward-B1", lambda c, v: jnp.sum(
    model.apply(v, img1 + c, train=False).astype(jnp.float32)), variables,
    n_small=1, n_big=3)
img2 = jax.random.normal(key, (2, 1024, 1024, 6), jnp.bfloat16)
measure("full-forward-B2", lambda c, v: jnp.sum(
    model.apply(v, img2 + c, train=False).astype(jnp.float32)), variables,
    n_small=1, n_big=3)
