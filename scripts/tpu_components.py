"""Component timing: convnext, neck, head, full forward (auto kernels)."""
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)

def scan_over(fn_of_cv, n):
    # variables threaded as a jit ARG so they don't bake into the HLO
    def f(v):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn_of_cv(c, v)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f

def measure(name, fn_of_cv, variables, n_small=1, n_big=5):
    try:
        ts = {}
        for n in (n_small, n_big):
            fn = jax.jit(scan_over(fn_of_cv, n))
            float(fn(variables))
            t0 = time.perf_counter(); float(fn(variables)); ts[n] = time.perf_counter() - t0
        print(f"{name}: {(ts[n_big]-ts[n_small])/(n_big-n_small)*1000:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)

# twin convnext
from multimodal_sam_adapter_tpu.models.twin_convnext import TwinConvNeXt
tc = TwinConvNeXt(arch="small", dtype=jnp.bfloat16)
x1 = jax.random.normal(key, (1, 1024, 1024, 3), jnp.bfloat16)
tv = jax.jit(tc.init)(key, x1, x1)
measure("twin-convnext-small", lambda c, v: sum(
    jnp.sum(o.astype(jnp.float32)) for o in tc.apply(v, x1 + c, x1)), tv)

# fusion neck
from multimodal_sam_adapter_tpu.models.fusion_neck import RoadFormer2Neck
feats = [jax.random.normal(key, (1, 256 // (2**i), 256 // (2**i), 192 * (2**i)), jnp.bfloat16) for i in range(4)]
neck = RoadFormer2Neck(in_channels=[f.shape[-1] for f in feats], dtype=jnp.bfloat16)
nv = jax.jit(neck.init)(key, feats)
measure("fusion-neck", lambda c, v: sum(
    jnp.sum(o.astype(jnp.float32)) for o in neck.apply(v, [f + c for f in feats])), nv)

# segformer head
from multimodal_sam_adapter_tpu.models.segformer_head import SegformerHead
hf = [jax.random.normal(key, (1, 256 // (2**i), 256 // (2**i), 1024), jnp.bfloat16) for i in range(4)]
head = SegformerHead(num_classes=25, dtype=jnp.bfloat16)
hv = jax.jit(head.init)(key, hf)
measure("segformer-head", lambda c, v: jnp.sum(
    head.apply(v, [f + c for f in hf]).astype(jnp.float32)), hv)

# full forward with auto kernels (flash on, msda xla for now)
from __graft_entry__ import _flagship_model
model = _flagship_model(dtype=jnp.bfloat16)
img = jax.random.normal(key, (1, 1024, 1024, 6), jnp.bfloat16)
variables = jax.jit(model.init, static_argnames=("train",))(key, img, train=False)
measure("full-forward-1024", lambda c, v: jnp.sum(
    model.apply(v, img + c, train=False).astype(jnp.float32)), variables, 1, 2)
