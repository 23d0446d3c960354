"""Full accounting of the flagship forward at the current tree:
full forward, backbone, SPM, head, pyramid assembly, logits resize.
Component times from tpu_quick_blocks.py: win-block 1.47, global 3.14,
injector 2.72, extractor 3.32.
"""
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
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter(); float(fn(*args))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        per = (ts[n_big] - ts[n_small]) / (n_big - n_small)
        print(f"[{time.time()-T0:.0f}s] {name}: {per*1000:.2f} ms/iter",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)


from __graft_entry__ import _flagship_model

model = _flagship_model(dtype=jnp.bfloat16)
img = jax.random.normal(key, (1, 1024, 1024, 6), jnp.bfloat16)
variables = jax.jit(model.init, static_argnames=("train",))(key, img,
                                                            train=False)
measure("full-forward", lambda c, v: jnp.sum(
    model.apply(v, img + c, train=False).astype(jnp.float32)), variables,
    n_big=2)
measure("backbone", lambda c, v: sum(
    jnp.sum(t.astype(jnp.float32)) for t in
    model.apply(v, img + c, train=False, method=model.features)),
    variables, n_big=2)

# SPM bimodal alone
from multimodal_sam_adapter_tpu.models.adapter import SpatialPriorModuleBimodal

rgb = img[..., :3]
aux = img[..., 3:]
spm = SpatialPriorModuleBimodal(embed_dim=1024, conv_inplane=64, arch="small",
                                dtype=jnp.bfloat16)
vs = jax.jit(lambda k: spm.init(k, rgb, aux, False, True))(key)
measure("spm-bimodal", lambda c, v: sum(
    jnp.sum(t.astype(jnp.float32)) for t in
    spm.apply(v, rgb + c, aux, False, True)), vs)

# head on flagship pyramid shapes
from multimodal_sam_adapter_tpu.models.segformer_head import SegformerHead

f1 = jax.random.normal(key, (1, 256, 256, 1024), jnp.bfloat16)
f2 = jax.random.normal(key, (1, 128, 128, 1024), jnp.bfloat16)
f3 = jax.random.normal(key, (1, 64, 64, 1024), jnp.bfloat16)
f4 = jax.random.normal(key, (1, 32, 32, 1024), jnp.bfloat16)
head = SegformerHead(num_classes=25, channels=512, dtype=jnp.bfloat16)
vh = jax.jit(lambda k: head.init(k, [f1, f2, f3, f4], train=False))(key)
measure("segformer-head", lambda c, v: jnp.sum(
    head.apply(v, [f1 + c, f2, f3, f4], train=False).astype(jnp.float32)), vh)

# logits resize 256 -> 1024
from multimodal_sam_adapter_tpu.utils.interpolate import resize_bilinear

lg = jax.random.normal(key, (1, 256, 256, 25), jnp.bfloat16)
measure("logits-resize-4x", lambda c: jnp.sum(
    resize_bilinear(lg + c, (1024, 1024)).astype(jnp.float32)))

# pyramid assembly at flagship shapes (convtranspose + 3 resizes + adds + BNs)
from flax import linen as nn
from multimodal_sam_adapter_tpu.nn.layers import BatchNorm


class Pyr(nn.Module):
    @nn.compact
    def __call__(self, c1, c2, c3, c4, x3):
        x1 = resize_bilinear(x3, (256, 256))
        x2 = resize_bilinear(x3, (128, 128))
        x4 = resize_bilinear(x3, (32, 32))
        c1 = nn.ConvTranspose(1024, (2, 2), strides=(2, 2),
                              dtype=jnp.bfloat16, name="up")(c2) + c1
        c1, c2, c3, c4 = c1 + x1, c2 + x2, c3 + x3, c4 + x4
        f = [BatchNorm(dtype=jnp.bfloat16, name=f"n{i}")(t, train=False)
             for i, t in enumerate((c1, c2, c3, c4))]
        return sum(jnp.sum(t.astype(jnp.float32)) for t in f)


c1 = jax.random.normal(key, (1, 256, 256, 1024), jnp.bfloat16)
c2 = jax.random.normal(key, (1, 128, 128, 1024), jnp.bfloat16)
c3 = jax.random.normal(key, (1, 64, 64, 1024), jnp.bfloat16)
c4 = jax.random.normal(key, (1, 32, 32, 1024), jnp.bfloat16)
x3 = jax.random.normal(key, (1, 64, 64, 1024), jnp.bfloat16)
pyr = Pyr()
vp = jax.jit(pyr.init)(key, c1, c2, c3, c4, x3)
measure("pyramid-assembly", lambda c, v: pyr.apply(v, c1 + c, c2, c3, c4, x3),
        vp)

# patch embed + pos
from multimodal_sam_adapter_tpu.models.sam_vit import PatchEmbed

pe = PatchEmbed(embed_dim=1024, dtype=jnp.bfloat16)
vpe = jax.jit(pe.init)(key, rgb)
measure("patch-embed", lambda c, v: jnp.sum(
    pe.apply(v, rgb + c)[0].astype(jnp.float32)), vpe)
