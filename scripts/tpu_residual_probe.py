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


# --- SegformerHead on flagship pyramid shapes
from multimodal_sam_adapter_tpu.models.segformer_head import SegformerHead

f1 = jax.random.normal(key, (1, 256, 256, 1024), jnp.bfloat16)
f2 = jax.random.normal(key, (1, 128, 128, 1024), jnp.bfloat16)
f3 = jax.random.normal(key, (1, 64, 64, 1024), jnp.bfloat16)
f4 = jax.random.normal(key, (1, 32, 32, 1024), jnp.bfloat16)
head = SegformerHead(num_classes=25, channels=512, dtype=jnp.bfloat16)
vh = jax.jit(lambda k: head.init(k, [f1, f2, f3, f4], train=False))(key)
measure("segformer-head", lambda c, v: jnp.sum(
    head.apply(v, [f1 + c, f2, f3, f4], train=False).astype(jnp.float32)), vh)

# --- logits upsample 256^2 -> 1024^2 (whole-mode resize)
from multimodal_sam_adapter_tpu.utils.interpolate import resize_bilinear

lg = jax.random.normal(key, (1, 256, 256, 25), jnp.bfloat16)
measure("logits-resize-4x", lambda c: jnp.sum(
    resize_bilinear(lg + c, (1024, 1024)).astype(jnp.float32)))

# --- ViT feature upsample x1: (64,64,1024) -> (256,256,1024)
xv = jax.random.normal(key, (1, 64, 64, 1024), jnp.bfloat16)
measure("vitfeat-resize-16x", lambda c: jnp.sum(
    resize_bilinear(xv + c, (256, 256)).astype(jnp.float32)))

# --- global block sub-pieces (B=1, 4096 tokens, 1024 dim, 16 heads)
from flax import linen as nn

x_tok = jax.random.normal(key, (1, 4096, 1024), jnp.bfloat16)
dense_qkv = nn.Dense(3072, dtype=jnp.bfloat16)
vq = jax.jit(dense_qkv.init)(key, x_tok)
measure("qkv-dense", lambda c, v: jnp.sum(
    dense_qkv.apply(v, x_tok + c).astype(jnp.float32)), vq)

mlp = nn.Sequential([nn.Dense(4096, dtype=jnp.bfloat16), nn.gelu,
                     nn.Dense(1024, dtype=jnp.bfloat16)])
vm = jax.jit(mlp.init)(key, x_tok)
measure("vit-mlp", lambda c, v: jnp.sum(
    mlp.apply(v, x_tok + c).astype(jnp.float32)), vm)

from multimodal_sam_adapter_tpu.ops.flash_attention import (
    flash_attention_rel_pos_diff,
)

rp = jax.random.normal(key, (127, 64), jnp.bfloat16)


def qkv_flash(c, v):
    qkv = dense_qkv.apply(v, x_tok + c)
    qkv = qkv.reshape(1, 4096, 3, 16, 64).transpose(2, 0, 3, 1, 4)
    qkv = qkv.reshape(3, 16, 4096, 64)
    o = flash_attention_rel_pos_diff(qkv[0], qkv[1], qkv[2], rp, rp,
                                     (64, 64), 0.125)
    o = o.reshape(1, 16, 64, 64, 64).transpose(0, 2, 3, 1, 4)
    return jnp.sum(o.astype(jnp.float32))


measure("qkv+transpose+flash+detranspose", qkv_flash, vq)

