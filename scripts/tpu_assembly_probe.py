"""Probe: pyramid-assembly / head / resize costs at flagship shapes.

Suspicion: resize_bilinear (gather-based taps) is slow under the 2026-08
libtpu gather regression; a dense separable-matmul resize should be both
gather-free and MXU-friendly. Measures current vs matmul formulation for
every resize the flagship forward performs, plus the head and assembly.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

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
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); float(fn(*args))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        per = (ts[n_big] - ts[n_small]) / (n_big - n_small)
        print(f"{name}: {per*1000:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)


from multimodal_sam_adapter_tpu.utils.interpolate import (
    resize_bilinear, _axis_weights_linear,
)


def dense_axis_matrix(in_size, out_size):
    idx, w = _axis_weights_linear(in_size, out_size)
    idx = np.asarray(idx); w = np.asarray(w)
    A = np.zeros((out_size, in_size), np.float32)
    for o in range(out_size):
        for t in range(idx.shape[1]):
            A[o, idx[o, t]] += w[o, t]
    return jnp.asarray(A)


def resize_matmul(x, hw):
    B, H, W, C = x.shape
    oh, ow = hw
    dt = x.dtype
    out = x
    if oh != H:
        A = dense_axis_matrix(H, oh).astype(jnp.float32)
        out = jnp.einsum("oh,bhwc->bowc", A, out.astype(jnp.float32))
    if ow != W:
        A = dense_axis_matrix(W, ow).astype(jnp.float32)
        out = jnp.einsum("ow,bhwc->bhoc", A, out.astype(jnp.float32))
    return out.astype(dt)


shapes = [
    # (name, in_shape, out_hw) — every resize in the flagship forward
    ("logits 256->1024 c25", (1, 256, 256, 25), (1024, 1024)),
    ("head l1 128->256 c512", (1, 128, 128, 512), (256, 256)),
    ("head l2 64->256 c512", (1, 64, 64, 512), (256, 256)),
    ("head l3 32->256 c512", (1, 32, 32, 512), (256, 256)),
    ("vitfeat 64->256 c1024", (1, 64, 64, 1024), (256, 256)),
    ("vitfeat 64->128 c1024", (1, 64, 64, 1024), (128, 128)),
    ("vitfeat 64->32 c1024", (1, 64, 64, 1024), (32, 32)),
]
for name, ishape, ohw in shapes:
    x = jax.random.normal(key, ishape, jnp.bfloat16)
    measure(f"resize-gather {name}", lambda c, x=x, o=ohw: jnp.sum(
        resize_bilinear(x + c, o).astype(jnp.float32)))
    measure(f"resize-matmul {name}", lambda c, x=x, o=ohw: jnp.sum(
        resize_matmul(x + c, o).astype(jnp.float32)))

# numerics check (CPU-comparable on-device)
x = jax.random.normal(key, (1, 64, 64, 32), jnp.float32)
a = resize_bilinear(x, (256, 256))
b = resize_matmul(x, (256, 256))
print("matmul-vs-gather max err:",
      float(jnp.max(jnp.abs(a - b))), flush=True)

# --- segformer head total + alternatives
from multimodal_sam_adapter_tpu.models.segformer_head import SegformerHead

head = SegformerHead(num_classes=25, channels=512, dtype=jnp.bfloat16)
feats = [
    jax.random.normal(key, (1, 256, 256, 1024), jnp.bfloat16),
    jax.random.normal(key, (1, 128, 128, 1024), jnp.bfloat16),
    jax.random.normal(key, (1, 64, 64, 1024), jnp.bfloat16),
    jax.random.normal(key, (1, 32, 32, 1024), jnp.bfloat16),
]
vh = jax.jit(lambda k, f: head.init(k, f, train=False))(key, feats)
measure("segformer-head", lambda c, v: jnp.sum(
    head.apply(v, [f + c for f in feats], train=False).astype(jnp.float32)),
    vh)

# --- 4 final BatchNorms (eval) at pyramid shapes
from multimodal_sam_adapter_tpu.nn.layers import BatchNorm

bn = BatchNorm(dtype=jnp.bfloat16)
vb = bn.init(key, feats[0], train=False)
measure("bn-256^2x1024", lambda c, v: jnp.sum(
    bn.apply(v, feats[0] + c, train=False).astype(jnp.float32)), vb)

# --- ConvTranspose up (c2 -> c1)
import flax.linen as nn

up = nn.ConvTranspose(1024, (2, 2), strides=(2, 2), dtype=jnp.bfloat16)
vu = jax.jit(up.init)(key, feats[1])
measure("convtranspose-up", lambda c, v: jnp.sum(
    up.apply(v, feats[1] + c).astype(jnp.float32)), vu)

# --- patch embed + pos
from multimodal_sam_adapter_tpu.models.sam_vit import PatchEmbed

pe = PatchEmbed(embed_dim=1024, dtype=jnp.bfloat16)
img3 = jax.random.normal(key, (1, 1024, 1024, 3), jnp.bfloat16)
vp = jax.jit(pe.init)(key, img3)
measure("patch-embed", lambda c, v: jnp.sum(
    pe.apply(v, img3 + c)[0].astype(jnp.float32)), vp)
