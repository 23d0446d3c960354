"""Probe: XLA emitter choice + speed for Dense dots over 4-D NHWC vs
flattened token layouts, in a ViT-block-like fused context.

Motivation (r4 trace): 296 fusions in the flagship forward lower through
the `EmitAllBatchInSublanes` CONVOLUTION emitter — 28.1 ms/iter, 30% of the
forward — including every ViT qkv/proj/mlp.lin2 dot (0.37 ms each where the
dot floor is ~0.10) and the ConvNeXt pwconv1/2 dots. Hypothesis: the 4-D
(1, H, W, C) operand/consumer shapes push XLA's TPU backend into the
conv-style emitter; flattening to (N, C) or (B, N, C) around the Dense
calls should recover the classic matmul emitter.

Each variant runs LN -> dense1 -> gelu -> dense2 -> residual x NBLK in a
scan, mimicking the ViT MLP chain (LN-stat fusions attach to the dot like
the real model). Times are (scan(9)-scan(1))/8, min of 5.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

key = jax.random.PRNGKey(0)
C, HID = 1024, 4096
H = W = 64
N = H * W
NBLK = 3
DT = jnp.bfloat16


def ln(x, eps=1e-6):
    m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                 keepdims=True) - m * m
    return ((x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + eps)).astype(
        x.dtype)


ln_impl = ln


def block(x, w1, w2):
    y = ln_impl(x)
    h = jax.nn.gelu(y @ w1, approximate=True)
    return x + h @ w2


def make(shape_fn, unshape_fn):
    def fwd(x, w1, w2):
        def body(c, _):
            t = shape_fn(c)
            for _ in range(NBLK):
                t = block(t, w1, w2)
            return unshape_fn(t), jnp.float32(0)

        c, _ = jax.lax.scan(body, x, None, length=9)
        return jnp.sum(c.astype(jnp.float32))

    return jax.jit(fwd), jax.jit(
        lambda x, w1, w2: jnp.sum(
            unshape_fn(block(shape_fn(x), w1, w2)).astype(jnp.float32)))


def timeit(f, *args):
    # float() forces a device->host transfer: block_until_ready is
    # unreliable through the axon tunnel (async dispatch)
    float(f(*args))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


w1 = jax.random.normal(key, (C, HID), DT) * 0.02
w2 = jax.random.normal(key, (HID, C), DT) * 0.02
x4 = jax.random.normal(key, (1, H, W, C), DT)

# second axis: LN implementation — plain lane-minor reduce vs the
# package's _matmul_moments (ones-dot MXU stats). The model's lin2 fusion
# carries the NEXT block's matmul-moment stats as extra outputs; probe
# whether that is what doubles the in-context lin2 cost.
from multimodal_sam_adapter_tpu.nn.layers import _matmul_moments


def ln_mm(x, eps=1e-6):
    m, m2 = _matmul_moments(x)
    m = m[..., None]
    v = m2[..., None] - m * m
    return ((x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + eps)).astype(
        x.dtype)


VARIANTS = {
    "4d_plainln": (lambda c: c, lambda t: t, x4),
    "4d_mmln": (lambda c: c, lambda t: t, x4),
    "3d_mmln": (lambda c: c.reshape(1, N, C), lambda t: t.reshape(1, H, W, C), x4),
}

for name, (sf, uf, x) in VARIANTS.items():
    globals()["ln_impl"] = ln if "plain" in name else ln_mm
    fscan, _ = make(sf, uf)

    def f9(x=x, f=fscan):
        return f(x, w1, w2)

    # scan(1) baseline via length replacement: rebuild with length 1
    def fwd1(x, w1, w2, sf=sf, uf=uf):
        def body(c, _):
            t = sf(c)
            for _ in range(NBLK):
                t = block(t, w1, w2)
            return uf(t), jnp.float32(0)

        c, _ = jax.lax.scan(body, x, None, length=1)
        return jnp.sum(c.astype(jnp.float32))

    f1 = jax.jit(fwd1)
    t9 = timeit(fscan, x, w1, w2)
    t1 = timeit(f1, x, w1, w2)
    per = (t9 - t1) / 8 / NBLK * 1e3
    print(f"{name:12s}: {per:.4f} ms/block-MLP  (scan9 {t9*1e3:.2f} ms, "
          f"scan1 {t1*1e3:.2f} ms)", flush=True)
