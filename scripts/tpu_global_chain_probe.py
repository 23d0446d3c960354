"""Probe: do Pallas custom calls serialize the NEXT op's weight prefetch?

The r3 unscanned trace charged 1.6-1.9 ms idle gaps to ViT MLP/proj
weight-slice prefetches AT THE GLOBAL-ATTENTION BLOCKS. Hypothesis: XLA
cannot overlap the MLP weight DMA with an in-flight Pallas call, so each
global block pays the full weight-stream latency synchronously.

Measures, scan-amortized at flagship global-block shape (4096 tokens,
C=1024, 16 heads):
  (a) flash attention alone
  (b) MLP alone (fc1+gelu+fc2)
  (c) chained flash -> MLP    (expect ~= a+b if overlap works)
  (d) chained dense-chunked XLA attention -> MLP (no custom call)
If (c) >> (a)+(b) while (d) ~= its parts, the custom-call boundary is the
stall and the fix is overlap-friendly structure, not faster kernels.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)

from multimodal_sam_adapter_tpu.ops.flash_attention import (
    flash_attention_rel_pos_diff,
)

B, N, C, Hh, d = 1, 4096, 1024, 16, 64
HW = (64, 64)
scale = d ** -0.5
x = jax.random.normal(key, (B, N, C), jnp.bfloat16)
wqkv = jax.random.normal(jax.random.PRNGKey(1), (C, 3 * C),
                         jnp.bfloat16) * 0.02
w1 = jax.random.normal(jax.random.PRNGKey(2), (C, 4 * C),
                       jnp.bfloat16) * 0.02
w2 = jax.random.normal(jax.random.PRNGKey(3), (4 * C, C),
                       jnp.bfloat16) * 0.02
rph = jax.random.normal(jax.random.PRNGKey(4), (127, d), jnp.bfloat16) * 0.1
rpw = jax.random.normal(jax.random.PRNGKey(5), (127, d), jnp.bfloat16) * 0.1


def attn_flash(x):
    qkv = (x @ wqkv).reshape(B, N, 3, Hh, d)
    qkvt = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * Hh, N, d)
    o = flash_attention_rel_pos_diff(qkvt, rph, rpw, HW, scale)
    return o.reshape(B, Hh, N, d).transpose(0, 2, 1, 3).reshape(B, N, C)


def mlp(x):
    return jax.nn.gelu(x @ w1, approximate=False) @ w2


def attn_chunked(x):
    # XLA-only attention, q chunked so scores never exceed ~128 MB
    qkv = (x @ wqkv).reshape(B, N, 3, Hh, d)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3).reshape(B * Hh, N, d)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3).reshape(B * Hh, N, d)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3).reshape(B * Hh, N, d)

    def chunk(qc):
        s = jax.lax.dot_general(qc * scale, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    qs = q.reshape(B * Hh, 8, N // 8, d)
    o = jax.lax.map(lambda i: chunk(qs[:, i]), jnp.arange(8))
    o = o.transpose(1, 0, 2, 3).reshape(B * Hh, N, d)
    return (o.reshape(B, Hh, N, d).transpose(0, 2, 1, 3)
            .reshape(B, N, C).astype(x.dtype))


def scan_over(fn, n):
    def f(x):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn(x + c).astype(jnp.float32).sum()
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn, *args, n_big=9):
    try:
        ts = {}
        for n in (1, n_big):
            f = jax.jit(scan_over(fn, n))
            float(f(*args))
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter(); float(f(*args))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        per = (ts[n_big] - ts[1]) / (n_big - 1)
        print(f"{name}: {per*1000:.3f} ms/iter", flush=True)
        return per
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)
        return None


a = measure("flash attn alone", attn_flash, x)
b = measure("mlp alone", mlp, x)
c = measure("flash -> mlp chained", lambda x: mlp(attn_flash(x)), x)
d = measure("chunked-XLA attn -> mlp chained",
             lambda x: mlp(attn_chunked(x)), x)
e = measure("chunked-XLA attn alone", attn_chunked, x)
if a and b and c:
    print(f"flash chain overhead vs parts: {(c - a - b)*1000:+.3f} ms",
          flush=True)
if d and e and b:
    print(f"xla chain overhead vs parts: {(d - e - b)*1000:+.3f} ms",
          flush=True)
