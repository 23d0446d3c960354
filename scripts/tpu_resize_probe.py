"""Probe: matmul-form separable resize — moveaxis+reshape+dot (current
_resize_axis) vs a direct einsum that leaves the contraction-axis handling
to XLA.

r5 trace: decode_head/fusion_conv/jit(_resize_hw) costs 1.04 ms/iter, of
which ~0.68 is reshape/convert copies around the H-axis moveaxis; the
backbone's x1/x2/x4 ViT-feature resizes add more. If XLA lowers the
einsum contraction on a middle axis without materializing the transpose,
the copies disappear for free.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multimodal_sam_adapter_tpu.utils.interpolate import (
    _axis_matrix, _axis_weights_linear, resize_bilinear,
)


def resize_einsum(x, out_h, out_w):
    B, H, W, C = x.shape
    if H != out_h:
        idx, w = _axis_weights_linear(H, out_h)
        mh = jnp.asarray(_axis_matrix(idx, w, H), x.dtype)
        x = jnp.einsum("bhwc,ph->bpwc", x, mh,
                       preferred_element_type=jnp.float32).astype(x.dtype)
    if W != out_w:
        idx, w = _axis_weights_linear(W, out_w)
        mw = jnp.asarray(_axis_matrix(idx, w, W), x.dtype)
        x = jnp.einsum("bhwc,qw->bhqc", x, mw,
                       preferred_element_type=jnp.float32).astype(x.dtype)
    return x


def scan_over(fn, n):
    def f(x):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn(x + c).astype(jnp.float32).sum()
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn, x, n_big=65):
    ts = {}
    for n in (1, n_big):
        f = jax.jit(scan_over(fn, n))
        float(f(x))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter(); float(f(x))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    per = (ts[n_big] - ts[1]) / (n_big - 1)
    print(f"  {name}: {per*1000:.3f} ms/iter", flush=True)


SHAPES = [  # (in_shape, out_hw) — decode head levels + backbone ViT feats
    ((1, 128, 128, 512), (256, 256)),
    ((1, 64, 64, 512), (256, 256)),
    ((1, 32, 32, 512), (256, 256)),
    ((1, 64, 64, 1024), (256, 256)),
    ((1, 64, 64, 1024), (32, 32)),
]
for shape, out in SHAPES:
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    a = resize_bilinear(x, out)
    b = resize_einsum(x, *out)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                b.astype(jnp.float32))))
    print(f"{shape} -> {out}: max|a-b| = {err:.6f}", flush=True)
    measure("moveaxis+dot", lambda t, o=out: resize_bilinear(t, o), x)
    measure("einsum      ", lambda t, o=out: resize_einsum(t, *o), x)
