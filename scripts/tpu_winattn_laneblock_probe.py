"""Probe: lane-blocked window attention that consumes the qkv Dense output
(Wn, N, 3072) DIRECTLY — no XLA-side head-split transposes.

The qkv feature axis is s-major (f = s*1024 + h*64 + d), so q/k/v for a
2-head group are 128-lane-ALIGNED slices reachable by BlockSpec index maps
alone. Per-head dots become masked wide dots (mask on the q side only):

    s_h   = (q_blk * mask_h) @ k_blk^T          (contract 128 = q_h . k_h)
    gh_h  = (q_blk * mask_h) @ RhP^T            (RhP = [Rh | Rh] lane-tiled)
    o_blk = sum_h P_h @ (v_blk * mask_h)        (both heads land packed)

Trades 2x nominal QK/AV MACs for ZERO marshalling: the current path pays
~0.37 ms/block for (25,196,3072)->(3,400,196,64) plus the kernel; here the
relayout disappears. Compares f32-exactness vs the dense decomposed-rel-pos
reference and times path A (transpose + packed kernel) vs path B
(lane-blocked) end-to-end from the same qkv Dense output.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)

from multimodal_sam_adapter_tpu.ops.attention import (
    attention_with_decomposed_rel_pos, get_rel_pos,
)
from multimodal_sam_adapter_tpu.ops.window_attention import (
    window_attention_packed,
)

Wn, Hh, N, d, ws = 25, 16, 196, 64, 14
C = Hh * d
scale = d ** -0.5


from multimodal_sam_adapter_tpu.ops.window_attention import (
    window_attention_laneblock_fwd,
)


def window_attention_laneblock(qkv_dense, rh, rw, ws, scale, num_heads,
                               group=2, interpret=False):
    return window_attention_laneblock_fwd(qkv_dense, rh, rw, ws, scale,
                                          num_heads, group=group,
                                          interpret=interpret)


# ---- data: one windowed-block worth of tokens + a real qkv projection
x = jax.random.normal(key, (Wn, N, C), jnp.bfloat16)
wqkv = (jax.random.normal(jax.random.PRNGKey(1), (C, 3 * C), jnp.bfloat16)
        * 0.02)
rph = jax.random.normal(jax.random.PRNGKey(3), (2 * ws - 1, d),
                        jnp.bfloat16) * 0.1
rpw = jax.random.normal(jax.random.PRNGKey(4), (2 * ws - 1, d),
                        jnp.bfloat16) * 0.1
rh = get_rel_pos(ws, ws, rph).reshape(N, d).astype(jnp.bfloat16)
rw = get_rel_pos(ws, ws, rpw).reshape(N, d).astype(jnp.bfloat16)


def path_a(x):
    qkv = x @ wqkv
    qkv = qkv.reshape(Wn, N, 3, Hh, d)
    qkvt = qkv.transpose(2, 0, 3, 1, 4).reshape(3, Wn * Hh, N, d)
    return window_attention_packed(qkvt, rph, rpw, ws, scale, num_heads=Hh)


def make_path_b(group):
    def path_b(x):
        qkv = x @ wqkv
        return window_attention_laneblock(qkv, rh, rw, ws, scale,
                                          num_heads=Hh, group=group)
    return path_b


# parity vs dense reference
qkv = (x @ wqkv).reshape(Wn, N, 3, Hh, d)
qkvt = qkv.transpose(2, 0, 3, 1, 4).reshape(3, Wn * Hh, N, d)
ref = attention_with_decomposed_rel_pos(
    qkvt[0], qkvt[1], qkvt[2], rph, rpw, (ws, ws), scale)
ref = ref.reshape(Wn, Hh, N, d).transpose(0, 2, 1, 3).reshape(Wn, N, C)
ref = ref.astype(jnp.float32)
for g in (2, 4, 8):
    got = make_path_b(g)(x).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"laneblock g={g} max err vs dense ref: {err:.5f}", flush=True)
gota = path_a(x).astype(jnp.float32)
print(f"path A      max err vs dense ref: "
      f"{float(jnp.max(jnp.abs(gota - ref))):.5f}", flush=True)


def scan_over(fn, n):
    def f(x):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn(x + c).astype(jnp.float32).sum()
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn, *args, n_big=17):
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


measure("path A (transpose + packed kernel)", path_a, x)
for g in (2, 4, 8):
    measure(f"path B (laneblock g={g})", make_path_b(g), x)


# ---- variant: multiple windows per grid step (fewer, fatter steps)
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from multimodal_sam_adapter_tpu.ops.window_attention import (
    _laneblock_body,
)


def _mw_kernel(WB, G, ws, d, scale, q_ref, k_ref, v_ref, rhp, rwp, o_ref):
    for wi in range(WB):
        o_ref[wi] = _laneblock_body(
            G, ws, d, scale, q_ref[wi], k_ref[wi], v_ref[wi],
            rhp[...], rwp[...]).astype(o_ref.dtype)


def laneblock_mw(qkv_dense, rh, rw, ws, scale, num_heads, group=2, wb=5):
    Wn, N, F = qkv_dense.shape
    d = F // (3 * num_heads)
    G = group
    rhp = jnp.concatenate([rh] * G, axis=1)
    rwp = jnp.concatenate([rw] * G, axis=1)
    ngrp = num_heads // G
    blk = (wb, N, G * d)
    return pl.pallas_call(
        functools.partial(_mw_kernel, wb, G, ws, d, scale),
        grid=(Wn // wb, ngrp),
        in_specs=[
            pl.BlockSpec(blk, lambda w, g: (w, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda w, g: (w, 0, ngrp + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda w, g: (w, 0, 2 * ngrp + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, G * d), lambda w, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, G * d), lambda w, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(blk, lambda w, g: (w, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wn, N, num_heads * d),
                                       qkv_dense.dtype),
    )(qkv_dense, qkv_dense, qkv_dense, rhp, rwp)


for wb in (5, 25):
    for g in (2, 4):
        def pb(x, wb=wb, g=g):
            qkv = x @ wqkv
            return laneblock_mw(qkv, rh, rw, ws, scale, num_heads=Hh,
                                group=g, wb=wb)
        got = pb(x).astype(jnp.float32)
        print(f"mw wb={wb} g={g} err {float(jnp.max(jnp.abs(got-ref))):.5f}",
              flush=True)
        measure(f"path B-mw (wb={wb} g={g})", pb, x)
