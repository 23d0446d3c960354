"""Micro-surgery probe for the lane-blocked window-attention body.

r4 trace: win_lane = 0.287 ms/block in-model, ~2x over its masked-dot MAC
floor (0.14). Candidate savings are all VPU-side:
  (a) fold scale into k (scale = d^-0.5 = 1/8, a power of two -> exact;
      k_scaled computed once per window-group, kills the per-head
      (196,196) f32 multiply)
  (b) normalize by reciprocal-multiply: inv = 1/sum (196 divides) then
      p * inv, instead of p / sum (38k divides)
  (c) WB sweep incl. all-25-windows-per-step
Parity vs dense decomposed-rel-pos reference is checked for every variant.
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

Wn, Hh, N, d, ws = 25, 16, 196, 64, 14
C = Hh * d
scale = d ** -0.5

x = jax.random.normal(key, (Wn, N, C), jnp.bfloat16)
wqkv = (jax.random.normal(jax.random.PRNGKey(1), (C, 3 * C), jnp.bfloat16)
        * 0.02)
rph = jax.random.normal(jax.random.PRNGKey(3), (2 * ws - 1, d),
                        jnp.bfloat16) * 0.1
rpw = jax.random.normal(jax.random.PRNGKey(4), (2 * ws - 1, d),
                        jnp.bfloat16) * 0.1
rh = get_rel_pos(ws, ws, rph).reshape(N, d).astype(jnp.bfloat16)
rw = get_rel_pos(ws, ws, rpw).reshape(N, d).astype(jnp.bfloat16)


def body_variant(G, ws, d, scale, q, k, v, rhp, rwp, *, fold_scale,
                 recip_norm):
    N = ws * ws
    qj = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    jk = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    m_h = qj // ws == jk // ws
    m_w = qj % ws == jk // ws
    e_h = (qj % ws == jk // ws)
    e_w = (qj % ws == jk % ws)
    dt = q.dtype
    e_h = e_h.astype(dt)
    e_w = e_w.astype(dt)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (N, G * d), 1)
    o = jnp.zeros((N, G * d), jnp.float32)
    ks = (k * jnp.asarray(scale, k.dtype)) if fold_scale else k
    for h in range(G):
        mask = (lanes // d == h).astype(dt)
        qh = q * mask
        s = jax.lax.dot_general(
            qh, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if not fold_scale:
            s = s * scale
        gh = jax.lax.dot_general(
            qh, rhp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gw = jax.lax.dot_general(
            qh, rwp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ghm = jnp.where(m_h, gh, 0.0).astype(dt)
        gwm = jnp.where(m_w, gw, 0.0).astype(dt)
        s = s + jax.lax.dot_general(
            ghm, e_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + jax.lax.dot_general(
            gwm, e_w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        if recip_norm:
            inv = 1.0 / jnp.sum(p, axis=1, keepdims=True)
            p = p * inv
        else:
            p = p / jnp.sum(p, axis=1, keepdims=True)
        o = o + jax.lax.dot_general(
            p.astype(dt), v * mask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return o


def make_fwd(G, WB, fold_scale, recip_norm):
    def kern(q_ref, k_ref, v_ref, rhp_ref, rwp_ref, o_ref):
        for wi in range(WB):
            o_ref[wi] = body_variant(
                G, ws, d, scale, q_ref[wi], k_ref[wi], v_ref[wi],
                rhp_ref[...], rwp_ref[...], fold_scale=fold_scale,
                recip_norm=recip_norm).astype(o_ref.dtype)

    ngrp = Hh // G
    blk = (WB, N, G * d)
    rhp = jnp.concatenate([rh] * G, axis=1)
    rwp = jnp.concatenate([rw] * G, axis=1)

    def fwd(x):
        qkv = x @ wqkv
        return pl.pallas_call(
            kern,
            grid=(Wn // WB, ngrp),
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
            out_shape=jax.ShapeDtypeStruct((Wn, N, C), qkv.dtype),
        )(qkv, qkv, qkv, rhp, rwp)
    return fwd


# dense reference
qkv = (x @ wqkv).reshape(Wn, N, 3, Hh, d)
qkvt = qkv.transpose(2, 0, 3, 1, 4).reshape(3, Wn * Hh, N, d)
ref = attention_with_decomposed_rel_pos(
    qkvt[0], qkvt[1], qkvt[2], rph, rpw, (ws, ws), scale)
ref = ref.reshape(Wn, Hh, N, d).transpose(0, 2, 1, 3).reshape(Wn, N, C)
ref = ref.astype(jnp.float32)


def scan_over(fn, n):
    def f(x):
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn(x + c).astype(jnp.float32).sum()
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn, *args, n_big=33):
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


VARIANTS = [
    ("baseline wb=5", dict(G=2, WB=5, fold_scale=False, recip_norm=False)),
    ("fold_scale wb=5", dict(G=2, WB=5, fold_scale=True, recip_norm=False)),
    ("recip wb=5", dict(G=2, WB=5, fold_scale=False, recip_norm=True)),
    ("fold+recip wb=5", dict(G=2, WB=5, fold_scale=True, recip_norm=True)),
    ("fold+recip wb=25", dict(G=2, WB=25, fold_scale=True, recip_norm=True)),
    ("fold+recip wb=1", dict(G=2, WB=1, fold_scale=True, recip_norm=True)),
]
for name, kw in VARIANTS:
    fn = make_fwd(**kw)
    got = fn(x).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"{name}: max err vs dense ref {err:.6f}", flush=True)
    measure(name, fn, x)
