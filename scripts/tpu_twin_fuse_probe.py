"""Probe: run both TwinConvNeXt branches as ONE channel-concat stream.

Stage-1/2 blocks (96/192 ch at 256^2/128^2) run lane-starved: the trace
shows 0.38 ms fc1 fusions at 6.5% MFU plus per-branch copies. Fused
formulation: concat the two branches channel-wise; depthwise conv concats
trivially; LN becomes a TWO-COLUMN moment matmul (per-branch ones
vectors) + per-half broadcast; fc1/fc2 become block-diagonal dense
(2x nominal MACs, full lanes, half the op count).

Measures a full stage-1 (3 blocks) and stage-2 (3 blocks) sequential vs
fused at flagship geometry, bf16.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)


def make_params(C, depth, seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), depth * 8)
    ps = []
    H = 4 * C
    for i in range(depth):
        k = ks[i * 8:(i + 1) * 8]
        ps.append(dict(
            dw=jax.random.normal(k[0], (7, 7, 1, C), jnp.bfloat16) * 0.1,
            dwb=jax.random.normal(k[1], (C,), jnp.bfloat16) * 0.1,
            g=1 + jax.random.normal(k[2], (C,), jnp.bfloat16) * 0.1,
            b=jax.random.normal(k[3], (C,), jnp.bfloat16) * 0.1,
            w1=jax.random.normal(k[4], (C, H), jnp.bfloat16) * 0.05,
            b1=jax.random.normal(k[5], (H,), jnp.bfloat16) * 0.1,
            w2=jax.random.normal(k[6], (H, C), jnp.bfloat16) * 0.05,
            b2=jax.random.normal(k[7], (C,), jnp.bfloat16) * 0.1,
            gamma=jnp.full((C,), 0.5, jnp.bfloat16),
        ))
    return ps


def moments_cols(x, w):
    """x: (..., C); w: (C, K) per-group 1/n columns -> (m, m2) (..., K)."""
    xf = x.astype(jnp.float32)
    m = jax.lax.dot_general(xf, w, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m2 = jax.lax.dot_general(xf * xf, w, (((x.ndim - 1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return m, m2


def block_seq(x, p):
    C = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, p["dw"], (1, 1), [(3, 3), (3, 3)], feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["dwb"]
    w = jnp.full((C, 1), 1.0 / C, jnp.float32)
    m, m2 = moments_cols(y, w)
    var = jnp.maximum(m2 - m * m, 0.0)
    inv = jax.lax.rsqrt(var + 1e-6)
    yn = ((y.astype(jnp.float32) - m) * inv * p["g"].astype(jnp.float32)
          + p["b"].astype(jnp.float32)).astype(x.dtype)
    h = jax.nn.gelu(yn @ p["w1"] + p["b1"], approximate=True)
    o = h @ p["w2"] + p["b2"]
    return x + o * p["gamma"]


def stage_seq(x2, ps_x, ps_y):
    x, y = x2
    for px, py in zip(ps_x, ps_y):
        x = block_seq(x, px)
        y = block_seq(y, py)
    return x, y


def fuse_params(ps_x, ps_y):
    out = []
    for px, py in zip(ps_x, ps_y):
        C = px["dw"].shape[-1]
        H = px["w1"].shape[-1]
        w1 = jnp.zeros((2 * C, 2 * H), jnp.bfloat16)
        w1 = w1.at[:C, :H].set(px["w1"]).at[C:, H:].set(py["w1"])
        w2 = jnp.zeros((2 * H, 2 * C), jnp.bfloat16)
        w2 = w2.at[:H, :C].set(px["w2"]).at[H:, C:].set(py["w2"])
        wm = np.zeros((2 * C, 2), np.float32)
        wm[:C, 0] = 1.0 / C
        wm[C:, 1] = 1.0 / C
        out.append(dict(
            dw=jnp.concatenate([px["dw"], py["dw"]], axis=-1),
            dwb=jnp.concatenate([px["dwb"], py["dwb"]]),
            g=jnp.concatenate([px["g"], py["g"]]),
            b=jnp.concatenate([px["b"], py["b"]]),
            w1=w1, b1=jnp.concatenate([px["b1"], py["b1"]]),
            w2=w2, b2=jnp.concatenate([px["b2"], py["b2"]]),
            gamma=jnp.concatenate([px["gamma"], py["gamma"]]),
            wm=jnp.asarray(wm),
        ))
    return out


def block_fused(x, p):
    C2 = x.shape[-1]
    C = C2 // 2
    y = jax.lax.conv_general_dilated(
        x, p["dw"], (1, 1), [(3, 3), (3, 3)], feature_group_count=C2,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["dwb"]
    m, m2 = moments_cols(y, p["wm"])                     # (..., 2)
    var = jnp.maximum(m2 - m * m, 0.0)
    inv = jax.lax.rsqrt(var + 1e-6)
    # broadcast each branch's scalar over its channel half
    half = (jnp.arange(C2) >= C).astype(jnp.float32)
    mh = m[..., 0:1] * (1 - half) + m[..., 1:2] * half
    ih = inv[..., 0:1] * (1 - half) + inv[..., 1:2] * half
    yn = ((y.astype(jnp.float32) - mh) * ih * p["g"].astype(jnp.float32)
          + p["b"].astype(jnp.float32)).astype(x.dtype)
    h = jax.nn.gelu(yn @ p["w1"] + p["b1"], approximate=True)
    o = h @ p["w2"] + p["b2"]
    return x + o * p["gamma"]


def stage_fused(xy, ps):
    for p in ps:
        xy = block_fused(xy, p)
    return xy


def run(S, C, depth, label):
    x = jax.random.normal(jax.random.PRNGKey(10), (1, S, S, C),
                          jnp.bfloat16)
    y = jax.random.normal(jax.random.PRNGKey(11), (1, S, S, C),
                          jnp.bfloat16)
    ps_x = make_params(C, depth, 1)
    ps_y = make_params(C, depth, 2)
    pf = fuse_params(ps_x, ps_y)
    ox, oy = stage_seq((x, y), ps_x, ps_y)
    of = stage_fused(jnp.concatenate([x, y], -1), pf)
    err = max(float(jnp.max(jnp.abs(of[..., :C].astype(jnp.float32)
                                    - ox.astype(jnp.float32)))),
              float(jnp.max(jnp.abs(of[..., C:].astype(jnp.float32)
                                    - oy.astype(jnp.float32)))))
    print(f"{label}: fused vs seq max err {err:.5f}", flush=True)

    def scan_over(fn, n, *args):
        def f(*a):
            def body(c, _):
                o = fn(*[q + c if isinstance(q, jnp.ndarray) and q.dtype == jnp.bfloat16 and q.ndim == 4 else q for q in a])
                if isinstance(o, tuple):
                    r = sum(q.astype(jnp.float32).sum() for q in o)
                else:
                    r = o.astype(jnp.float32).sum()
                return c + jnp.bfloat16(1e-3), r
            _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
            return s.sum()
        return f

    for name, fn, args in (
        ("seq", lambda x, y: stage_seq((x, y), ps_x, ps_y), (x, y)),
        ("fused", lambda xy: stage_fused(xy, pf),
         (jnp.concatenate([x, y], -1),)),
    ):
        ts = {}
        for n in (1, 9):
            f = jax.jit(scan_over(fn, n, *args))
            float(f(*args))
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter(); float(f(*args))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        per = (ts[9] - ts[1]) / 8
        print(f"  {label} {name}: {per*1000:.3f} ms/stage", flush=True)


run(256, 96, 3, "stage1 (256^2, 96ch, 3 blocks)")
run(128, 192, 3, "stage2 (128^2, 192ch, 3 blocks)")
run(64, 384, 27, "stage3 (64^2, 384ch, 27 blocks)")
run(32, 768, 3, "stage4 (32^2, 768ch, 3 blocks)")
