"""Grouped-conv lowering shootout at neck shapes + reworked MSDA kernel."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)


def scan_over(fn_of_c, n):
    def f():
        def body(c, _):
            return c + jnp.bfloat16(1e-3), fn_of_c(c)
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return f


def measure(name, fn_of_c, n_big=17):
    try:
        ts = {}
        for n in (1, n_big):
            fn = jax.jit(scan_over(fn_of_c, n))
            float(fn())
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); float(fn())
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        print(f"{name}: {(ts[n_big]-ts[1])/(n_big-1)*1000:.2f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)


# level-0 neck qkv2 shape: (1, 256, 256, 288) -> 288, 3x3, groups 32
G, C = 32, 288
x = jax.random.normal(key, (1, 256, 256, C), jnp.bfloat16)
kern_g = jax.random.normal(key, (3, 3, C // G, C), jnp.bfloat16)

# dense block-diagonal (current)
kr = kern_g.reshape(3, 3, C // G, G, C // G)
eye = jnp.eye(G, dtype=kern_g.dtype)
dense = jnp.einsum("hwixo,gx->hwgixo", kr, eye).reshape(3, 3, C, C)
measure("dense block-diag 3x3 G32 (98 GFLOP)", lambda c: jnp.sum(
    jax.lax.conv_general_dilated(
        x + c, dense, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)))

# native feature_group_count
measure("native grouped 3x3 G32 (3 GFLOP)", lambda c: jnp.sum(
    jax.lax.conv_general_dilated(
        x + c, kern_g, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=G,
    ).astype(jnp.float32)))

# groups -> batch: (1,H,W,G,c) -> (G,H,W,c), conv with batch_group_count=G
xb = x.reshape(1, 256, 256, G, C // G)


def batch_grouped(c):
    xg = (xb + c).transpose(3, 1, 2, 0, 4).reshape(G, 256, 256, C // G)
    # filters (kh, kw, cin_g, Cout) with batch_group_count=G: the g-th
    # batch slice uses the g-th Cout/G filter block
    out = jax.lax.conv_general_dilated(
        xg, kern_g, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        batch_group_count=G,
    )  # (1, 256, 256, C)
    return jnp.sum(out.astype(jnp.float32))


measure("batch-grouped 3x3 G32 (3 GFLOP)", batch_grouped)

# 1x1 grouped (qkv1 shape): 96 -> 288 G32
kern1 = jax.random.normal(key, (1, 1, 3, 288), jnp.bfloat16)
x1 = jax.random.normal(key, (1, 256, 256, 96), jnp.bfloat16)
kr1 = kern1.reshape(1, 1, 3, G, 9)
dense1 = jnp.einsum("hwixo,gx->hwgixo", kr1, eye).reshape(1, 1, 96, 288)
measure("dense block-diag 1x1 G32", lambda c: jnp.sum(
    jax.lax.conv_general_dilated(
        x1 + c, dense1, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)))
measure("native grouped 1x1 G32", lambda c: jnp.sum(
    jax.lax.conv_general_dilated(
        x1 + c, kern1, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=G,
    ).astype(jnp.float32)))

# reworked fused MSDA onehot kernel (select-form, TQ 1024)
from multimodal_sam_adapter_tpu.ops.msda_pallas import ms_deform_attn_pallas_fwd
D, M = 32, 16
val_e = jax.random.normal(key, (1, 4096, M, D), jnp.bfloat16)
loc_e = jax.random.uniform(key, (1, 21504, M, 1, 4, 2), jnp.bfloat16)
att_e = jax.nn.softmax(jax.random.normal(key, (1, 21504, M, 1, 4)), -1).astype(jnp.bfloat16)
measure("pallas-onehot-v2 extractor", lambda c: jnp.sum(
    ms_deform_attn_pallas_fwd(val_e + c, ((64, 64),), loc_e, att_e,
                              variant="onehot").astype(jnp.float32)), n_big=9)
