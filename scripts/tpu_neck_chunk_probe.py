"""Chunked grouped-conv shootout: block-diag dense (current) vs
feature_group_count with WIDE (multi-group) chunks, at all 4 neck qkv2
shapes. The block-diag waste scales with C^2; chunking into K-wide blocks
(K a multiple of the group size) cuts MACs by C/K while keeping each
group MXU-sized.
"""
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
        print(f"{name}: {(ts[n_big]-ts[1])/(n_big-1)*1000:.3f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)


G = 32
for HW, C in ((256, 288), (128, 576), (64, 1152), (32, 2304)):
    x = jax.random.normal(key, (1, HW, HW, C), jnp.bfloat16)
    kern_g = jax.random.normal(key, (3, 3, C // G, C), jnp.bfloat16) * 0.02
    cg = C // G

    # current: dense block-diag
    kr = kern_g.reshape(3, 3, cg, G, cg)
    eye = jnp.eye(G, dtype=kern_g.dtype)
    dense = jnp.einsum("hwixo,gx->hwgixo", kr, eye).reshape(3, 3, C, C)
    gf = HW * HW * C * C * 9 * 2 / 1e9
    measure(f"L{HW} dense blockdiag ({gf:.0f} GF)", lambda c, x=x, dense=dense: jnp.sum(
        jax.lax.conv_general_dilated(
            x + c, dense, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)))

    # chunked fgc: chunk width K = cg * gpc (groups-per-chunk)
    for K in (128, 256, 288, 576):
        if K % cg or C % K or K >= C:
            continue
        fgc = C // K
        gpc = K // cg
        # expand grouped kernel to chunk-block-diagonal: each chunk input
        # K wide -> output K wide, block-diag over its gpc groups
        krc = kern_g.reshape(3, 3, cg, fgc, gpc, cg)
        eyec = jnp.eye(gpc, dtype=kern_g.dtype)
        # kc[h,w,(g_in,i),(f,x,o)] = krc[h,w,i,f,x,o] * [g_in == x]
        kc = jnp.einsum("hwifxo,gx->hwgifxo", krc, eyec)
        kc = kc.reshape(3, 3, K, C)
        gfc = HW * HW * K * C * 9 * 2 / 1e9
        measure(f"L{HW} fgc={fgc} K={K} ({gfc:.0f} GF)", lambda c, x=x, kc=kc, fgc=fgc: jnp.sum(
            jax.lax.conv_general_dilated(
                x + c, kc, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=fgc,
            ).astype(jnp.float32)))
