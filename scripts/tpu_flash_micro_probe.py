"""Flash kernel cost-structure + tile sweep at flagship global-block shapes.

(B=16 heads, N=4096, d=64, H=W=64.) Measures the production kernel at
several (block_q, block_k_rows) inside the VMEM clamp, plus two stripped
variants to locate the time: no-relpos (QK+softmax+AV only) and no-softmax
(QK+bias+AV, no max/exp/normalize) — the deltas attribute bias-build vs
softmax-VPU cost.
"""
import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)

from multimodal_sam_adapter_tpu.ops.flash_attention import (
    flash_attention_rel_pos, _clamp_flash_tiles,
)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, d, H, W = 16, 4096, 64, 64, 64
scale = d ** -0.5
qkvt = jax.random.normal(key, (3, B, N, d), jnp.bfloat16)
rph = jax.random.normal(jax.random.PRNGKey(1), (2 * H - 1, d),
                        jnp.bfloat16) * 0.1
rpw = jax.random.normal(jax.random.PRNGKey(2), (2 * W - 1, d),
                        jnp.bfloat16) * 0.1


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


for (bq, bkr) in ((512, 32), (256, 64), (1024, 16), (256, 32), (512, 16),
                  (2048, 8)):
    cq, cr = _clamp_flash_tiles(N, H, W, bq, bkr)
    name = f"flash bq={bq} rows={bkr} (clamped {cq},{cr})"
    fn = functools.partial(flash_attention_rel_pos, rel_pos_h=rph,
                           rel_pos_w=rpw, q_hw=(H, W), scale=scale,
                           block_q=bq, block_k_rows=bkr)
    measure(name, lambda x, fn=fn: fn(x), qkvt)


# stripped variants to attribute cost (NOT exact attention)
def _stripped_kernel(kw, R, scale, with_bias, with_softmax,
                     q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref,
                     m_scr, l_scr, acc_scr):
    kt = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kt == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if with_bias:
        Tq = q.shape[0]
        Tk = R * kw
        rh = rh_ref[0].astype(jnp.float32)
        rw = rw_ref[0].astype(jnp.float32)
        Kh = rh.shape[-1]
        row0 = kt * R
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (Kh, R), 0)
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (Kh, R), 1)
        sel = (h_ids == row0 + r_ids).astype(jnp.float32)
        rh_sel = jax.lax.dot_general(rh, sel, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        col_r = jax.lax.broadcasted_iota(jnp.int32, (R, Tk), 1) // kw
        row_r = jax.lax.broadcasted_iota(jnp.int32, (R, Tk), 0)
        e_r = (col_r == row_r).astype(jnp.float32)
        bias = jax.lax.dot_general(rh_sel, e_r, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        s = s + bias + pltpu.repeat(rw, R, axis=1)
    if with_softmax:
        m_prev = m_scr[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = m_new
        l_scr[:] = l_new
        acc_scr[:] = acc
    else:
        acc = acc_scr[:] + jax.lax.dot_general(
            s.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[:] = acc
        l_scr[:] = jnp.ones_like(l_scr)
        m_scr[:] = jnp.zeros_like(m_scr)

    @pl.when(kt == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def stripped(qkvt, with_bias, with_softmax, block_q=512, rows=32):
    from multimodal_sam_adapter_tpu.ops.attention import rel_pos_bias_terms
    rel_h, rel_w = rel_pos_bias_terms(qkvt[0], rph, rpw, (H, W), (H, W))
    rel_h = rel_h.reshape(B, N, H)
    rel_w = rel_w.reshape(B, N, W)
    block_k = rows * W
    return pl.pallas_call(
        functools.partial(_stripped_kernel, W, rows, scale, with_bias,
                          with_softmax),
        grid=(B, N // block_q, H // rows),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, qt, kt: (0, b, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda b, qt, kt: (1, b, kt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda b, qt, kt: (2, b, kt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, H), lambda b, qt, kt: (b, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, W), lambda b, qt, kt: (b, qt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qt, kt: (b, qt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, d), qkvt.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(qkvt, qkvt, qkvt, rel_h, rel_w)


measure("stripped full (bias+softmax)",
        lambda x: stripped(x, True, True), qkvt)
measure("stripped no-bias (QK+softmax+AV)",
        lambda x: stripped(x, False, True), qkvt)
measure("stripped no-softmax (QK+bias+AV)",
        lambda x: stripped(x, True, False), qkvt)
measure("stripped dots-only (QK+AV)",
        lambda x: stripped(x, False, False), qkvt)
