"""Bisect the full-forward TPU worker crash: flash kernel standalone,
forward with dense attention, forward with flash, msda standalone."""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
key = jax.random.PRNGKey(0)

which = sys.argv[1] if len(sys.argv) > 1 else "all"


def run(name, fn):
    t0 = time.perf_counter()
    try:
        r = float(fn())
        print(f"{name}: OK ({r:.3f}) {time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:300]}", flush=True)
        raise SystemExit(1)


if which in ("flash", "all"):
    from multimodal_sam_adapter_tpu.ops.flash_attention import (
        flash_attention_rel_pos_diff,
    )

    BH, N, Dh = 16, 4096, 64
    q = jax.random.normal(key, (BH, N, Dh), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (BH, N, Dh), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (BH, N, Dh), jnp.bfloat16)
    rh = jax.random.normal(jax.random.PRNGKey(3), (127, Dh), jnp.float32)
    rw = jax.random.normal(jax.random.PRNGKey(4), (127, Dh), jnp.float32)

    run("flash-64x64", jax.jit(lambda: jnp.sum(
        flash_attention_rel_pos_diff(q, k, v, rh, rw, (64, 64), Dh**-0.5)
        .astype(jnp.float32))))

if which in ("fwd-dense", "fwd-flash", "fwd-auto", "all"):
    import os

    from __graft_entry__ import _flagship_model

    impl = which.split("-", 1)[1] if which.startswith("fwd") else "auto"
    if impl != "auto":
        os.environ["MSA_ATTN_IMPL"] = impl
    model = _flagship_model(dtype=jnp.bfloat16)
    img = jax.random.normal(key, (1, 1024, 1024, 6), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), img, train=False
    )
    run(f"forward-{impl}", lambda: jnp.sum(jax.jit(
        lambda v, im: model.apply(v, im, train=False)
    )(variables, img).astype(jnp.float32)))

if which in ("msda", "all"):
    from multimodal_sam_adapter_tpu.ops.msda import ms_deform_attn

    D, M = 32, 16
    val_e = jax.random.normal(key, (1, 4096, M, D), jnp.bfloat16)
    loc_e = jax.random.uniform(key, (1, 21504, M, 1, 4, 2), jnp.bfloat16)
    att_e = jax.nn.softmax(
        jax.random.normal(key, (1, 21504, M, 1, 4)), -1
    ).astype(jnp.bfloat16)
    run("msda-extractor", jax.jit(lambda: jnp.sum(
        ms_deform_attn(val_e, ((64, 64),), loc_e, att_e).astype(jnp.float32))))

if which in ("fwd-scan", "fwd-unroll"):
    from __graft_entry__ import _flagship_model

    model = _flagship_model(dtype=jnp.bfloat16)
    img = jax.random.normal(key, (1, 1024, 1024, 6), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), img, train=False
    )

    if which == "fwd-scan":
        @jax.jit
        def fn(variables, img):
            def body(c, _):
                out = model.apply(variables, img + c, train=False)
                return c + jnp.bfloat16(1e-3), jnp.sum(out.astype(jnp.float32))
            _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=int(__import__("os").environ.get("SCAN_LEN", "2")))
            return s.sum()
    else:
        @jax.jit
        def fn(variables, img):
            c = jnp.bfloat16(0)
            s = jnp.float32(0)
            for _ in range(2):
                out = model.apply(variables, img + c, train=False)
                s = s + jnp.sum(out.astype(jnp.float32))
                c = c + jnp.bfloat16(1e-3)
            return s

    run(which, lambda: fn(variables, img))

if which == "flash-while":
    from multimodal_sam_adapter_tpu.ops.flash_attention import (
        flash_attention_rel_pos_diff,
    )

    BH, N, Dh = 16, 4096, 64
    q = jax.random.normal(key, (BH, N, Dh), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (BH, N, Dh), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (BH, N, Dh), jnp.bfloat16)
    rh = jax.random.normal(jax.random.PRNGKey(3), (127, Dh), jnp.float32)
    rw = jax.random.normal(jax.random.PRNGKey(4), (127, Dh), jnp.float32)

    @jax.jit
    def fn(q, n):
        def body(state):
            i, qq, s = state
            o = flash_attention_rel_pos_diff(qq, k, v, rh, rw, (64, 64),
                                             Dh**-0.5)
            return i + 1, qq + jnp.bfloat16(1e-3), s + jnp.sum(
                o.astype(jnp.float32))
        _, _, s = jax.lax.while_loop(lambda st: st[0] < n, body,
                                     (jnp.int32(0), q, jnp.float32(0)))
        return s

    run("flash-while", lambda: fn(q, jnp.int32(3)))

if which == "fwd-dense-while":
    import os
    os.environ["MSA_ATTN_IMPL"] = "dense"
    from __graft_entry__ import _flagship_model

    model = _flagship_model(dtype=jnp.bfloat16)
    img = jax.random.normal(key, (1, 1024, 1024, 6), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), img, train=False
    )

    @jax.jit
    def fn(variables, img, n):
        def body(state):
            i, c, s = state
            out = model.apply(variables, img + c, train=False)
            return (i + 1, c + jnp.bfloat16(1e-3),
                    s + jnp.sum(out.astype(jnp.float32)))
        _, _, s = jax.lax.while_loop(lambda st: st[0] < n, body,
                                     (jnp.int32(0), jnp.bfloat16(0),
                                      jnp.float32(0)))
        return s

    run("fwd-dense-while", lambda: fn(variables, img, jnp.int32(2)))
