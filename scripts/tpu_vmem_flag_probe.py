"""A/B: does a larger scoped-VMEM limit let the latency-hiding scheduler
prefetch weight slices earlier? (r3 trace: ~19 ms/forward of DMA-wait gaps
charged to parameter copy/slice-starts.)

Uses jit(...).lower().compile(compiler_options=...) so the TPU flag rides
PJRT compile options to the remote compiler (client-side XLA_FLAGS rejects
TPU-only flag names).
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _flagship_model

model = _flagship_model(dtype=jnp.bfloat16)
img = jax.random.normal(jax.random.PRNGKey(1), (1, 1024, 1024, 6),
                        jnp.bfloat16)
variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.PRNGKey(0), img, train=False)
from multimodal_sam_adapter_tpu.utils.params import cast_inference_params

variables = cast_inference_params(variables)

OPTS = [
    ("default", None),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
]
if len(sys.argv) > 1:
    OPTS = [o for o in OPTS if o[0] in sys.argv[1:]]


def make_fn(n):
    def fn(variables, img):
        def body(c, _):
            out = model.apply(variables, img + c, train=False)
            return c + jnp.bfloat16(1e-3), jnp.sum(out.astype(jnp.float32))
        _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
        return s.sum()
    return fn


for name, opts in OPTS:
    try:
        times = {}
        for n in (1, 9):
            lowered = jax.jit(make_fn(n)).lower(variables, img)
            compiled = lowered.compile(compiler_options=opts) if opts \
                else lowered.compile()
            float(compiled(variables, img))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(compiled(variables, img))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        per = (times[9] - times[1]) / 8
        print(f"{name}: {per*1000:.2f} ms/img ({1/per:.2f} img/s)",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:300]}", flush=True)
