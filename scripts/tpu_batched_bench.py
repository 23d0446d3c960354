"""Probe: flagship 1024^2 inference throughput at batch sizes 1/2/4.

At B=1 the xplane trace shows ~34 ms of DMA/scheduling gaps over ~8000
small ops plus tile-padding waste on thin tensors — per-op overheads that
batching amortizes. This measures img/s at each batch via the same
scan-amortized method as bench.py.

Run on the real TPU: python scripts/tpu_batched_bench.py [batches...]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def measure(model, variables, batch):
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, 1024, 1024, 6),
                            jnp.bfloat16)

    def make_fn(n):
        @jax.jit
        def fn(variables, img):
            def body(c, _):
                out = model.apply(variables, img + c, train=False)
                return c + jnp.bfloat16(1e-3), jnp.sum(out.astype(jnp.float32))
            _, s = jax.lax.scan(body, jnp.bfloat16(0), None, length=n)
            return s.sum()
        return fn

    times = {}
    for n in (1, 5):
        fn = make_fn(n)
        float(fn(variables, img))  # compile + sync
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(fn(variables, img))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_scan = (times[5] - times[1]) / 4
    return per_scan / batch, times


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import _flagship_model
    from multimodal_sam_adapter_tpu.utils.params import cast_inference_params

    model = _flagship_model(dtype=jnp.bfloat16)
    img1 = jnp.zeros((1, 1024, 1024, 6), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), img1, train=False
    )
    variables = cast_inference_params(variables)

    for b in batches:
        try:
            per_img, times = measure(model, variables, b)
            print(f"B={b}: {per_img * 1e3:.1f} ms/img = {1.0 / per_img:.2f} "
                  f"img/s  raw={ {k: round(v, 3) for k, v in times.items()} }",
                  flush=True)
        except Exception as e:  # OOM or worker issue: report and continue
            print(f"B={b}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
