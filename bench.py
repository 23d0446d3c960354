"""Benchmark: flagship forward throughput at 1024x1024 on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing method: host<->device syncs through this environment's TPU tunnel
carry O(100ms) fixed latency and async dispatch makes block_until_ready
unreliable, so the measurement amortizes: one jit runs the forward N times
in a lax.scan (data-dependent chain) and returns a checksum; time(N=9) -
time(N=1) over 8 gives pure device time per forward.

Baseline context (BASELINE.md): the reference publishes no throughput
numbers; the driver target is >= 3x images/sec/chip over an A100 running the
reference model at 1024x1024. A100_EST below is our estimate of the
reference PyTorch implementation's single-A100 inference throughput for
SAM ViT-L + adapter at 1024^2 (fp16, batch 1): ~4 img/s (the model is
~4 TFLOPs/img with unfused eager attention and the deformable-attention
CUDA op). vs_baseline = value / A100_EST.
"""
import json
import time

import jax
import jax.numpy as jnp

A100_EST_IMG_PER_S = 4.0


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import _flagship_model

    model = _flagship_model(dtype=jnp.bfloat16)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 1024, 1024, 6),
                            jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), img, train=False
    )
    from multimodal_sam_adapter_tpu.utils.params import cast_inference_params

    variables = cast_inference_params(variables)  # bf16 weight storage

    # variables/img threaded as args so they don't bake into the HLO.
    # Measurement = (scan(9) - scan(1)) / 8, min over repeats — pure device
    # time, host-sync jitter amortized 8x. (Earlier rounds were limited to
    # scan(2)-scan(1): a 2026-08 libtpu regression crashed the worker on any
    # scan length >= 3 — scripts/tpu_crash_bisect.py — re-verified FIXED on
    # 2026-08-18.) min-of-N suppresses the tunnel's host-sync jitter.
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
    for n in (1, 9):
        fn = make_fn(n)
        float(fn(variables, img))  # compile + sync
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(variables, img))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_img = (times[9] - times[1]) / 8

    # FLOP accounting so vs_baseline is auditable (not just the A100_EST
    # constant): XLA's own cost analysis of the compiled single forward.
    # v5e bf16 peak = 197 TFLOP/s; A100 fp16 dense peak = 312 TFLOP/s — the
    # implied A100 MFU of the 4 img/s estimate is printed alongside.
    V5E_PEAK_FLOPS = 197e12
    A100_PEAK_FLOPS = 312e12
    flops_per_img = None
    try:
        lowered = jax.jit(
            lambda v, x: model.apply(v, x, train=False)
        ).lower(variables, img)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_img = float(cost.get("flops", float("nan")))
    except Exception:
        pass

    rec = {
        "metric": "flagship_1024_infer_images_per_sec_per_chip",
        "unit": "img/s",
        "raw_times_s": {str(k): round(v, 4) for k, v in times.items()},
    }
    if flops_per_img and flops_per_img == flops_per_img:
        rec["flops_per_img"] = round(flops_per_img / 1e12, 4)  # TFLOP
        if per_img > 1e-3:
            rec["mfu_v5e"] = round(flops_per_img / per_img / V5E_PEAK_FLOPS,
                                   4)
        rec["a100_est_implied_mfu"] = round(
            flops_per_img * A100_EST_IMG_PER_S / A100_PEAK_FLOPS, 4
        )
    if per_img <= 1e-3:
        # host-sync jitter exceeded the single-image increment: the
        # subtraction is noise-dominated; flag instead of emitting inf
        rec.update(value=0.0, vs_baseline=0.0, noise_dominated=True)
    else:
        ips = 1.0 / per_img
        rec.update(value=round(ips, 4),
                   vs_baseline=round(ips / A100_EST_IMG_PER_S, 4))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
