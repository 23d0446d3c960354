"""Benchmark: flagship forward throughput at 1024x1024 on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference publishes no throughput
numbers; the driver target is >= 3x images/sec/chip over an A100 running the
reference model at 1024x1024. A100_EST below is our estimate of the
reference PyTorch implementation's single-A100 inference throughput for
SAM ViT-L + adapter at 1024^2 (fp16, batch 1): ~4 img/s — the model is
~1.3 TFLOPs/img in its ViT alone plus adapter/convnext/deformable overheads
and the reference runs unfused eager attention. vs_baseline = value / A100_EST.
"""
import json
import time

import jax
import jax.numpy as jnp

A100_EST_IMG_PER_S = 4.0


def main():
    from __graft_entry__ import _flagship_model

    model = _flagship_model(dtype=jnp.bfloat16)
    batch = 1
    img = jnp.zeros((batch, 1024, 1024, 6), jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    init = jax.jit(model.init, static_argnames=("train",))
    variables = init(rng, img, train=False)

    @jax.jit
    def fwd(variables, img):
        return model.apply(variables, img, train=False)

    # warmup / compile
    fwd(variables, img)[0].block_until_ready()
    fwd(variables, img)[0].block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, img)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    ips = batch * iters / dt

    print(json.dumps({
        "metric": "flagship_1024_infer_images_per_sec_per_chip",
        "value": round(ips, 4),
        "unit": "img/s",
        "vs_baseline": round(ips / A100_EST_IMG_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
