#!/usr/bin/env python
"""FLOPs / params counter (reference segmentation/get_flops.py analogue).

Uses XLA's own cost analysis of the compiled forward — exact for the traced
graph, no hand-maintained per-module counters (and unlike the reference, no
manual attention-FLOPs correction needed: the compiler counts the real ops).

  python tools/get_flops.py deliver_rgblidar --shape 1024 1024
"""
import argparse
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--shape", nargs=2, type=int, default=[1024, 1024])
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model

    model = _flagship_model(dtype=jnp.bfloat16, tiny=args.tiny)
    h, w = args.shape
    img = jnp.zeros((1, h, w, 6), jnp.bfloat16)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img, train=False)
    )
    n_params = sum(
        int(jnp.prod(jnp.asarray(x.shape)))
        for x in jax.tree_util.tree_leaves(variables["params"])
    )

    lowered = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    ).lower(variables, img)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan"))
    bytes_ = cost.get("bytes accessed", float("nan"))
    print(f"params: {n_params/1e6:.2f} M")
    print(f"flops (fwd, batch 1, {h}x{w}): {flops/1e9:.2f} GFLOPs")
    print(f"hbm bytes accessed: {bytes_/1e9:.2f} GB")


if __name__ == "__main__":
    main()
