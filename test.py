#!/usr/bin/env python
"""Evaluate a trained segmentor (mirrors reference segmentation/test.py).

  python test.py <config-name> <checkpoint> --data-root ... --eval mIoU
      [--resize-dim H W] [--case ...] [--show-dir DIR] [--format-only]
      [--max-samples N] [--cfg-options k=v ...]
"""
import argparse
import json
import os.path as osp
import time


def parse_args():
    p = argparse.ArgumentParser(description="Test a segmentor")
    p.add_argument("config")
    p.add_argument("checkpoint", help="orbax checkpoint dir (or 'random')")
    p.add_argument("--data-root", required=True)
    p.add_argument("--eval", nargs="*", default=["mIoU"])
    p.add_argument("--aug-test", action="store_true",
                   help="flip + multi-scale TTA (reference test.py:32: "
                        "img_ratios [0.5,0.75,1.0,1.25,1.5,1.75], flip). "
                        "NOTE: non-1.0 ratios change the network input "
                        "size; the smart-fusion GFFM LayerNorm is tied to "
                        "the feature grid (reference "
                        "adapter_modules...:240-241 LayerNorm(H*W)), so "
                        "multi-scale needs a resolution-flexible model — "
                        "use --aug-ratios 1.0 for flip-only TTA otherwise")
    p.add_argument("--aug-ratios", nargs="+", type=float, default=None,
                   help="override the TTA scale ratios (with --aug-test)")
    p.add_argument("--resize-dim", nargs=2, type=int, default=None)
    p.add_argument("--case", nargs="*", default=None)
    p.add_argument("--show-dir", default=None)
    p.add_argument("--format-only", action="store_true")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=1,
                   help="stack same-shape images through one jitted forward"
                        " (slide mode stays batch-1)")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from multimodal_sam_adapter_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    from multimodal_sam_adapter_tpu.configs import get_config
    from multimodal_sam_adapter_tpu.configs.registry import apply_overrides
    from multimodal_sam_adapter_tpu.data import build_dataset
    from multimodal_sam_adapter_tpu.data.pipelines import TestPipeline
    from multimodal_sam_adapter_tpu.engine.checkpoint import restore_checkpoint
    from multimodal_sam_adapter_tpu.engine.evaluator import Evaluator
    from multimodal_sam_adapter_tpu.engine.inference import InferenceEngine
    from multimodal_sam_adapter_tpu.models.segmentor import EncoderDecoder
    from multimodal_sam_adapter_tpu.parallel.mesh import init_distributed

    init_distributed()  # multi-host eval: per-process shards + allgather
    cfg = get_config(args.config)
    if args.cfg_options:
        apply_overrides(cfg, dict(kv.split("=", 1) for kv in args.cfg_options))
    if args.resize_dim:
        cfg["test_cfg"]["dim"] = tuple(args.resize_dim)

    ds = build_dataset(cfg["dataset"], args.data_root, test_mode=True)
    pipe = TestPipeline(cfg["test_pipeline"], cfg["dataset"]["modalities_ch"])

    m = cfg["model"]
    model = EncoderDecoder(
        num_classes=m["num_classes"], head_channels=m["head_channels"],
        dropout_ratio=m["dropout_ratio"], backbone_cfg=m["backbone"],
        head_type=m.get("head_type", "segformer"),
        head_cfg=m.get("head"),
        dtype=jnp.bfloat16 if args.bf16 else None,
    )
    if args.checkpoint == "random":
        in_ch = sum(cfg["dataset"]["modalities_ch"])
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, in_ch), jnp.float32), train=False,
        )
    else:
        payload = restore_checkpoint(args.checkpoint)
        variables = {"params": payload["params"],
                     "batch_stats": payload["batch_stats"]}
        # self-describing checkpoints: read CLASSES/PALETTE back like the
        # reference test.py (checkpoint['meta']['CLASSES'/'PALETTE'])
        meta = payload.get("meta")
        if meta:
            if meta.get("config_name") and meta["config_name"] != args.config:
                print(f"note: checkpoint was trained with config "
                      f"'{meta['config_name']}', evaluating with "
                      f"'{args.config}'")
            if meta.get("CLASSES"):
                ds.CLASSES = tuple(meta["CLASSES"])
            if meta.get("PALETTE"):
                ds.PALETTE = [tuple(c) for c in meta["PALETTE"]]

    engine = InferenceEngine(model, variables, cfg["test_cfg"])
    case_aware = args.case is not None or bool(cfg["evaluation"].get("case"))
    ev = Evaluator(engine, ds, m["num_classes"], case_aware=case_aware,
                   out_dir=args.show_dir)
    aug_cfg = None
    if args.aug_test:
        # reference test.py:135-140 hard-codes these under --aug-test
        ratios = args.aug_ratios or [0.5, 0.75, 1.0, 1.25, 1.5, 1.75]
        aug_cfg = {"ratios": ratios, "flip": True}
    results = ev.run(pipeline=pipe, max_samples=args.max_samples,
                     format_only=args.format_only,
                     show=args.show_dir is not None,
                     batch_size=args.batch_size, aug_cfg=aug_cfg)
    ev.print_tables(results)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    scale_tag = "multi_scale" if args.aug_test else "single_scale"
    out_json = osp.join(args.show_dir or ".",
                        f"eval_{scale_tag}_{stamp}.json")
    payload = {k: v for k, v in results.get("summary", {}).items()}
    # provenance so an artifact can't be mistaken for a different run's
    # (e.g. random-init smoke vs trained weights)
    payload["provenance"] = {
        "config": args.config,
        "checkpoint": args.checkpoint,
        "data_root": args.data_root,
        "aug_test": bool(args.aug_test),
        "n_samples": len(ds) if args.max_samples is None
        else min(args.max_samples, len(ds)),
        "timestamp": stamp,
    }
    if "eval_results" in results:
        # nested condition x case dump, same shape as the reference's
        # evaluate() eval_results (DELIVER.py:261-617): per-cell summary +
        # per-class fractions, per-condition micro_IoU, global aggregates
        # incl. mMicroIoU and mMicroIoU_per_condition
        payload["eval_results"] = results["eval_results"]
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
