#!/usr/bin/env python
"""One-shot .pth -> orbax converters (reference tools/SAM_checkpoint_convert.py
analogue, plus ConvNeXt dual-branch and full trained-checkpoint ingestion).

  python tools/convert_checkpoints.py sam sam_vit_l_0b3195.pth out_dir/
  python tools/convert_checkpoints.py convnext convnext-small.pth out_dir/
  python tools/convert_checkpoints.py full mmsam_deliver.pth out_dir/ --config deliver_rgblidar
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["sam", "convnext", "full"])
    p.add_argument("pth")
    p.add_argument("out")
    p.add_argument("--config", default="deliver_rgblidar")
    args = p.parse_args()

    import numpy as np
    import orbax.checkpoint as ocp

    from multimodal_sam_adapter_tpu.engine.checkpoint import (
        ingest_convnext_pth,
        ingest_sam_pth,
        load_torch_checkpoint,
    )

    if args.kind == "sam":
        tree = ingest_sam_pth(args.pth)
    elif args.kind == "convnext":
        tree = ingest_convnext_pth(args.pth)
    else:
        from multimodal_sam_adapter_tpu.engine.convert_full import (
            convert_full_checkpoint,
        )

        tree = convert_full_checkpoint(load_torch_checkpoint(args.pth))
    ocp.PyTreeCheckpointer().save(osp.abspath(args.out), tree, force=True)
    n = sum(x.size for x in
            __import__("jax").tree_util.tree_leaves(tree))
    print(f"wrote {args.out} ({n/1e6:.1f}M values)")


if __name__ == "__main__":
    main()
