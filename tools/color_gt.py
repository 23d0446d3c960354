#!/usr/bin/env python
"""Colorize GT label PNGs with a dataset palette
(analogue of reference tools/color_gt_according_palette.py).

  python tools/color_gt.py DELIVER gt_dir out_dir
"""
import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["DELIVER", "FMB", "MUSES"])
    p.add_argument("gt_dir")
    p.add_argument("out_dir")
    args = p.parse_args()

    from multimodal_sam_adapter_tpu.data.datasets import (
        CITYSCAPES_PALETTE,
        DELIVER_PALETTE,
        FMB_PALETTE,
    )

    pal = {"DELIVER": DELIVER_PALETTE, "FMB": FMB_PALETTE,
           "MUSES": CITYSCAPES_PALETTE}[args.dataset]
    pal = np.asarray(pal, np.uint8)
    os.makedirs(args.out_dir, exist_ok=True)
    for f in sorted(os.listdir(args.gt_dir)):
        if not f.endswith(".png"):
            continue
        gt = cv2.imread(osp.join(args.gt_dir, f), cv2.IMREAD_UNCHANGED)
        if gt.ndim == 3:
            gt = gt[:, :, 0]
        color = pal[np.clip(gt, 0, len(pal) - 1)][:, :, ::-1]  # BGR out
        color[gt >= len(pal)] = 0
        cv2.imwrite(osp.join(args.out_dir, f), color)
    print("done")


if __name__ == "__main__":
    main()
