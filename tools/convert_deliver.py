#!/usr/bin/env python
"""Reorganize a raw DELIVER download into the flat training layout.

Analogue of reference tools/convert_DELIVER_to_mmseg.py:33-62: files are
copied into samples/{images,annotations,depth,lidar,event}/{training,
validation,test} with '<case>_<condition>_<name>' flat filenames; semantic
labels are remapped 255->0 then shifted by -1 (class ids 0..24, 255 ignore).

  python tools/convert_deliver.py RAW_DELIVER_DIR OUT_DIR
"""
import argparse
import os
import os.path as osp
import shutil

import cv2
import numpy as np

SPLIT_MAP = {"train": "training", "val": "validation", "test": "test"}
MODS = {
    "img": ("images", False),
    "semantic": ("annotations", True),
    "depth": ("depth", False),
    "lidar": ("lidar", False),
    "event": ("event", False),
}


def convert_label(src: str, dst: str):
    lab = cv2.imread(src, cv2.IMREAD_UNCHANGED)
    if lab.ndim == 3:
        lab = lab[:, :, 0]
    lab = lab.astype(np.int32)
    lab[lab == 255] = 0
    lab = lab - 1
    lab[lab < 0] = 255
    cv2.imwrite(dst, lab.astype(np.uint8))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    args = p.parse_args()
    for mod, (out_name, is_label) in MODS.items():
        mod_root = osp.join(args.src, mod)
        if not osp.isdir(mod_root):
            print(f"skip {mod}: not found")
            continue
        for case in sorted(os.listdir(mod_root)):
            case_dir = osp.join(mod_root, case)
            if not osp.isdir(case_dir):
                continue
            for split, out_split in SPLIT_MAP.items():
                split_dir = osp.join(case_dir, split)
                if not osp.isdir(split_dir):
                    continue
                out_dir = osp.join(args.dst, "samples", out_name, out_split)
                os.makedirs(out_dir, exist_ok=True)
                for root, _, files in os.walk(split_dir):
                    cond = osp.relpath(root, split_dir).split(osp.sep)[0]
                    for f in files:
                        if not f.lower().endswith(".png"):
                            continue
                        out = osp.join(out_dir, f"{case}_{cond}_{f}")
                        src_f = osp.join(root, f)
                        if is_label:
                            convert_label(src_f, out)
                        else:
                            shutil.copyfile(src_f, out)
        print(f"converted modality {mod}")


if __name__ == "__main__":
    main()
