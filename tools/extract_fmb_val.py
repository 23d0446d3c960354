#!/usr/bin/env python
"""Sort FMB images into easy/hard subfolders from the provided file lists.

TPU-framework analogue of the reference's dataset-prep script
(reference datasets/FMB/extract_FMB_val.py): for each data division
(train/val/test), creates Visible/{easy,hard} and moves the filenames
listed in <division>_easy_files.txt / <division>_hard_files.txt into them.
The reference's 'val' quirk is preserved: val-division lists point at
files that physically live under train/Visible.

Usage:
  python tools/extract_fmb_val.py <FMB-root> [--divisions train val test]
      [--modality-dirs Visible Infrared] [--copy] [--dry-run]

Extensions over the reference script (which hard-codes Visible and move):
  --modality-dirs sorts the thermal branch too; --copy keeps originals;
  --dry-run prints the plan without touching files.
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil


def extract(base_dir: str, divisions, modality_dirs, copy=False,
            dry_run=False):
    n_moved = n_missing = 0
    for division in divisions:
        for mod_dir in modality_dirs:
            visible_dir = osp.join(base_dir, division, mod_dir)
            for folder in ("easy", "hard"):
                if not dry_run:
                    os.makedirs(osp.join(visible_dir, folder), exist_ok=True)
            for txt_file, target in (
                (f"{division}_easy_files.txt", "easy"),
                (f"{division}_hard_files.txt", "hard"),
            ):
                txt_path = osp.join(base_dir, txt_file)
                if not osp.exists(txt_path):
                    print(f"note: {txt_path} not found, skipping")
                    continue
                with open(txt_path) as f:
                    for line in f:
                        filename = line.strip()
                        if not filename:
                            continue
                        # the val lists reference files stored under train/
                        # (reference extract_FMB_val.py:19-21)
                        src_dir = (visible_dir.replace("val", "train")
                                   if division == "val" else visible_dir)
                        src = osp.join(src_dir, filename)
                        dst = osp.join(visible_dir, target, filename)
                        if not osp.exists(src):
                            print(f"Warning: {src} does not exist.")
                            n_missing += 1
                            continue
                        if dry_run:
                            print(f"{'copy' if copy else 'move'} {src} "
                                  f"-> {dst}")
                        elif copy:
                            shutil.copy2(src, dst)
                        else:
                            shutil.move(src, dst)
                        n_moved += 1
    print(f"done: {n_moved} files {'copied' if copy else 'moved'}, "
          f"{n_missing} missing")
    return n_moved, n_missing


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("base_dir", help="FMB dataset root")
    p.add_argument("--divisions", nargs="+",
                   default=["train", "val", "test"])
    p.add_argument("--modality-dirs", nargs="+", default=["Visible"])
    p.add_argument("--copy", action="store_true")
    p.add_argument("--dry-run", action="store_true")
    a = p.parse_args()
    extract(a.base_dir, a.divisions, a.modality_dirs, a.copy, a.dry_run)


if __name__ == "__main__":
    main()
