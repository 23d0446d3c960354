#!/usr/bin/env python
"""Write DELIVER test_easy.txt / test_hard.txt split files.

Analogue of reference datasets/DELIVER/hard_easy_division_test.py:
'hard' = underexposure files; 'easy' = everything else.

  python tools/hard_easy_division.py DATA_ROOT [--img-dir samples/images/test]
"""
import argparse
import os
import os.path as osp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data_root")
    p.add_argument("--img-dir", default="samples/images/test")
    p.add_argument("--hard-token", default="underexposure")
    args = p.parse_args()
    img_dir = osp.join(args.data_root, args.img_dir)
    names = sorted(f for f in os.listdir(img_dir) if f.endswith(".png"))
    hard = [n for n in names if args.hard_token in n]
    easy = [n for n in names if args.hard_token not in n]
    for split, items in (("test_hard.txt", hard), ("test_easy.txt", easy)):
        with open(osp.join(args.data_root, split), "w") as f:
            f.write("\n".join(items) + "\n")
        print(f"{split}: {len(items)} files")


if __name__ == "__main__":
    main()
