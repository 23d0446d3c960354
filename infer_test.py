#!/usr/bin/env python
"""Inference-only run: dump predictions (no metrics).

Mirrors reference segmentation/infer_test.py — test.py with
pre_eval=False, format_only=True hard-wired (MUSES benchmark-server
submission dumps + visualizations).
"""
import sys

import test as test_cli


def main():
    sys.argv.insert(sys.argv.index(sys.argv[1]) + 2, "--format-only")
    test_cli.main()


if __name__ == "__main__":
    main()
