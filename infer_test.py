#!/usr/bin/env python
"""Inference-only run: dump predictions (no metrics).

Mirrors reference segmentation/infer_test.py — test.py with
pre_eval=False, format_only=True hard-wired (MUSES benchmark-server
submission dumps + visualizations).
"""
import sys

import test as test_cli


def main():
    # explicit passthrough: append the flag rather than splicing argv by
    # position (argparse handles flags anywhere; duplicates are harmless)
    if "--format-only" not in sys.argv:
        sys.argv.append("--format-only")
    test_cli.main()


if __name__ == "__main__":
    main()
