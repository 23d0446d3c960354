"""Synthesize a LEARNABLE fake-DELIVER dataset for end-to-end CLI runs.

Unlike the random-noise smoke fixtures (tests/test_cli_e2e.py::fake_deliver),
the segmentation here is learnable: each class k paints its blobs with a
distinct color in both rgb and the aux modality (plus noise), so a model
trained on the training split generalizes to validation — producing a real
(non-random) mIoU through the actual train.py/test.py CLIs. Reference
layout: DELIVER samples/{images,annotations,<aux>}/{split}/
<case>_<cond>_..._rgb_front.png (mmseg_custom/datasets/deliver.py).

Usage: python tools/make_synth_deliver.py <out_root> [n_per_cell] [seed]
"""
import os
import sys

import cv2
import numpy as np

K = 6  # classes actually present (ids 0..K-1 of deliver_tiny's 25)
SIZE = 80
COLORS = np.array(
    [[200, 40, 40], [40, 200, 40], [40, 40, 200], [200, 200, 40],
     [40, 200, 200], [160, 80, 200]], np.int32)


def make_pair(rng):
    ann = np.zeros((SIZE, SIZE), np.uint8)
    # random rectangles of random classes over a class-0 background
    for _ in range(6):
        k = int(rng.integers(1, K))
        x, y = rng.integers(0, SIZE - 8, 2)
        w, h = rng.integers(8, 40, 2)
        ann[y:y + h, x:x + w] = k
    img = COLORS[ann] + rng.normal(0, 18, (SIZE, SIZE, 3))
    aux = COLORS[ann][..., ::-1] + rng.normal(0, 18, (SIZE, SIZE, 3))
    return (np.clip(img, 0, 255).astype(np.uint8),
            np.clip(aux, 0, 255).astype(np.uint8), ann)


def main():
    root = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(int(sys.argv[3]) if len(sys.argv) > 3 else 0)
    conds = ["sun", "rain"]
    cases = ["", "motionblur_"]
    for split in ("training", "validation", "test"):
        for d in ("images", "annotations", "lidar"):
            os.makedirs(os.path.join(root, "samples", d, split),
                        exist_ok=True)
        for cond in conds:
            for case in cases:
                for i in range(n):
                    stem = f"{case}{cond}_{split}_{i}"
                    img, aux, ann = make_pair(rng)
                    cv2.imwrite(os.path.join(
                        root, "samples/images", split,
                        f"{stem}_rgb_front.png"), img)
                    cv2.imwrite(os.path.join(
                        root, "samples/lidar", split,
                        f"{stem}_lidar_front.png"), aux)
                    cv2.imwrite(os.path.join(
                        root, "samples/annotations", split,
                        f"{stem}_semantic_front.png"), ann)
    print(f"wrote {root}: {3 * len(conds) * len(cases) * n} samples")


if __name__ == "__main__":
    main()
