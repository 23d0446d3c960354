"""End-to-end CLI test: synthesize a DELIVER-layout dataset on disk, run the
train CLI for 2 tiny epochs (with eval hook + checkpointing), then the test
CLI against the saved checkpoint. Exercises dataset discovery, the full host
pipeline, the runner, orbax checkpoints, inference modes, and metrics."""
import json
import os
import os.path as osp
import subprocess
import sys

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def fake_deliver(tmp_path_factory):
    root = tmp_path_factory.mktemp("deliver")
    rng = np.random.default_rng(0)
    conds = ["sun", "rain"]
    cases = ["", "motionblur_"]
    for split in ("training", "validation", "test"):
        for d in ("images", "annotations", "lidar"):
            os.makedirs(root / "samples" / d / split, exist_ok=True)
        for ci, cond in enumerate(conds):
            for case in cases:
                stem = f"{case}{cond}_{split}_{ci}"
                img = rng.integers(0, 255, (80, 80, 3), np.uint8)
                lid = rng.integers(0, 255, (80, 80, 3), np.uint8)
                ann = rng.integers(0, 25, (80, 80), np.uint8)
                cv2.imwrite(str(root / "samples/images" / split /
                                f"{stem}_rgb_front.png"), img)
                cv2.imwrite(str(root / "samples/lidar" / split /
                                f"{stem}_lidar_front.png"), lid)
                cv2.imwrite(str(root / "samples/annotations" / split /
                                f"{stem}_semantic_front.png"), ann)
    return str(root)


def run_cli(args, cwd):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache")
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, f"STDOUT:\n{r.stdout[-3000:]}\nERR:\n{r.stderr[-3000:]}"
    return r.stdout


def test_train_and_test_cli(fake_deliver, tmp_path):
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    work = str(tmp_path / "work")
    out = run_cli(
        ["train.py", "deliver_tiny", "--data-root", fake_deliver,
         "--work-dir", work, "--max-epochs", "2"],
        cwd=repo,
    )
    assert "loss" in out and '"eval"' in out
    ckpts = os.listdir(osp.join(work, "ckpts"))
    assert any(c.startswith("step_") for c in ckpts)

    ckpt = osp.join(work, "ckpts",
                    sorted(c for c in ckpts if c.startswith("step_"))[-1])
    out = run_cli(
        ["test.py", "deliver_tiny", ckpt, "--data-root", fake_deliver,
         "--eval", "mIoU"],
        cwd=repo,
    )
    assert "mIoU" in out
