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

pytestmark = pytest.mark.slow


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


REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def run_cli(args, cwd):
    # resolve the script against the repo but run from a scratch cwd so
    # CLI byproducts (eval_single_scale_*.json) never land in the repo root
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache")
    cmd = [sys.executable, osp.join(REPO, args[0])] + args[1:]
    r = subprocess.run(cmd, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, f"STDOUT:\n{r.stdout[-3000:]}\nERR:\n{r.stderr[-3000:]}"
    return r.stdout


def test_train_and_test_cli(fake_deliver, tmp_path):
    scratch = str(tmp_path)
    work = str(tmp_path / "work")
    out = run_cli(
        ["train.py", "deliver_tiny", "--data-root", fake_deliver,
         "--work-dir", work, "--max-epochs", "2"],
        cwd=scratch,
    )
    assert "loss" in out and '"eval"' in out
    ckpts = os.listdir(osp.join(work, "ckpts"))
    assert any(c.startswith("step_") for c in ckpts)

    ckpt = osp.join(work, "ckpts",
                    sorted(c for c in ckpts if c.startswith("step_"))[-1])
    out = run_cli(
        ["test.py", "deliver_tiny", ckpt, "--data-root", fake_deliver,
         "--eval", "mIoU"],
        cwd=scratch,
    )
    assert "mIoU" in out

    # batched eval through the CLI must reproduce batch-1 metrics exactly
    # (reference test_bs.py batching; Evaluator same-shape batching)
    out_b = run_cli(
        ["test.py", "deliver_tiny", ckpt, "--data-root", fake_deliver,
         "--eval", "mIoU", "--batch-size", "3"],
        cwd=scratch,
    )
    def miou(s):
        import re
        return re.search(r"\{'mIoU': ([\d.]+)", s).group(1)
    assert miou(out_b) == miou(out)

    # self-describing checkpoint meta (reference train.py:203-210 stores
    # config + CLASSES + PALETTE; test.py reads them back)
    meta_path = osp.join(ckpt, "meta.json")
    assert osp.exists(meta_path)
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["config_name"] == "deliver_tiny"
    assert meta["CLASSES"] and meta["PALETTE"]
    assert meta["config"]["model"]["num_classes"] == len(meta["CLASSES"])

    # flip TTA through the CLI (reference test.py --aug-test; ratio 1.0
    # because the GFFM LayerNorm is tied to the feature grid — same
    # constraint as the reference model; multi-scale geometry is covered by
    # tests/test_evaluator_sharding.py with a resolution-flexible engine)
    out_aug = run_cli(
        ["test.py", "deliver_tiny", ckpt, "--data-root", fake_deliver,
         "--eval", "mIoU", "--aug-test", "--aug-ratios", "1.0",
         "--max-samples", "2"],
        cwd=scratch,
    )
    assert "mIoU" in out_aug
    assert any(f.startswith("eval_multi_scale") for f in os.listdir(scratch))


@pytest.fixture(scope="module")
def fake_muses(tmp_path_factory):
    """MUSES layout (reference MUSES.py:62-63,170-175): per-split dirs of
    <case>/<condition>/ subtrees; RGB '_frame_camera.png', aux
    '<name>_lidar.npz' (HxWx3 float array under 'arr_0'), GT
    '_gt_labelTrainIds.png'."""
    root = tmp_path_factory.mktemp("muses")
    rng = np.random.default_rng(1)
    for split in ("train", "val", "test"):
        for case in ("clear", "rain"):
            for cond in ("day", "night"):
                img_d = root / "frame_camera" / split / case / cond
                mod_d = (root / "projected_to_rgb" / "lidar" / split / case
                         / cond)
                ev_d = (root / "projected_to_rgb" / "event_camera" / split
                        / case / cond)
                ann_d = root / "gt_semantic" / split / case / cond
                for d in (img_d, mod_d, ev_d, ann_d):
                    os.makedirs(d, exist_ok=True)
                name = f"2023-{case[:2]}-{cond[:2]}_REC{split[:2]}77"
                img = rng.integers(0, 255, (80, 96, 3), np.uint8)
                lid = rng.uniform(0, 30, (80, 96, 3)).astype(np.float32)
                ev = rng.uniform(-1, 1, (80, 96, 3)).astype(np.float32)
                ann = rng.integers(0, 19, (80, 96), np.uint8)
                cv2.imwrite(str(img_d / f"{name}_frame_camera.png"), img)
                np.savez(str(mod_d / f"{name}_lidar.npz"), lid)
                np.savez(str(ev_d / f"{name}_event_camera.npz"), ev)
                cv2.imwrite(str(ann_d / f"{name}_gt_labelTrainIds.png"), ann)
    return str(root)


def test_muses_dataset_discovery_and_routing(fake_muses):
    from multimodal_sam_adapter_tpu.configs import get_config
    from multimodal_sam_adapter_tpu.data.datasets import build_dataset

    cfg = get_config("muses_tiny")
    ds = build_dataset(cfg["dataset"], fake_muses, split="train")
    assert len(ds) == 4  # 2 cases x 2 conditions
    stems = [i["stem"] for i in ds.infos]
    assert stems == sorted(stems)
    s = ds[0]
    assert s["img"].shape == (80, 96, 6)  # rgb + 3ch npz lidar
    assert s["gt"].shape == (80, 96)
    # routing decodes encoded path components, not substrings
    assert s["meta"]["case"] in ("clear", "rain")
    assert s["meta"]["condition"] in ("day", "night")
    for info in ds.infos:
        case, cond = info["stem"].split("_")[:2]
        assert ds.case_of(info["stem"]) == case
        assert ds.condition_of(info["stem"]) == cond

    # format_results: benchmark-server naming (drop _frame_camera, strip
    # everything before the trailing R<record>)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        pred = np.zeros((80, 96), np.int64)
        files = ds.format_results([pred], [ds.infos[0]["stem"]], td)
        base = os.path.basename(files[0])
        assert base.startswith("REC") and base.endswith(".png")
        assert "_frame_camera" not in base


def test_muses_train_and_test_cli(fake_muses, tmp_path):
    scratch = str(tmp_path)
    work = str(tmp_path / "work_muses")
    out = run_cli(
        ["train.py", "muses_tiny", "--data-root", fake_muses,
         "--work-dir", work, "--max-epochs", "1"],
        cwd=scratch,
    )
    assert "loss" in out
    ckpts = os.listdir(osp.join(work, "ckpts"))
    ckpt = osp.join(work, "ckpts",
                    sorted(c for c in ckpts if c.startswith("step_"))[-1])
    out = run_cli(
        ["test.py", "muses_tiny", ckpt, "--data-root", fake_muses,
         "--eval", "mIoU"],
        cwd=scratch,
    )
    assert "mIoU" in out


def test_multi_aux_config_through_build_dataset(fake_muses):
    """A list-carrying config (mod_dir/mod_suffix lists, like the
    reference's configs/_base_/datasets/muses.py:30-31) must build through
    build_dataset — '{split}' templates resolved per list element — and
    load rgb+event+lidar as 9 channels, then normalize with per-aux stats
    through the composed test pipeline."""
    from multimodal_sam_adapter_tpu.configs import get_config
    from multimodal_sam_adapter_tpu.data.datasets import build_dataset
    from multimodal_sam_adapter_tpu.data.pipelines import TestPipeline

    cfg = get_config("muses_rgbeventlidar")
    ds = build_dataset(cfg["dataset"], fake_muses, split="val")
    assert len(ds) == 4
    s = ds[0]
    assert s["img"].shape == (80, 96, 9)  # rgb + event(3) + lidar(3)

    pipe = TestPipeline(cfg["test_pipeline"],
                        modalities_ch=cfg["dataset"]["modalities_ch"])
    out = pipe(dict(s))
    assert out["img"].shape[-1] == 9
    # the lidar slice used its own measured stats, not the event stats
    assert np.isfinite(out["img"]).all()


def test_multi_aux_modality_lists(tmp_path):
    """mod_dir/mod_suffix as aligned lists (reference mod_dir/mod_suffix are
    lists, configs/_base_/datasets/muses.py:30-31): every aux modality is
    loaded and concatenated along channels."""
    from multimodal_sam_adapter_tpu.data.datasets import SegDataset

    rng = np.random.default_rng(3)
    for d in ("images", "ann", "lidar", "event"):
        os.makedirs(tmp_path / d, exist_ok=True)
    cv2.imwrite(str(tmp_path / "images/a_rgb.png"),
                rng.integers(0, 255, (16, 20, 3), np.uint8))
    cv2.imwrite(str(tmp_path / "lidar/a_lidar.png"),
                rng.integers(0, 255, (16, 20, 3), np.uint8))
    cv2.imwrite(str(tmp_path / "event/a_event.png"),
                rng.integers(0, 255, (16, 20), np.uint8))  # 1-ch, tiled to 3
    cv2.imwrite(str(tmp_path / "ann/a_sem.png"),
                rng.integers(0, 5, (16, 20), np.uint8))

    ds = SegDataset(
        data_root=str(tmp_path), img_dir="images", ann_dir="ann",
        mod_dir=["lidar", "event"], img_suffix="_rgb.png",
        seg_map_suffix="_sem.png", mod_suffix=["_lidar.png", "_event.png"],
        modalities_ch=(3, 3, 1),
    )
    assert len(ds) == 1
    s = ds[0]
    assert s["img"].shape == (16, 20, 9)  # 3 rgb + 3 lidar + 3 (tiled event)
    assert s["gt"].shape == (16, 20)
