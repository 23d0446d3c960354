"""Metric-level parity rehearsal: reference torch eval vs this repo's eval
on the same synthetic DELIVER images from the same converted checkpoint
(VERDICT r3 item 4 — closes the gap between "logits match" and "the
reported mIoU matches").

Both sides consume identical preprocessed inputs (this repo's TestPipeline;
pipeline semantics are separately unit-tested against the reference,
tests/test_pipelines.py) and the same synthetic reference-format state
dict. The REFERENCE side is driven by the reference's own code wherever it
is importable in this environment:
- model: the reference torch backbone + SegformerHead
  (tests/test_full_model_parity.py oracle), logits resized with the
  reference's resize (whole_inference_dim, encoder_decoder.py:364-377)
- metrics: the reference's vendored metrics_micro.py
  (intersect_and_union, pre_eval_to_metrics, pre_eval_to_metrics_dict —
  mmseg_custom/apis/evaluation/metrics_micro.py), imported directly
- condition/case routing: check_case semantics (test_bs.py:156-165),
  replicated verbatim (test_bs.py itself imports the full mmcv runtime,
  which is not installed here)

The repo side runs the production eval stack test.py drives: converted
checkpoint -> InferenceEngine(whole_dim) -> Evaluator with case routing ->
engine/metrics nested aggregation.

Asserts: global mIoU equal to < 0.01, per-(condition, case) per-class IoU
tables equal, per-condition micro_IoU equal, and the global
condition/case micro scalars equal.
"""
import importlib.util
import os
import os.path as osp
import sys

import numpy as np
import pytest

REF = "/root/reference/segmentation"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference tree not available"),
]

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

NCLS = 7
HEAD_CH = 16
DIM = 64
CONDITIONS = ["sun", "cloud", "night", "fog", "rain"]  # test_bs.py order
CASES = ["motionblur", "overexposure", "underexposure", "lidarjitter",
         "eventlowres"]


def check_case(filename, case, condition):
    """Reference routing, replicated verbatim (test_bs.py:156-165):
    first substring-matching condition wins; within it the first
    substring-matching case, else 'ordinary'."""
    for cond_t in condition:
        if cond_t in filename:
            for c in case:
                if c in filename:
                    return c, cond_t
            return "ordinary", cond_t


def _load_ref_metrics():
    """Import the reference's vendored metric code. mmcv is only touched
    for imread on str labels (we pass arrays), so the oracle's stub
    suffices."""
    from tests.reference_oracle import load_reference_modules

    load_reference_modules()  # installs the mmcv/mmseg stubs
    spec = importlib.util.spec_from_file_location(
        "ref_metrics_micro",
        osp.join(REF, "mmseg_custom/apis/evaluation/metrics_micro.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def deliver_dir(tmp_path_factory):
    """16 synthetic DELIVER val images at 64x64 (no pad, no resize: the
    geometric paths are covered by their own unit tests; this rehearsal
    isolates model + metric plumbing)."""
    import cv2

    root = tmp_path_factory.mktemp("deliver_parity")
    rng = np.random.default_rng(0)
    split = "test"  # test.py's build_dataset(test_mode=True) split dir
    for d in ("images", "annotations", "lidar"):
        os.makedirs(root / "samples" / d / split, exist_ok=True)
    conds = ["sun", "cloud", "night", "rain"]
    cases = ["", "motionblur_", "overexposure_", ""]
    i = 0
    for cond in conds:
        for case in cases:
            stem = f"{case}{cond}_van_{i}"
            img = rng.integers(0, 255, (DIM, DIM, 3), np.uint8)
            lid = rng.integers(0, 255, (DIM, DIM, 3), np.uint8)
            ann = rng.integers(0, NCLS, (DIM, DIM), np.uint8)
            # sprinkle ignore pixels to exercise the 255 mask on both sides
            ann[rng.random((DIM, DIM)) < 0.05] = 255
            cv2.imwrite(str(root / "samples/images" / split /
                            f"{stem}_rgb_front.png"), img)
            cv2.imwrite(str(root / "samples/lidar" / split /
                            f"{stem}_lidar_front.png"), lid)
            cv2.imwrite(str(root / "samples/annotations" / split /
                            f"{stem}_semantic_front.png"), ann)
            i += 1
    return str(root)


def test_reference_eval_matches_repo_eval(deliver_dir):
    import torch
    import jax
    import jax.numpy as jnp

    from multimodal_sam_adapter_tpu.configs import get_config
    from multimodal_sam_adapter_tpu.data import build_dataset
    from multimodal_sam_adapter_tpu.data.pipelines import TestPipeline
    from multimodal_sam_adapter_tpu.engine.convert_full import (
        convert_full_checkpoint,
    )
    from multimodal_sam_adapter_tpu.engine.evaluator import Evaluator
    from multimodal_sam_adapter_tpu.engine.inference import InferenceEngine
    from multimodal_sam_adapter_tpu.models.segmentor import EncoderDecoder
    from tests.test_convert_full import synth_state_dict
    from tests.test_full_model_parity import (
        PICO_CH, PICO_DEPTHS, TINY_BACKBONE, _build_torch_model,
        _sanitize_batchnorm_stats,
    )

    ref = _load_ref_metrics()
    sd = _sanitize_batchnorm_stats(
        synth_state_dict(ch=PICO_CH, depths=PICO_DEPTHS))
    backbone, head, ns = _build_torch_model(sd)

    cfg = get_config("deliver_tiny")
    ds = build_dataset(cfg["dataset"], deliver_dir, test_mode=True)
    assert len(ds) == 16
    # the synthetic checkpoint is a 7-class model; the class-name table must
    # match num_classes for the nested report (as it does in any real config)
    ds.CLASSES = tuple(f"c{i}" for i in range(NCLS))
    pipe = TestPipeline({"normalize": cfg["test_pipeline"]["normalize"]},
                        cfg["dataset"]["modalities_ch"])

    # ---- reference eval loop: torch model -> resize -> softmax -> argmax
    # -> reference intersect_and_union -> check_case routing
    result_dict = {c: {k: [] for k in CASES + ["ordinary"]}
                   for c in CONDITIONS}
    flat = []
    for i in range(len(ds)):
        sample = ds[i]
        gt = sample["gt"].astype(np.int64)
        x = pipe(dict(sample))["img"]
        with torch.no_grad():
            xt = torch.tensor(x[None]).permute(0, 3, 1, 2)
            feats, _ = backbone(xt)
            logits = head(feats)
            logits = ns.resize(logits, size=(DIM, DIM), mode="bilinear",
                               align_corners=False)
            pred = torch.softmax(logits, dim=1).argmax(1)[0]
        # metrics_micro.intersect_and_union takes numpy pred + label
        # (torch.from_numpy both, :56-66)
        hist = ref.intersect_and_union(pred.numpy(), gt, NCLS, 255)
        case, cond = check_case(sample["meta"]["stem"], CASES, CONDITIONS)
        result_dict[cond][case].append(hist)
        flat.append(hist)

    ref_nested = ref.pre_eval_to_metrics_dict(
        result_dict, ["microIoU"], nan_to_num=None, num_classes=NCLS)
    ref_flat = ref.pre_eval_to_metrics(flat, ["mIoU"])
    ref_miou = float(np.nanmean(np.asarray(ref_flat["IoU"]))) * 100

    # ---- repo eval: the stack test.py drives
    tree = convert_full_checkpoint(sd, TINY_BACKBONE["interaction_indexes"])
    model = EncoderDecoder(num_classes=NCLS, head_channels=HEAD_CH,
                           backbone_cfg=TINY_BACKBONE)
    engine = InferenceEngine(
        model,
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        dict(mode="whole_dim", rescale=True, dim=(DIM, DIM)),
    )
    ev = Evaluator(engine, ds, NCLS, case_aware=True)
    with jax.default_matmul_precision("highest"):
        results = ev.run(pipeline=pipe)

    # ---- the reported numbers must match
    got_miou = results["summary"]["mIoU"]
    assert abs(got_miou - ref_miou) < 0.01, (got_miou, ref_miou)

    ours = results["nested"]
    n_cells = 0
    for cond in CONDITIONS:
        for case in CASES + ["ordinary"]:
            ref_cell = ref_nested.get(cond, {}).get(case)
            our_cell = ours.get(cond, {}).get(case)
            if ref_cell is None:
                assert our_cell is None, (cond, case)
                continue
            assert our_cell is not None, (cond, case)
            np.testing.assert_allclose(
                np.asarray(our_cell["IoU"], np.float64),
                np.asarray(ref_cell["IoU"], np.float64),
                rtol=1e-6, atol=1e-9, equal_nan=True,
                err_msg=f"IoU mismatch at {cond}/{case}",
            )
            n_cells += 1
    assert n_cells >= 4  # the grid actually populated

    # per-condition and global micro tables (per-class inter/union arrays,
    # exactly the reference's shapes: ret[cond]['micro_IoU'],
    # ret['global'][cond]['micro_IoU'], ret['global'][case])
    for cond in CONDITIONS:
        if cond in ref_nested and "micro_IoU" in ref_nested[cond]:
            np.testing.assert_allclose(
                np.asarray(ours[cond]["micro_IoU"], np.float64),
                np.asarray(ref_nested[cond]["micro_IoU"], np.float64),
                rtol=1e-6, equal_nan=True,
                err_msg=f"micro_IoU mismatch at {cond}")
    for key, val in ref_nested["global"].items():
        if isinstance(val, dict) and "micro_IoU" in val:
            np.testing.assert_allclose(
                np.asarray(ours["global"][key]["micro_IoU"], np.float64),
                np.asarray(val["micro_IoU"], np.float64),
                rtol=1e-6, equal_nan=True,
                err_msg=f"global micro mismatch at {key}")
        elif key not in ("IoU", "Acc", "aAcc"):
            np.testing.assert_allclose(
                np.asarray(ours["global"][key], np.float64),
                np.asarray(val, np.float64), rtol=1e-6, equal_nan=True,
                err_msg=f"global case micro mismatch at {key}")
