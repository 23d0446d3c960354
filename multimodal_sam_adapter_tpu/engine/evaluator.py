"""Evaluation loop: dataset -> inference engine -> metrics (+ case routing).

Re-design of reference apis/test_bs.py (single_gpu_test / multi_gpu_test) +
apis/evaluation/eval_hooks.py:
- per sample: jitted inference -> argmax -> per-image intersect/union
  histogram (device) -> host accumulation
- DELIVER: route each image into result_dict[condition][case] by filename
  (reference check_case, test_bs.py:158-165), then nested micro/macro
  aggregation; other datasets: flat mIoU
- multi-host: each process evaluates its shard; histograms are numpy and
  tiny, gathered with multihost_utils.process_allgather when distributed
- format_only: dataset.format_results (MUSES trainId PNG dumps)
- visualization dumps under out_dir/prediction/<condition>/<case>/
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from .inference import InferenceEngine
from .metrics import (
    Hist,
    intersect_and_union,
    pre_eval_to_metrics,
    pre_eval_to_metrics_dict,
    format_metrics_table,
)


def _pad_for_model(img: np.ndarray, multiple: int = 32):
    """Pad H/W up to a multiple so jit sees a small set of static shapes."""
    H, W = img.shape[:2]
    ph = (-H) % multiple
    pw = (-W) % multiple
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
    return img, (H, W)


class Evaluator:
    def __init__(self, engine: InferenceEngine, dataset, num_classes: int,
                 ignore_index: int = 255, case_aware: bool = False,
                 out_dir: Optional[str] = None):
        self.engine = engine
        self.dataset = dataset
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.case_aware = case_aware
        self.out_dir = out_dir

    def run(self, pipeline=None, max_samples: Optional[int] = None,
            format_only: bool = False, show: bool = False,
            opacity: float = 0.5, progress_every: int = 50) -> Dict:
        flat: List[Hist] = []
        nested: Dict[str, Dict[str, List[Hist]]] = {}
        dumped = []
        n = len(self.dataset) if max_samples is None else min(
            max_samples, len(self.dataset)
        )
        for i in range(n):
            sample = self.dataset[i]
            gt = sample.get("gt")
            if pipeline is not None:
                sample = pipeline(sample)
            img, ori_hw = _pad_for_model(sample["img"])
            # the engine cuts the pad band off the LOGITS before any
            # mode resize (reference geometry runs exact sizes)
            pred = self.engine.predict(
                jnp.asarray(img[None]), ori_shape=None, valid_hw=ori_hw
            )[0]
            if show and self.out_dir:
                # palette-blended dump under prediction/<condition>/<case>/
                # (reference test_bs.py:290-316)
                from .visualize import dump_prediction

                raw = self.dataset[i]["img"][..., :3].astype(np.uint8)
                dump_prediction(
                    self.out_dir, sample["meta"].get("condition"),
                    sample["meta"].get("case"),
                    sample["meta"]["stem"].replace("/", "_") + ".png",
                    raw, pred, getattr(self.dataset, "PALETTE", None) or
                    [[i, i, i] for i in range(256)], opacity,
                )
            if format_only and hasattr(self.dataset, "format_results"):
                dumped += self.dataset.format_results(
                    [pred], [sample["meta"]["stem"]], self.out_dir or "results"
                )
                continue
            if gt is None:
                continue
            if pred.shape != gt.shape:
                # reference resizes *logits* to eval dim; pred already matches
                # the configured dim; resize gt-space mismatch by nearest
                import cv2

                pred = cv2.resize(
                    pred.astype(np.int32), (gt.shape[1], gt.shape[0]),
                    interpolation=cv2.INTER_NEAREST,
                )
            hist = intersect_and_union(
                pred, gt, self.num_classes, self.ignore_index
            )
            flat.append(hist)
            if self.case_aware:
                cond = sample["meta"].get("condition") or "all"
                case = sample["meta"].get("case") or "ordinary"
                nested.setdefault(cond, {}).setdefault(case, []).append(hist)
            if progress_every and (i + 1) % progress_every == 0:
                print(f"eval {i + 1}/{n}", flush=True)
        if format_only:
            return {"files": dumped}
        results: Dict = {}
        if flat:
            results["flat"] = pre_eval_to_metrics(flat, ("mIoU",))
            results["summary"] = {
                "mIoU": float(np.nanmean(results["flat"]["IoU"])) * 100,
                "aAcc": float(results["flat"]["aAcc"]) * 100,
                "mAcc": float(np.nanmean(results["flat"]["Acc"])) * 100,
            }
        if self.case_aware and nested:
            results["nested"] = pre_eval_to_metrics_dict(
                nested, ("microIoU",), num_classes=self.num_classes
            )
            g = results["nested"]["global"]
            results["summary"]["mMicroIoU"] = float(
                np.nanmean(g["IoU"])
            ) * 100
        return results

    def print_tables(self, results: Dict):
        if "flat" in results:
            print(format_metrics_table(results["flat"], self.dataset.CLASSES))
        if "summary" in results:
            print({k: round(v, 2) for k, v in results["summary"].items()})
