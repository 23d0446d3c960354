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
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .inference import InferenceEngine
from .metrics import (
    Hist,
    _sum_hists,
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
            opacity: float = 0.5, progress_every: int = 50,
            batch_size: int = 1, shard: Optional[Tuple[int, int]] = None,
            aug_cfg: Optional[Dict] = None) -> Dict:
        """Evaluate the (sharded slice of the) dataset.

        shard: (rank, world) — this process evaluates indices rank::world
        (the reference's DistributedSampler split, apis/test_bs.py:363-722);
        defaults to (jax.process_index(), jax.process_count()). Per-shard
        histograms are reduced across processes at the end (the TPU
        equivalent of collect_results_cpu/gpu).

        batch_size: same-shape images are stacked through ONE jitted
        forward (reference multi_gpu_test batches via samples_per_gpu);
        slide mode stays batch-1 (each image already fans out into a
        window batch).

        aug_cfg: {'ratios': [...], 'flip': bool} enables multi-scale +
        flip TTA (reference test.py:135-140 MultiScaleFlipAug under
        --aug-test): per sample, softmax outputs are averaged over all
        (ratio x flip) augmentations before argmax. Forces batch_size 1
        (each scale is a distinct shape).
        """
        import jax

        if shard is None:
            shard = (jax.process_index(), jax.process_count())
        rank, world = shard
        flat: List[Hist] = []
        nested: Dict[str, Dict[str, List[Hist]]] = {}
        dumped = []
        n = len(self.dataset) if max_samples is None else min(
            max_samples, len(self.dataset)
        )
        if self.engine.test_cfg.get("mode") in ("slide", "slide_mod_sel"):
            batch_size = 1
        if aug_cfg:
            batch_size = 1
        warned_mismatch = [False]

        def handle(idx, sample, gt, pred, img=None, valid_hw=None):
            if show and self.out_dir:
                # palette-blended dump under prediction/<condition>/<case>/
                # (reference test_bs.py:290-316)
                from .visualize import dump_prediction

                raw = self.dataset[idx]["img"][..., :3].astype(np.uint8)
                dump_prediction(
                    self.out_dir, sample["meta"].get("condition"),
                    sample["meta"].get("case"),
                    sample["meta"]["stem"].replace("/", "_") + ".png",
                    raw, pred, getattr(self.dataset, "PALETTE", None) or
                    [[i, i, i] for i in range(256)], opacity,
                )
            if format_only and hasattr(self.dataset, "format_results"):
                dumped.extend(self.dataset.format_results(
                    [pred], [sample["meta"]["stem"]], self.out_dir or "results"
                ))
                return
            if gt is None:
                return
            if pred.shape != gt.shape:
                # Shapes aligned configs never hit this. When they don't,
                # match the reference: resize the MODE OUTPUT bilinearly
                # pre-argmax (encoder_decoder.py:329-414 resizes logits to
                # ori_shape), not the argmax map — and say so loudly, since
                # a silently-firing fallback skews metrics.
                if not warned_mismatch[0]:
                    print(f"WARNING: prediction shape {pred.shape} != GT "
                          f"shape {gt.shape}; re-running inference and "
                          f"bilinearly resizing the class probabilities to "
                          f"the GT grid (reference logits-resize semantics). "
                          f"Check test_cfg dim vs the dataset's label size.",
                          flush=True)
                    warned_mismatch[0] = True
                if img is not None:
                    from ..utils.interpolate import resize_bilinear

                    probs = self.engine.inference(
                        jnp.asarray(img)[None], ori_shape=None,
                        valid_hw=valid_hw)
                    probs = resize_bilinear(probs, gt.shape[:2])
                    pred = np.asarray(
                        jnp.argmax(probs, axis=-1), dtype=np.int64)[0]
                else:
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

        buf: List = []

        def flush():
            if not buf:
                return
            imgs = np.stack([b[3] for b in buf])
            preds = self.engine.predict(
                jnp.asarray(imgs), ori_shape=None, valid_hw=buf[0][4]
            )
            for (idx, sample, gt, img, vhw), pred in zip(buf, preds):
                handle(idx, sample, gt, pred, img=img, valid_hw=vhw)
            buf.clear()

        def aug_predict(raw):
            """Multi-scale + flip TTA for one sample: average the softmax
            over all augmentations (reference MultiScaleFlipAug +
            encoder_decoder.py:509-546 aug_test)."""
            ratios = list(aug_cfg.get("ratios") or [1.0])
            flips = [False, True] if aug_cfg.get("flip") else [False]
            ori_hw = tuple(raw["img"].shape[:2])
            acc = None
            for r in ratios:
                s = dict(raw)
                s["meta"] = dict(raw.get("meta") or {})
                s["img"] = np.array(raw["img"])
                if pipeline is not None:
                    s = pipeline(s, scale_ratio=r)
                elif r != 1.0:
                    from ..data.pipelines import resize_multimodal

                    H0, W0 = s["img"].shape[:2]
                    s = resize_multimodal(
                        s, (int(W0 * r), int(H0 * r)), keep_ratio=True)
                base = s["img"]
                for fl in flips:
                    arr = np.ascontiguousarray(base[:, ::-1]) if fl else base
                    img, valid = _pad_for_model(arr)
                    p = self.engine.inference(
                        jnp.asarray(img)[None], ori_shape=ori_hw,
                        flip=fl, valid_hw=valid,
                    )
                    acc = p if acc is None else acc + p
            acc = acc / (len(ratios) * len(flips))
            return np.asarray(jnp.argmax(acc, axis=-1), dtype=np.int64)[0]

        done = 0
        for i in range(rank, n, world):
            sample = self.dataset[i]
            gt = sample.get("gt")
            if aug_cfg:
                pred = aug_predict(sample)
                handle(i, sample, gt, pred)
                done += 1
                if progress_every and done % progress_every == 0:
                    print(f"eval {done}/{(n - rank + world - 1) // world}",
                          flush=True)
                continue
            if pipeline is not None:
                sample = pipeline(sample)
            img, ori_hw = _pad_for_model(sample["img"])
            # the engine cuts the pad band off the LOGITS before any
            # mode resize (reference geometry runs exact sizes)
            if buf and (buf[0][3].shape != img.shape or buf[0][4] != ori_hw):
                flush()
            buf.append((i, sample, gt, img, ori_hw))
            if len(buf) >= batch_size:
                flush()
            done += 1
            if progress_every and done % progress_every == 0:
                print(f"eval {done}/{(n - rank + world - 1) // world}",
                      flush=True)
        flush()
        if format_only:
            return {"files": dumped}
        if world > 1 and jax.process_count() > 1:
            flat, nested = self._gather_shards(flat, nested)
        # raw histogram sums on the dense grid — lets callers merge shards
        # themselves (and the sharding test verify shard0+shard1 == full)
        payload = self._densify(flat, nested)
        results_payload = {"flat": payload[0], "nested": payload[1]}
        results: Dict = {"payload": results_payload}
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
            from .metrics import render_nested_report

            text, eval_results, nested_summary = render_nested_report(
                results["nested"], self.dataset.CLASSES
            )
            results["nested_report"] = text
            results["eval_results"] = eval_results
            results["summary"].update(nested_summary)
        return results

    # -- multi-host reduction ------------------------------------------------

    def _key_grid(self):
        conds = list(getattr(self.dataset, "CONDITIONS", ()) or ()) + ["all"]
        cases = list(getattr(self.dataset, "CASES", ()) or ()) + ["ordinary"]
        return conds, cases

    def _densify(self, flat: List[Hist],
                 nested: Dict[str, Dict[str, List[Hist]]]):
        """Histogram sums on the dataset's static CONDITIONS x CASES grid,
        so every process contributes identically-shaped arrays to the
        cross-host allgather (the reference instead pickles result lists
        through collect_results_cpu/gpu, apis/test_bs.py:13)."""
        K = self.num_classes
        flat_sum = (np.stack(_sum_hists(flat)) if flat
                    else np.zeros((4, K), np.float64))
        conds, cases = self._key_grid()
        dense = np.zeros((len(conds), len(cases), 4, K), np.float64)
        for ci, c in enumerate(conds):
            for si, s in enumerate(cases):
                hists = nested.get(c, {}).get(s)
                if hists:
                    dense[ci, si] = np.stack(_sum_hists(hists))
        return flat_sum, dense

    def _undensify(self, flat_sum: np.ndarray, dense: np.ndarray):
        flat = [tuple(flat_sum)] if flat_sum.sum() > 0 else []
        nested: Dict[str, Dict[str, List[Hist]]] = {}
        conds, cases = self._key_grid()
        for ci, c in enumerate(conds):
            for si, s in enumerate(cases):
                if dense[ci, si].sum() > 0:
                    nested.setdefault(c, {}).setdefault(s, []).append(
                        tuple(dense[ci, si])
                    )
        return flat, nested

    def _gather_shards(self, flat, nested):
        from ..parallel.mesh import gather_results

        flat_sum, dense = self._densify(flat, nested)
        g = gather_results({"flat": flat_sum, "nested": dense})
        # process_allgather stacks a leading process axis
        return self._undensify(np.asarray(g["flat"]).sum(0),
                               np.asarray(g["nested"]).sum(0))

    def print_tables(self, results: Dict):
        if "flat" in results:
            print(format_metrics_table(results["flat"], self.dataset.CLASSES))
        if "nested_report" in results:
            # per-(condition x case) tables + per-condition micro tables
            # (reference DELIVER.py:345-487 PrettyTable output)
            print(results["nested_report"])
        if "summary" in results:
            print({k: round(v, 2) for k, v in results["summary"].items()})
