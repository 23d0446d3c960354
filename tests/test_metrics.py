"""Metrics tests: intersect/union vs manual counting, flat + nested
aggregation semantics (reference metrics_micro.py)."""
import numpy as np

from multimodal_sam_adapter_tpu.engine.metrics import (
    intersect_and_union,
    pre_eval_to_metrics,
    pre_eval_to_metrics_dict,
)


import pytest

pytestmark = pytest.mark.smoke


def test_intersect_and_union_manual():
    pred = np.array([[0, 0, 1], [1, 2, 2]])
    gt = np.array([[0, 1, 1], [255, 2, 0]])
    inter, union, parea, larea = intersect_and_union(pred, gt, 3)
    # valid pixels: (0,0)=ok c0, (0,1) p0/g1, (0,2) ok c1, (1,1) ok c2, (1,2) p2/g0
    np.testing.assert_array_equal(inter, [1, 1, 1])
    np.testing.assert_array_equal(parea, [2, 1, 2])
    np.testing.assert_array_equal(larea, [2, 2, 1])
    np.testing.assert_array_equal(union, [3, 2, 2])


def test_reduce_zero_label():
    pred = np.array([[0, 1]])
    gt = np.array([[1, 2]])  # becomes [0, 1] after reduce
    inter, *_ = intersect_and_union(pred, gt, 3, reduce_zero_label=True)
    np.testing.assert_array_equal(inter, [1, 1, 0])


def test_flat_miou():
    h1 = intersect_and_union(np.array([[0, 1]]), np.array([[0, 1]]), 2)
    h2 = intersect_and_union(np.array([[1, 1]]), np.array([[0, 1]]), 2)
    m = pre_eval_to_metrics([h1, h2], ("mIoU",))
    # class0: inter 1, union 2 -> 0.5 ; class1: inter 2, union 3
    np.testing.assert_allclose(m["IoU"], [0.5, 2 / 3])
    np.testing.assert_allclose(m["aAcc"], 3 / 4)


def test_nested_dict_aggregation():
    mk = lambda p, g: intersect_and_union(np.array(p), np.array(g), 2)
    nested = {
        "sun": {"ordinary": [mk([[0, 1]], [[0, 1]])],
                "motionblur": [mk([[1, 1]], [[0, 1]])]},
        "rain": {"ordinary": [mk([[0, 0]], [[0, 0]])]},
    }
    out = pre_eval_to_metrics_dict(nested, ("microIoU",), num_classes=2)
    assert "micro_IoU" in out["sun"]
    # sun: inter [1,2], union [2,3] (class-wise across cases)
    np.testing.assert_allclose(out["sun"]["micro_IoU"], [0.5, 2 / 3])
    # global per-condition micro
    np.testing.assert_allclose(out["global"]["sun"]["micro_IoU"], [0.5, 2 / 3])
    # per-case micro across conditions: 'ordinary' inter [3,1], union [3,1]
    np.testing.assert_allclose(out["global"]["ordinary"], [1.0, 1.0])
    # global IoU over everything: inter [3,2], union [4,3]
    np.testing.assert_allclose(out["global"]["IoU"], [3 / 4, 2 / 3])


def test_render_nested_report_shape_and_scalars():
    """Nested report matches the reference's eval_results shape
    (DELIVER.py:261-617): per-cell summary + per-class fractions,
    per-condition micro_IoU, global mMicroIoU / mMicroIoU_per_condition."""
    from multimodal_sam_adapter_tpu.engine.metrics import (
        intersect_and_union,
        pre_eval_to_metrics_dict,
        render_nested_report,
    )

    rng = np.random.default_rng(0)
    K = 4
    names = [f"c{i}" for i in range(K)]
    nested = {}
    for cond in ("cloud", "sun"):
        for case in ("ordinary", "motionblur"):
            pred = rng.integers(0, K, (16, 16))
            gt = rng.integers(0, K, (16, 16))
            nested.setdefault(cond, {}).setdefault(case, []).append(
                intersect_and_union(pred, gt, K))
    ret = pre_eval_to_metrics_dict(nested, ("microIoU",), num_classes=K)
    text, eval_results, summary = render_nested_report(ret, names)

    # text renders one per-class table per cell + per-condition micro tables
    assert " per class cloud_ordinary results:" in text
    assert " per class sun_micro_IoU results:" in text
    assert "Summary  global:" in text

    cell = eval_results["cloud"]["ordinary"]
    assert "mIoU" in cell and "aAcc" in cell
    assert f"IoU.{names[0]}" in cell and 0.0 <= cell["mIoU"] <= 1.0
    micro = eval_results["cloud"]["micro_IoU"]
    assert "mmicroIoU" in micro and f"micro_IoU.{names[1]}" in micro
    # per-case global micro arrays land under global.<case>
    assert "ordinary" in eval_results["global"]
    assert "mMicroIoU" in summary and "mMicroIoU_per_condition" in summary
    assert 0 <= summary["mMicroIoU"] <= 100
    assert abs(eval_results["global"]["mMicroIoU"] * 100
               - summary["mMicroIoU"]) < 1e-6
    # json-serializable end to end
    import json

    json.dumps(eval_results)
