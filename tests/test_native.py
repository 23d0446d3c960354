"""Native pipeline core vs the numpy reference path."""
import numpy as np
import pytest

from multimodal_sam_adapter_tpu.data.native import (
    load_native,
    normalize_pad_native,
    pad_label_native,
)
from multimodal_sam_adapter_tpu.data.pipelines import (
    normalize_multimodal,
    pad_to_size,
)


@pytest.mark.skipif(load_native() is None, reason="native lib unavailable")
def test_fused_normalize_pad_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (20, 30, 6)).astype(np.float32)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)

    s = {"img": img.copy(), "gt": None}
    s = normalize_multimodal(
        s, (3, 3), means=[mean, (0, 0, 0)], stds=[std, (1, 1, 1)],
        to_rgb=[True, True], norm_by_max=True,
    )
    # numpy path pads AFTER normalize with raw 0 (train-pipeline semantics)
    want = np.zeros((32, 32, 6), np.float32)
    want[:20, :30] = s["img"]

    got = normalize_pad_native(
        img, (3, 3), means=[mean, (0, 0, 0)], stds=[std, (1, 1, 1)],
        to_rgb=[True, True], div255=[True, True], out_hw=(32, 32),
        pad_val=0.0,
    )
    assert got is not None
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(load_native() is None, reason="native lib unavailable")
def test_pad_label_matches_numpy():
    rng = np.random.default_rng(1)
    lab = rng.integers(0, 25, (20, 30)).astype(np.uint8)
    got = pad_label_native(lab, (32, 32), 255)
    want = np.pad(lab, ((0, 12), (0, 2)), constant_values=255)
    np.testing.assert_array_equal(got, want)
