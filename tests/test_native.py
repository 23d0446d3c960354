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


@pytest.mark.skipif(load_native() is None, reason="native lib unavailable")
def test_train_pipeline_hits_native_path(monkeypatch):
    """TrainPipeline's normalize+pad goes through the fused native core when
    available, and is bit-identical to the numpy fallback."""
    from multimodal_sam_adapter_tpu.data import native as native_mod
    from multimodal_sam_adapter_tpu.data.pipelines import TrainPipeline

    cfg = dict(
        resize=dict(img_scale=(40, 40), ratio_range=(1.0, 1.0)),
        crop=dict(crop_size=(32, 32), cat_max_ratio=1.0),
        flip=dict(prob=0.0),
        normalize=dict(rgb=dict(mean=(0.485, 0.456, 0.406),
                                std=(0.229, 0.224, 0.225)),
                       aux=dict(mean=(0, 0, 0), std=(1, 1, 1)),
                       norm_by_max=True),
        pad=dict(size=(48, 48), pad_val=0.0, seg_pad_val=255),
    )
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (40, 40, 6)).astype(np.float32)
    gt = rng.integers(0, 9, (40, 40)).astype(np.uint8)
    pipe = TrainPipeline(cfg, (3, 3))

    calls = {"n": 0}
    orig = native_mod.normalize_pad_native

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(native_mod, "normalize_pad_native", counting)
    got = pipe({"img": img.copy(), "gt": gt.copy()},
               np.random.default_rng(1))
    assert calls["n"] == 1, "native fused path was not taken"

    monkeypatch.setattr(native_mod, "normalize_pad_native",
                        lambda *a, **k: None)
    want = pipe({"img": img.copy(), "gt": gt.copy()},
                np.random.default_rng(1))
    np.testing.assert_allclose(got["img"], want["img"], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got["gt"], want["gt"])
    assert got["img"].shape == (48, 48, 6)
