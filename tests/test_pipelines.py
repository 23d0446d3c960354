"""Data pipeline tests: normalize slicing, pad, crop invariants, loader."""
import numpy as np

from multimodal_sam_adapter_tpu.data.pipelines import (
    normalize_multimodal,
    pad_to_size,
    random_crop,
    random_flip,
    random_scale_resize,
    resize_multimodal,
)
from multimodal_sam_adapter_tpu.data.loader import DataLoader
import pytest

pytestmark = pytest.mark.smoke


def _sample(h=20, w=30, c=6, with_gt=True):
    rng = np.random.default_rng(0)
    s = {"img": rng.uniform(0, 255, (h, w, c)).astype(np.float32)}
    s["gt"] = rng.integers(0, 5, (h, w)).astype(np.uint8) if with_gt else None
    return s


def test_normalize_norm_by_max_and_bgr_flip():
    s = _sample()
    raw = s["img"].copy()
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    out = normalize_multimodal(
        s, (3, 3), means=[mean, (0, 0, 0)], stds=[std, (1, 1, 1)],
        to_rgb=[True, True], norm_by_max=True,
    )["img"]
    # RGB slice: BGR->RGB flip then /255, mean/std
    want_rgb = (raw[..., :3][..., ::-1] / 255.0 - np.array(mean)) / np.array(std)
    np.testing.assert_allclose(out[..., :3], want_rgb, rtol=1e-5, atol=1e-6)
    # aux slice: /255 and channel flip only (mean 0 / std 1)
    np.testing.assert_allclose(out[..., 3:], raw[..., 3:][..., ::-1] / 255.0,
                               rtol=1e-5, atol=1e-6)


def test_normalize_muses_rgb_only_255():
    s = _sample()
    raw = s["img"].copy()
    out = normalize_multimodal(
        s, (3, 3), means=[(0, 0, 0), (1.0, 2.0, 3.0)],
        stds=[(1, 1, 1), (2.0, 2.0, 2.0)], to_rgb=[True, True],
        norm_by_max=True, norm_by_max_rgb_only=True,
    )["img"]
    np.testing.assert_allclose(out[..., :3], raw[..., :3][..., ::-1] / 255.0,
                               rtol=1e-5)
    want_aux = (raw[..., 3:][..., ::-1] - np.array([1, 2, 3.0])) / 2.0
    np.testing.assert_allclose(out[..., 3:], want_aux, rtol=1e-5)


def test_pad_and_crop_shapes():
    s = _sample(20, 30)
    s = pad_to_size(s, (32, 32), pad_val=0, seg_pad_val=255)
    assert s["img"].shape == (32, 32, 6)
    assert s["gt"].shape == (32, 32)
    assert (s["gt"][20:, :] == 255).all()
    rng = np.random.default_rng(1)
    s = random_crop(s, rng, (16, 16), cat_max_ratio=0.75)
    assert s["img"].shape == (16, 16, 6)
    assert s["gt"].shape == (16, 16)


def test_flip_consistency():
    s = _sample()
    img0, gt0 = s["img"].copy(), s["gt"].copy()
    rng = np.random.default_rng(2)
    s = random_flip(s, rng, prob=1.0)
    np.testing.assert_array_equal(s["img"], img0[:, ::-1])
    np.testing.assert_array_equal(s["gt"], gt0[:, ::-1])


def test_resize_keep_ratio():
    s = _sample(100, 200)
    s = resize_multimodal(s, (128, 64), keep_ratio=True)
    # fit 200x100 (w,h) into long 128 short 64 -> factor 0.64 -> 128x64
    assert s["img"].shape[:2] == (64, 128)
    assert s["gt"].shape == (64, 128)


class _ToyDataset:
    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"img": np.full((4, 4, 2), i, np.float32),
                "gt": np.full((4, 4), i, np.uint8),
                "meta": {"i": i}}


def test_loader_sharding_and_determinism():
    ds = _ToyDataset(10)
    seen = set()
    for shard in range(2):
        dl = DataLoader(ds, batch_size=2, shuffle=True, seed=7,
                        num_shards=2, shard_index=shard, drop_last=False)
        dl.set_epoch(3)
        for batch in dl:
            assert batch["img"].shape[1:] == (4, 4, 2)
            seen.update(batch["img"][:, 0, 0, 0].astype(int).tolist())
    assert seen == set(range(10))
    # determinism across runs
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=7,
                    num_shards=2, shard_index=0)
    dl.set_epoch(3)
    a = [b["img"][:, 0, 0, 0].astype(int).tolist() for b in dl]
    dl2 = DataLoader(ds, batch_size=2, shuffle=True, seed=7,
                     num_shards=2, shard_index=0)
    dl2.set_epoch(3)
    b = [bb["img"][:, 0, 0, 0].astype(int).tolist() for bb in dl2]
    assert a == b


def test_extra_transforms():
    from multimodal_sam_adapter_tpu.data.pipelines import (
        crop_rect, resize_shortest_edge, setr_resize, shift,
    )
    rng = np.random.default_rng(3)

    # shift: prob=1 translation by integer offsets moves pixels exactly
    s = _sample(16, 16, 6)
    img0 = s["img"].copy()
    gt0 = s["gt"].copy()

    class FixedRng:
        def random(self):
            return 0.0  # always translate

        def uniform(self, a, b):
            return 1.0  # full positive offset

    out = shift(dict(s), FixedRng(), x_trans=3, y_trans=2, prob=1.0,
                pad_val=7, seg_pad_val=255)
    np.testing.assert_allclose(out["img"][2:, 3:], img0[:-2, :-3], atol=1e-4)
    assert (out["img"][:2] == 7).all() and (out["img"][:, :3] == 7).all()
    np.testing.assert_array_equal(out["gt"][2:, 3:], gt0[:-2, :-3])
    assert (out["gt"][:2] == 255).all()

    # crop_rect: fractional box
    s = _sample(20, 40, 6)
    out = crop_rect(dict(s), (0.25, 0.75, 0.1, 0.6))
    assert out["img"].shape == (10, 20, 6)
    assert out["gt"].shape == (10, 20)

    # resize_shortest_edge: short edge -> scale unless long edge caps
    s = _sample(20, 40, 6)
    out = resize_shortest_edge(dict(s), scale=10, max_size=100)
    assert out["img"].shape[:2] == (10, 20)
    out = resize_shortest_edge(_sample(20, 40, 6), scale=10, max_size=15)
    assert out["img"].shape[1] == 15  # long edge capped

    # setr_resize: 'value' mode picks one of the scales; keep_ratio fits inside
    s = _sample(20, 40, 6)
    out = setr_resize(dict(s), rng, img_scale=[(100, 50), (60, 30)],
                      multiscale_mode="value")
    # keep_ratio factor = min(long/max_side, short/min_side) = 2.5 or 1.5
    assert out["img"].shape[0] in (50, 30)

    # setr_multi_scale: short edge == max(min(scale), crop_size) EXACTLY,
    # derived from the IMAGE aspect ratio (reference transform.py:270-281) —
    # even when the image aspect is more extreme than the scale tuple's
    out = setr_resize(_sample(20, 40, 6), rng, img_scale=(40, 20),
                      ratio_range=(1.0, 1.0), crop_size=30,
                      setr_multi_scale=True)
    assert min(out["img"].shape[:2]) == 30
    out = setr_resize(_sample(20, 80, 6), rng, img_scale=(60, 30),
                      ratio_range=(1.0, 1.0), crop_size=30,
                      setr_multi_scale=True)
    assert min(out["img"].shape[:2]) == 30  # was 15 before the fix
    # and when min(scale) > crop_size the short edge follows the scale
    out = setr_resize(_sample(20, 40, 6), rng, img_scale=(80, 40),
                      ratio_range=(1.0, 1.0), crop_size=30,
                      setr_multi_scale=True)
    assert min(out["img"].shape[:2]) == 40


def test_random_crop_gen_multilabel_retry():
    # GT: two half-plane classes. Only crops crossing the boundary contain
    # 2 labels (and then pass cat_max_ratio); single-label crops always fail,
    # so plain random_crop gives up after 10 tries while the RandomCropGen
    # retry loop keeps going until it lands on the boundary.
    rng = np.random.default_rng(0)
    s = _sample(64, 64, 6)
    gt = np.zeros((64, 64), np.uint8)
    gt[:, :32] = 1
    s["gt"] = gt
    hit = 0
    for i in range(20):
        out = random_crop(dict(s), np.random.default_rng(i), (8, 8),
                          cat_max_ratio=0.99, retry_multilabel=True)
        hit += len(np.unique(out["gt"])) >= 2
    assert hit == 20


def test_load_bin_ann(tmp_path):
    import cv2
    from multimodal_sam_adapter_tpu.data.pipelines import load_bin_ann

    p = str(tmp_path / "ann.png")
    ann = np.zeros((6, 6), np.uint8)
    ann[2:4, 2:4] = 255
    cv2.imwrite(p, ann)
    out = load_bin_ann(p)
    assert set(np.unique(out)) == {0, 1}
    out = load_bin_ann(p, reduce_zero_label=True)
    # 0 -> 255 (ignore), 255 -> 1 -> 0
    assert set(np.unique(out)) == {0, 255}
