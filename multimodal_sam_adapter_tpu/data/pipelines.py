"""Host-side data pipeline (numpy + cv2), matching the reference transforms.

Re-design of reference mmseg_custom/datasets/pipelines/{loading,transform}.py
as plain functions over a sample dict:
  {'img': (H, W, C) float32 (cv2 BGR channel order, like the reference),
   'gt': (H, W) uint8 or None, 'meta': {...}}

Semantics replicated exactly (mIoU parity dies here first — SURVEY.md "hard
parts" #4):
- multimodal load: cv2 color (BGR) RGB image + per-aux-modality images;
  1-channel aux tiled to 3 channels; channel-concat (loading.py:144-251)
- Resize_multimodal: cv2 bilinear for images / nearest for labels, mmcv
  imrescale (keep_ratio) or imresize; train-time random ratio in
  ratio_range (transform.py:935-1224)
- RandomCrop with cat_max_ratio re-crop loop (transform.py:11-104)
- RandomFlip horizontal
- PhotoMetricDistortion on the RGB slice only (transform.py:2263-2386)
- RandomGaussianBlur on the RGB slice (transform.py:899-934)
- Normalize_multimodal: optional /255 (norm_by_max) then per-modality
  (x - mean) / std with optional BGR->RGB flip (transform.py:2716-2826);
  the MUSES variant divides only the RGB slice by 255
- Pad to crop size, pad_val 0 / seg_pad_val 255
"""
from __future__ import annotations

import os.path as osp
from typing import Dict, Optional, Sequence, Tuple

import cv2
import numpy as np


# ---------------------------------------------------------------------------
# mmcv-compatible resize helpers
# ---------------------------------------------------------------------------

_CV2_INTERP = {
    "nearest": cv2.INTER_NEAREST,
    "bilinear": cv2.INTER_LINEAR,
    "bicubic": cv2.INTER_CUBIC,
}


def imresize(img: np.ndarray, size_wh: Tuple[int, int],
             interpolation: str = "bilinear") -> np.ndarray:
    """mmcv.imresize: size is (w, h)."""
    return cv2.resize(img, size_wh, interpolation=_CV2_INTERP[interpolation])


def rescale_size(old_wh: Tuple[int, int], scale) -> Tuple[int, int]:
    """mmcv.rescale_size: fit (w, h) inside `scale` keeping aspect ratio."""
    w, h = old_wh
    if isinstance(scale, (float, int)) and not isinstance(scale, bool):
        factor = float(scale)
    else:
        max_long, max_short = max(scale), min(scale)
        factor = min(max_long / max(h, w), max_short / min(h, w))
    return int(w * factor + 0.5), int(h * factor + 0.5)


def imrescale(img: np.ndarray, scale, interpolation: str = "bilinear"):
    new_wh = rescale_size((img.shape[1], img.shape[0]), scale)
    return imresize(img, new_wh, interpolation)


def _resize_multichannel(img: np.ndarray, size_wh, interpolation="bilinear"):
    """cv2.resize handles at most 4 channels; resize in channel chunks."""
    C = img.shape[2]
    if C <= 4:
        out = imresize(img, size_wh, interpolation)
        return out[..., None] if out.ndim == 2 else out
    chunks = []
    for s in range(0, C, 4):
        o = imresize(img[..., s : s + 4], size_wh, interpolation)
        chunks.append(o[..., None] if o.ndim == 2 else o)
    return np.concatenate(chunks, axis=2)


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------

def load_multimodal_image(
    img_path: str,
    mod_paths: Sequence[str],
    mod_channels: Sequence[int],
) -> np.ndarray:
    """RGB image (cv2 color/BGR) + aux modalities concat along channels.

    1-channel aux image files are tiled to 3 channels; .npz aux (MUSES)
    loads the 'arr_0' array and expands 2-D maps to ONE channel — exactly
    the reference semantics (loading.py:110-113: np.load(...)['arr_0'],
    np.expand_dims(axis=2)), no tiling.
    """
    img = cv2.imread(img_path, cv2.IMREAD_COLOR).astype(np.float32)
    parts = [img]
    for path, ch in zip(mod_paths, mod_channels):
        if path.endswith(".npz"):
            with np.load(path) as z:
                m = z["arr_0"] if "arr_0" in z else z[list(z.keys())[0]]
            m = np.asarray(m, np.float32)
            if m.ndim == 2:
                m = m[:, :, None]
        elif ch == 1:
            m = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            m = np.tile(np.asarray(m, np.float32)[:, :, None], (1, 1, 3))
        else:
            m = cv2.imread(path, cv2.IMREAD_COLOR).astype(np.float32)
        if m.ndim == 2:
            m = m[:, :, None]
        parts.append(m.astype(np.float32))
    return np.concatenate(parts, axis=2)


def load_bin_ann(path: str, reduce_zero_label: bool = False) -> np.ndarray:
    """Binary annotation load (reference LoadBinAnn, loading.py:611-678).

    Grayscale load, 255 mapped to 1, then the overflow-safe reduce-zero
    variant with the reference's 254 sentinel quirk.
    """
    gt = cv2.imread(path, cv2.IMREAD_GRAYSCALE).astype(np.uint8)
    gt[gt == 255] = 1
    if reduce_zero_label:
        gt = gt.astype(np.int32)
        gt[gt == 0] = 255
        gt = gt - 1
        gt[gt == 254] = 255
        gt = np.clip(gt, 0, 255).astype(np.uint8)
    return gt


def load_annotation(path: str, reduce_zero_label: bool = False) -> np.ndarray:
    gt = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if gt.ndim == 3:
        gt = gt[:, :, 0]
    gt = gt.astype(np.int32)
    if reduce_zero_label:
        # overflow-safe reduce-zero (LoadAnnotationsov, loading.py:543-609)
        gt[gt == 0] = 256
        gt = gt - 1
        gt[gt == 255] = 255
    return np.clip(gt, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# geometric transforms
# ---------------------------------------------------------------------------

def resize_multimodal(sample: Dict, img_scale, keep_ratio: bool = True,
                      seg_scale=None) -> Dict:
    """Deterministic (test-time) resize. img_scale is (w, h) mmcv-style."""
    img = sample["img"]
    if keep_ratio:
        img = _rescale(img, img_scale)
    else:
        img = _resize_multichannel(img, img_scale, "bilinear")
    sample["img"] = img
    if sample.get("gt") is not None:
        scale = seg_scale or img_scale
        if keep_ratio:
            sample["gt"] = imrescale(sample["gt"], scale, "nearest")
        else:
            sample["gt"] = imresize(sample["gt"], scale, "nearest")
    sample.setdefault("meta", {})["img_shape"] = img.shape
    return sample


def _rescale(img, scale):
    new_wh = rescale_size((img.shape[1], img.shape[0]), scale)
    return _resize_multichannel(img, new_wh, "bilinear")


def random_scale_resize(sample: Dict, rng: np.random.Generator, img_scale,
                        ratio_range=(0.5, 2.0)) -> Dict:
    """Train-time random-ratio resize (keep_ratio)."""
    ratio = rng.uniform(*ratio_range)
    base = (int(img_scale[0] * ratio), int(img_scale[1] * ratio))
    img = sample["img"]
    new_wh = rescale_size((img.shape[1], img.shape[0]), base)
    sample["img"] = _resize_multichannel(img, new_wh, "bilinear")
    if sample.get("gt") is not None:
        sample["gt"] = imresize(sample["gt"], new_wh, "nearest")
    return sample


def random_crop(sample: Dict, rng: np.random.Generator,
                crop_size: Tuple[int, int], cat_max_ratio: float = 1.0,
                ignore_index: int = 255,
                retry_multilabel: bool = False) -> Dict:
    """(h, w) crop with the cat_max_ratio re-crop loop (up to 10 tries).

    retry_multilabel=True reproduces RandomCropGen (transform.py:12-104):
    re-crop rounds continue until the crop contains >= 2 distinct labels
    (bounded here at 100 rounds to stay total on degenerate images).
    """
    img = sample["img"]
    ch, cw = crop_size

    def get_bbox():
        mh = max(img.shape[0] - ch, 0)
        mw = max(img.shape[1] - cw, 0)
        y = rng.integers(0, mh + 1)
        x = rng.integers(0, mw + 1)
        return y, y + ch, x, x + cw

    y1, y2, x1, x2 = get_bbox()
    if sample.get("gt") is not None and cat_max_ratio < 1.0:
        for round_ in range(100 if retry_multilabel else 1):
            labels = np.empty(0)
            for try_ in range(10):
                gt = sample["gt"][y1:y2, x1:x2]
                labels, counts = np.unique(gt, return_counts=True)
                counts = counts[labels != ignore_index]
                if len(counts) > 1 and counts.max() / counts.sum() < cat_max_ratio:
                    break
                # mmseg RandomCrop draws a fresh bbox after EVERY failure,
                # including the 10th (the final crop is then unevaluated);
                # RandomCropGen instead keeps the last evaluated bbox so its
                # multilabel check below sees the crop actually used
                if try_ < 9 or not retry_multilabel:
                    y1, y2, x1, x2 = get_bbox()
            else:
                if retry_multilabel and len(labels) < 2:
                    y1, y2, x1, x2 = get_bbox()
                    continue  # RandomCropGen: keep re-cropping
            break
    sample["img"] = img[y1:y2, x1:x2]
    if sample.get("gt") is not None:
        sample["gt"] = sample["gt"][y1:y2, x1:x2]
    return sample


def random_flip(sample: Dict, rng: np.random.Generator, prob: float = 0.5) -> Dict:
    if rng.random() < prob:
        sample["img"] = np.ascontiguousarray(sample["img"][:, ::-1])
        if sample.get("gt") is not None:
            sample["gt"] = np.ascontiguousarray(sample["gt"][:, ::-1])
    return sample


def _imtranslate(img: np.ndarray, dx: float, dy: float, border_value: float,
                 interpolation: str = "bilinear") -> np.ndarray:
    """mmcv.imtranslate: affine shift with constant border."""
    mat = np.float32([[1, 0, dx], [0, 1, dy]])
    flags = _CV2_INTERP[interpolation]
    bv = border_value
    if img.ndim == 3 and img.shape[2] <= 4:
        bv = tuple([float(border_value)] * img.shape[2])
    out = cv2.warpAffine(img, mat, (img.shape[1], img.shape[0]), flags=flags,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=bv)
    if img.ndim == 3 and out.ndim == 2:
        out = out[:, :, None]
    return out


def shift(sample: Dict, rng: np.random.Generator, x_trans: float,
          y_trans: float, prob: float = 0.5, pad_val: float = 0,
          seg_pad_val: int = 0) -> Dict:
    """Random translation (reference Shift, transform.py:2139-2263).

    Shift magnitudes are uniform in [-x_trans, x_trans] / [-y_trans, y_trans].
    The GT uses nearest interpolation (the reference passed bilinear to
    mmcv.imtranslate for label maps — a label-mixing bug we do not replicate).
    """
    if rng.random() < prob:
        dx = rng.uniform(-1, 1) * x_trans
        dy = rng.uniform(-1, 1) * y_trans
        img = sample["img"]
        if img.shape[2] > 4:
            img = np.concatenate([
                _imtranslate(img[..., s : s + 4], dx, dy, pad_val)
                for s in range(0, img.shape[2], 4)
            ], axis=2)
        else:
            img = _imtranslate(img, dx, dy, pad_val)
        sample["img"] = img
        if sample.get("gt") is not None:
            sample["gt"] = _imtranslate(
                sample["gt"], dx, dy, seg_pad_val, "nearest"
            )
    return sample


def crop_rect(sample: Dict, box_crop: Tuple[float, float, float, float]) -> Dict:
    """Fixed fractional-box crop (reference CropRect, transform.py:2827-2933).

    box_crop = (y1, y2, x1, x2) as fractions of the image height/width.
    """
    fy1, fy2, fx1, fx2 = box_crop

    def crop(a):
        y1, y2 = int(fy1 * a.shape[0]), int(fy2 * a.shape[0])
        x1, x2 = int(fx1 * a.shape[1]), int(fx2 * a.shape[1])
        return a[y1:y2, x1:x2]

    sample["img"] = crop(sample["img"])
    if sample.get("gt") is not None:
        sample["gt"] = crop(sample["gt"])
    sample.setdefault("meta", {})["img_shape"] = sample["img"].shape
    return sample


def resize_shortest_edge(sample: Dict, scale, max_size: int) -> Dict:
    """detectron2-style shortest-edge resize (reference ResizeShortestEdge,
    transform.py:3262+): scale the short edge to `scale` unless the long edge
    would exceed `max_size`, in which case fit the long edge to `max_size`."""
    img = sample["img"]
    h, w = img.shape[:2]
    size = float(scale if isinstance(scale, (int, float)) else min(scale))
    f = size / min(h, w)
    nh, nw = (size, f * w) if h < w else (f * h, size)
    if max(nh, nw) > max_size:
        f2 = max_size / max(nh, nw)
        nh, nw = nh * f2, nw * f2
    nh, nw = int(nh + 0.5), int(nw + 0.5)
    sample["img"] = _resize_multichannel(img, (nw, nh), "bilinear")
    if sample.get("gt") is not None:
        sample["gt"] = imresize(sample["gt"], (nw, nh), "nearest")
    sample.setdefault("meta", {})["img_shape"] = sample["img"].shape
    return sample


def setr_resize(sample: Dict, rng: np.random.Generator, img_scale=None,
                multiscale_mode: str = "range", ratio_range=None,
                keep_ratio: bool = True, crop_size=None,
                setr_multi_scale: bool = False) -> Dict:
    """SETR-style multiscale resize (reference SETR_Resize,
    transform.py:105-344): three scale-selection modes (fixed-scale x random
    ratio / random long+short edge in a range / random choice among scales);
    with setr_multi_scale, the sampled short edge is floored at crop_size."""
    scales = ([tuple(img_scale)] if isinstance(img_scale[0], (int, float))
              else [tuple(s) for s in img_scale])
    if ratio_range is not None:
        r = rng.uniform(*ratio_range)
        scale = (int(scales[0][0] * r), int(scales[0][1] * r))
    elif multiscale_mode == "range" and len(scales) == 2:
        longs, shorts = [max(s) for s in scales], [min(s) for s in scales]
        scale = (int(rng.integers(min(longs), max(longs) + 1)),
                 int(rng.integers(min(shorts), max(shorts) + 1)))
    else:  # 'value': random choice
        scale = scales[int(rng.integers(len(scales)))]
    img = sample["img"]
    if setr_multi_scale and keep_ratio and crop_size is not None:
        # reference transform.py:270-281: unconditionally rewrite the scale
        # from the IMAGE's aspect ratio with short edge =
        # max(min(scale), crop_size), so the rescaled short edge equals it
        new_short = max(min(scale), crop_size)
        h, w = img.shape[:2]
        if h > w:
            scale = (new_short * h / w, new_short)
        else:
            scale = (new_short, new_short * w / h)
    if keep_ratio:
        sample["img"] = _rescale(img, scale)
    else:
        sample["img"] = _resize_multichannel(img, scale[::-1], "bilinear")
    if sample.get("gt") is not None:
        if keep_ratio:
            sample["gt"] = imrescale(sample["gt"], scale, "nearest")
        else:
            sample["gt"] = imresize(sample["gt"], scale[::-1], "nearest")
    sample.setdefault("meta", {})["img_shape"] = sample["img"].shape
    return sample


# ---------------------------------------------------------------------------
# photometric transforms (RGB slice only)
# ---------------------------------------------------------------------------

def photometric_distortion(
    sample: Dict, rng: np.random.Generator,
    brightness_delta: float = 32, contrast_range=(0.5, 1.5),
    saturation_range=(0.5, 1.5), hue_delta: int = 18, rgb_ch: int = 3,
) -> Dict:
    """mmseg PhotoMetricDistortion on the first `rgb_ch` channels."""
    img = sample["img"]
    rgb = img[..., :rgb_ch].copy()

    def convert(x, alpha=1.0, beta=0.0):
        return np.clip(x.astype(np.float32) * alpha + beta, 0, 255)

    if rng.integers(2):
        rgb = convert(rgb, beta=rng.uniform(-brightness_delta, brightness_delta))
    contrast_first = rng.integers(2)
    if contrast_first and rng.integers(2):
        rgb = convert(rgb, alpha=rng.uniform(*contrast_range))
    # saturation / hue in HSV
    if rng.integers(2):
        hsv = cv2.cvtColor(rgb.astype(np.uint8), cv2.COLOR_BGR2HSV).astype(np.float32)
        hsv[..., 1] = np.clip(hsv[..., 1] * rng.uniform(*saturation_range), 0, 255)
        rgb = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR).astype(np.float32)
    if rng.integers(2):
        hsv = cv2.cvtColor(rgb.astype(np.uint8), cv2.COLOR_BGR2HSV).astype(np.int32)
        hsv[..., 0] = (hsv[..., 0] + rng.integers(-hue_delta, hue_delta)) % 180
        rgb = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR).astype(np.float32)
    if (not contrast_first) and rng.integers(2):
        rgb = convert(rgb, alpha=rng.uniform(*contrast_range))

    img = img.copy()
    img[..., :rgb_ch] = rgb
    sample["img"] = img
    return sample


def random_gaussian_blur(sample: Dict, rng: np.random.Generator,
                         kernel_size: int = 3, p: float = 0.2,
                         rgb_ch: int = 3) -> Dict:
    if rng.random() < p:
        img = sample["img"].copy()
        img[..., :rgb_ch] = cv2.GaussianBlur(
            img[..., :rgb_ch], (kernel_size, kernel_size), 0
        )
        sample["img"] = img
    return sample


# ---------------------------------------------------------------------------
# normalize / pad
# ---------------------------------------------------------------------------

def normalize_multimodal(
    sample: Dict,
    modalities_ch: Sequence[int],
    means: Sequence[Sequence[float]],
    stds: Sequence[Sequence[float]],
    to_rgb: Sequence[bool],
    norm_by_max: bool = False,
    norm_by_max_rgb_only: bool = False,
) -> Dict:
    """Per-modality (x[/255] - mean) / std with optional BGR->RGB flip.

    norm_by_max_rgb_only=True reproduces the MUSES variant (only the RGB
    slice is divided by 255).
    """
    img = sample["img"]
    out = img.copy()
    start = 0
    for i, ch in enumerate(modalities_ch):
        sl = out[..., start : start + ch]
        if norm_by_max and (i == 0 or not norm_by_max_rgb_only):
            sl = sl / 255.0
        if to_rgb[i] and ch == 3:
            sl = sl[..., ::-1]
        mean = np.asarray(means[i], np.float32)
        std = np.asarray(stds[i], np.float32)
        out[..., start : start + ch] = (sl - mean) / std
        start += ch
    sample["img"] = out
    return sample


def pad_to_size(sample: Dict, size: Tuple[int, int], pad_val: float = 0.0,
                seg_pad_val: int = 255) -> Dict:
    """Pad bottom/right to (h, w)."""
    img = sample["img"]
    ph = max(size[0] - img.shape[0], 0)
    pw = max(size[1] - img.shape[1], 0)
    if ph or pw:
        sample["img"] = np.pad(
            img, ((0, ph), (0, pw), (0, 0)), constant_values=pad_val
        )
        if sample.get("gt") is not None:
            sample["gt"] = np.pad(
                sample["gt"], ((0, ph), (0, pw)), constant_values=seg_pad_val
            )
    sample.setdefault("meta", {})["pad_shape"] = sample["img"].shape
    return sample


# ---------------------------------------------------------------------------
# composed pipelines
# ---------------------------------------------------------------------------

def _normalize_then_pad(sample: Dict, modalities_ch, n: dict,
                        pad_size=None, pad_val: float = 0.0,
                        seg_pad_val: int = 255) -> Dict:
    """normalize_multimodal followed by pad_to_size, fused through the
    native core (native/pipeline_core.cpp) when it is available — one pass
    over the 1024^2 x 6ch float image instead of three (divide/flip-
    subtract-scale, copy, pad). Falls back to the numpy path bit-for-bit
    (tests/test_native.py guards parity)."""
    # n["aux"] is one stats dict (single aux modality) or an aligned list
    # of dicts (multi-aux configs, reference muses.py:30-31 style)
    aux = n["aux"]
    aux_list = list(aux) if isinstance(aux, (list, tuple)) else [
        aux for _ in modalities_ch[1:]
    ]
    means = [n["rgb"]["mean"]] + [a["mean"] for a in aux_list]
    stds = [n["rgb"]["std"]] + [a["std"] for a in aux_list]
    to_rgb = list(n.get("to_rgb", (True,) * len(modalities_ch)))
    norm_by_max = bool(n["norm_by_max"])
    rgb_only = bool(n.get("rgb_only_255", False))
    img = sample["img"]
    fusable = (
        len(modalities_ch) == 2
        and all(c == 3 for c in modalities_ch)
        and img.ndim == 3 and img.shape[2] == sum(modalities_ch)
    )
    if fusable:
        from .native import normalize_pad_native, pad_label_native

        out_hw = (img.shape[0], img.shape[1]) if pad_size is None else (
            max(pad_size[0], img.shape[0]), max(pad_size[1], img.shape[1]))
        div255 = [norm_by_max and (i == 0 or not rgb_only)
                  for i in range(len(modalities_ch))]
        res = normalize_pad_native(img, modalities_ch, means, stds, to_rgb,
                                   div255, out_hw, pad_val)
        if res is not None:
            sample["img"] = res
            gt = sample.get("gt")
            if gt is not None and gt.shape[:2] != out_hw:
                padded = pad_label_native(gt, out_hw, seg_pad_val)
                if padded is None:
                    padded = np.pad(
                        gt, ((0, out_hw[0] - gt.shape[0]),
                             (0, out_hw[1] - gt.shape[1])),
                        constant_values=seg_pad_val)
                sample["gt"] = padded
            sample.setdefault("meta", {})["pad_shape"] = res.shape
            return sample
    sample = normalize_multimodal(sample, modalities_ch, means, stds, to_rgb,
                                  norm_by_max, rgb_only)
    if pad_size is not None:
        sample = pad_to_size(sample, pad_size, pad_val, seg_pad_val)
    return sample


class TrainPipeline:
    """The reference train pipeline composition for all three datasets."""

    def __init__(self, cfg: dict, modalities_ch=(3, 3)):
        self.cfg = cfg
        self.modalities_ch = tuple(modalities_ch)

    def __call__(self, sample: Dict, rng: np.random.Generator) -> Dict:
        c = self.cfg
        if c.get("gaussian_blur"):
            sample = random_gaussian_blur(
                sample, rng, c["gaussian_blur"]["kernel_size"],
                c["gaussian_blur"]["p"],
            )
        sample = random_scale_resize(
            sample, rng, c["resize"]["img_scale"], c["resize"]["ratio_range"]
        )
        sample = random_crop(
            sample, rng, c["crop"]["crop_size"], c["crop"]["cat_max_ratio"]
        )
        sample = random_flip(sample, rng, c["flip"]["prob"])
        if c.get("photometric"):
            sample = photometric_distortion(sample, rng)
        return _normalize_then_pad(
            sample, self.modalities_ch, c["normalize"],
            pad_size=c["pad"]["size"], pad_val=c["pad"]["pad_val"],
            seg_pad_val=c["pad"]["seg_pad_val"],
        )


class TestPipeline:
    """Deterministic eval pipeline: resize (keep_ratio) + normalize."""

    def __init__(self, cfg: dict, modalities_ch=(3, 3), pad_size=None):
        self.cfg = cfg
        self.modalities_ch = tuple(modalities_ch)
        self.pad_size = pad_size

    def __call__(self, sample: Dict, scale_ratio: float = 1.0) -> Dict:
        """scale_ratio != 1 implements the reference's MultiScaleFlipAug
        img_ratios (test.py:135-140 under --aug-test): the test img_scale
        is multiplied by the ratio before the deterministic resize."""
        c = self.cfg
        sample.setdefault("meta", {})["ori_shape"] = sample["img"].shape
        if c.get("resize"):
            scale = c["resize"]["img_scale"]
            if scale_ratio != 1.0:
                scale = (int(scale[0] * scale_ratio),
                         int(scale[1] * scale_ratio))
            sample = resize_multimodal(
                sample, scale,
                keep_ratio=c["resize"].get("keep_ratio", True),
                seg_scale=c["resize"].get("seg_scale"),
            )
        elif scale_ratio != 1.0:
            H, W = sample["img"].shape[:2]
            sample = resize_multimodal(
                sample, (int(W * scale_ratio), int(H * scale_ratio)),
                keep_ratio=True,
            )
        if c.get("pad"):
            # pad-BEFORE-normalize (the FMB quirk, reference
            # configs/FMB/...RGBTHERM.py:83-93) cannot fuse with normalize
            sample = pad_to_size(sample, c["pad"]["size"])
        return _normalize_then_pad(
            sample, self.modalities_ch, c["normalize"],
            pad_size=self.pad_size,
        )
