"""Prediction visualization: palette blending dumps.

Re-design of the reference's show_result path (apis/test_bs.py:290-316 +
BaseSegmentor.show_result): blend the palette-colored prediction over the
RGB image with `opacity`, write to out_dir/prediction/<condition>/<case>/.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Optional, Sequence

import cv2
import numpy as np


def colorize(pred: np.ndarray, palette: Sequence[Sequence[int]]) -> np.ndarray:
    pal = np.asarray(palette, np.uint8)
    return pal[np.clip(pred, 0, len(pal) - 1)]


def show_result(
    img_bgr: np.ndarray,
    pred: np.ndarray,
    palette,
    opacity: float = 0.5,
    out_file: Optional[str] = None,
) -> np.ndarray:
    color = colorize(pred, palette)[:, :, ::-1]  # palette is RGB; write BGR
    if img_bgr.shape[:2] != color.shape[:2]:
        img_bgr = cv2.resize(img_bgr, (color.shape[1], color.shape[0]))
    blended = (img_bgr * (1 - opacity) + color * opacity).astype(np.uint8)
    if out_file:
        os.makedirs(osp.dirname(out_file), exist_ok=True)
        cv2.imwrite(out_file, blended)
    return blended


def dump_prediction(out_dir: str, condition: Optional[str],
                    case: Optional[str], name: str, img_bgr, pred, palette,
                    opacity: float = 0.5):
    sub = osp.join(out_dir, "prediction", condition or "all",
                   case or "ordinary")
    return show_result(img_bgr, pred, palette, opacity,
                       osp.join(sub, name))
