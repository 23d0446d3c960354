"""ctypes bindings for the native pipeline core (native/pipeline_core.cpp).

Auto-builds the .so on first use if g++ is available; all entry points fall
back to the numpy implementations in pipelines.py when unavailable, so the
framework stays pure-python-capable.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = osp.join(_repo_root(), "native", "libmsa_pipeline.so")
    if not osp.exists(so):
        build = osp.join(_repo_root(), "native", "build.sh")
        try:
            subprocess.run(["bash", build], check=True, capture_output=True,
                           timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.msa_normalize_pad.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_float,
    ]
    lib.msa_pad_label.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_uint8,
    ]
    _LIB = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def normalize_pad_native(
    img: np.ndarray,
    modalities_ch: Sequence[int],
    means: Sequence[Sequence[float]],
    stds: Sequence[Sequence[float]],
    to_rgb: Sequence[bool],
    div255: Sequence[bool],
    out_hw,
    pad_val: float = 0.0,
) -> Optional[np.ndarray]:
    """Fused normalize+flip+pad. Returns None if the native lib is missing.

    mean/std are given per modality in DESTINATION (post-flip) channel order,
    matching pipelines.normalize_multimodal semantics.
    """
    lib = load_native()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    out = np.empty((out_hw[0], out_hw[1], c), np.float32)
    ch = np.asarray(modalities_ch, np.int32)
    mean = np.concatenate([np.asarray(m, np.float32) for m in means])
    std = np.concatenate([np.asarray(s, np.float32) for s in stds])
    flip = np.asarray([1 if f else 0 for f in to_rgb], np.int32)
    d255 = np.asarray([1 if d else 0 for d in div255], np.int32)
    lib.msa_normalize_pad(
        _fptr(img), h, w, c, _fptr(out), out.shape[0], out.shape[1],
        len(modalities_ch), _iptr(ch), _fptr(mean), _fptr(std),
        _iptr(flip), _iptr(d255), ctypes.c_float(pad_val),
    )
    return out


def pad_label_native(lab: np.ndarray, out_hw, pad_val: int = 255
                     ) -> Optional[np.ndarray]:
    lib = load_native()
    if lib is None:
        return None
    lab = np.ascontiguousarray(lab, np.uint8)
    out = np.empty(out_hw, np.uint8)
    lib.msa_pad_label(
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lab.shape[0], lab.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.shape[0], out.shape[1], pad_val,
    )
    return out
