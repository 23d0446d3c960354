"""Interpolation primitives with torch-`F.interpolate` parity.

The reference model resizes feature maps and embedding tables in several
places (pos-embed bicubic resize, rel-pos table linear resize, pyramid
bilinear up/down-scales, logit resizing). Those use torch semantics:
half-pixel (align_corners=False) sampling, no antialiasing, and a
Catmull-Rom-style cubic kernel with a = -0.75. mIoU parity dies on
interpolation mismatches first, so these helpers replicate torch exactly.

Reference behaviours replicated:
- bilinear resize: torch.nn.functional.interpolate(mode='bilinear',
  align_corners=False)  (e.g. encoder_decoder.py logit resize,
  backbone add_vit_feature)
- bicubic resize: F.interpolate(mode='bicubic', align_corners=False)
  (pos-embed resize, image_encoder_adapter...with_cp.py:140)
- 1-D linear: F.interpolate(mode='linear') for rel-pos tables
  (base/image_encoder.py:570-575)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _axis_weights_linear(in_size: int, out_size: int):
    """Half-pixel linear sampling: indices + weights along one axis.

    Computed in float64 numpy (shapes are static, so these are compile-time
    constants) — f32 rounding near integer source coordinates would pick the
    wrong tap.
    """
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    i0 = np.floor(src)
    t = src - i0
    i0 = i0.astype(np.int32)
    idx = np.stack([np.clip(i0, 0, in_size - 1),
                    np.clip(i0 + 1, 0, in_size - 1)], axis=-1)  # (out, 2)
    w = np.stack([1.0 - t, t], axis=-1).astype(np.float32)  # (out, 2)
    return idx, w


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch bicubic convolution kernel (a = -0.75)."""
    at = np.abs(t)
    at2 = at * at
    at3 = at2 * at
    w1 = (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0            # |t| <= 1
    w2 = a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a   # 1 < |t| < 2
    return np.where(at <= 1.0, w1, np.where(at < 2.0, w2, 0.0))


def _axis_weights_cubic(in_size: int, out_size: int):
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int32)
    t = src - np.floor(src)
    # taps at i0-1, i0, i0+1, i0+2 with clamped (replicate-edge) indexing
    idx = np.stack([np.clip(i0 + d, 0, in_size - 1) for d in (-1, 0, 1, 2)],
                   axis=-1)  # (out, 4)
    w = np.stack([_cubic_kernel(t + 1.0), _cubic_kernel(t),
                  _cubic_kernel(1.0 - t), _cubic_kernel(2.0 - t)],
                 axis=-1).astype(np.float32)
    return idx, w


_MM_MAX_ELEMS = 8 << 20  # dense (out, in) weight-matrix size cap


def _axis_matrix(idx: np.ndarray, w: np.ndarray, in_size: int) -> np.ndarray:
    """Dense (out, in) resampling matrix from per-output tap indices/weights.

    np.add.at folds clamped duplicate taps (edge replication) into one entry.
    """
    out_size, taps = idx.shape
    mat = np.zeros((out_size, in_size), np.float32)
    rows = np.repeat(np.arange(out_size), taps)
    np.add.at(mat, (rows, idx.reshape(-1)), w.reshape(-1).astype(np.float64))
    return mat


def _resize_axis(x: jnp.ndarray, axis: int, idx: np.ndarray,
                 w: np.ndarray, in_size: int) -> jnp.ndarray:
    """Apply a separable 1-D resampling along `axis`.

    TPU-first formulation: the resample is a CONSTANT (out, in) matrix, so
    it runs as one MXU contraction instead of a gather — XLA gathers are
    both slower at these shapes and subject to runtime regressions (the
    2026-08 libtpu episode made them ~100x slower; see docs/DESIGN.md).
    Measured on v5e: the 16x ViT-feature upsample (64^2 -> 256^2 x 1024ch)
    drops 4.04 -> ~0.4 ms. Falls back to the gather form when the matrix
    would be huge (never at model shapes).
    """
    out_size = idx.shape[0]
    if out_size * in_size <= _MM_MAX_ELEMS:
        mat = jnp.asarray(_axis_matrix(idx, w, in_size), x.dtype)
        moved = jnp.moveaxis(x, axis, 0)
        flat = moved.reshape(in_size, -1)
        out = jax.lax.dot_general(
            mat, flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.reshape((out_size,) + moved.shape[1:])
        return jnp.moveaxis(out, 0, axis)
    taps = idx.shape[-1]
    idx_j = jnp.asarray(idx)
    moved = jnp.moveaxis(x, axis, 0)
    gathered = moved[idx_j.reshape(-1)]  # (out*taps, ...)
    gathered = gathered.reshape((idx.shape[0], taps) + moved.shape[1:])
    wshape = (idx.shape[0], taps) + (1,) * (moved.shape.__len__() - 1)
    out = jnp.sum(
        gathered * jnp.asarray(w).reshape(wshape).astype(gathered.dtype),
        axis=1,
    )
    return jnp.moveaxis(out, 0, axis)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _resize_hw(x, out_h: int, out_w: int, kind: str):
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    mk = _axis_weights_linear if kind == "linear" else _axis_weights_cubic
    # einsum over the middle axis, leaving the contraction-axis handling
    # to XLA: the explicit moveaxis+reshape+dot forced materialized
    # transposes around every resize (~650 MB of copies per flagship
    # forward, r5 HLO audit). Probe (scripts/tpu_resize_probe.py):
    # bit-exact, 1.3-7x faster at every model shape.
    if in_h != out_h:
        idx, w = mk(in_h, out_h)
        if idx.shape[0] * in_h <= _MM_MAX_ELEMS:
            mat = jnp.asarray(_axis_matrix(idx, w, in_h), x.dtype)
            x = jnp.einsum("...hwc,ph->...pwc", x, mat,
                           preferred_element_type=jnp.float32).astype(x.dtype)
        else:
            x = _resize_axis(x, h_axis, idx, w, in_h)
    if in_w != out_w:
        idx, w = mk(in_w, out_w)
        if idx.shape[0] * in_w <= _MM_MAX_ELEMS:
            mat = jnp.asarray(_axis_matrix(idx, w, in_w), x.dtype)
            x = jnp.einsum("...hwc,qw->...hqc", x, mat,
                           preferred_element_type=jnp.float32).astype(x.dtype)
        else:
            x = _resize_axis(x, w_axis, idx, w, in_w)
    return x


def resize_bilinear(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear resize of an NHWC (or HWC) array, torch align_corners=False.

    No antialiasing on downscale, matching torch's default interpolate.
    """
    return _resize_hw(x, int(out_hw[0]), int(out_hw[1]), "linear")


def resize_bicubic(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bicubic (a=-0.75) resize of an NHWC (or HWC) array, torch parity."""
    return _resize_hw(x, int(out_hw[0]), int(out_hw[1]), "cubic")


def interp_linear_1d(table: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """1-D linear resize along axis 0 of a (L, C) table.

    Matches torch F.interpolate(mode='linear', align_corners=False) as used
    for rel-pos table resizing (reference base/image_encoder.py:570-575).
    """
    if table.shape[0] == new_len:
        return table
    idx, w = _axis_weights_linear(table.shape[0], new_len)
    return _resize_axis(table, 0, idx, w, table.shape[0])
