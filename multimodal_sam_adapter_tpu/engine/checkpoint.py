"""Checkpoint persistence: orbax save/restore + .pth ingestion entry points.

Replaces the reference's mmcv CheckpointHook + load_checkpoint
(SURVEY.md section 5 'Checkpoint / resume'):
- `save_checkpoint` / `restore_checkpoint`: orbax, keeping at most
  `max_keep` checkpoints plus an optional 'best' (save_best='mIoU')
- `load_torch_checkpoint`: reads a .pth (torch.load) into numpy
- `ingest_sam_pth` / `ingest_convnext_pth`: pretrained ingestion with the
  geometric remaps (engine/convert.py)
- resume carries step/optimizer state ('--resume-from'); weights-only load
  ('--load-from') restores just params/batch_stats
"""
from __future__ import annotations

import os
import os.path as osp
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state, step: int, max_keep: int = 1,
                    tag: Optional[str] = None,
                    meta: Optional[Dict[str, Any]] = None):
    """Save {'step', 'params', 'batch_stats', 'opt_state'} under
    ckpt_dir/step_<N> (or ckpt_dir/<tag>).

    meta: self-describing checkpoint metadata (config name + text, CLASSES,
    PALETTE, version), mirroring the reference's checkpoint meta
    (reference train.py:203-210, read back by test.py as
    model.CLASSES/PALETTE). Stored as meta.json inside the checkpoint dir
    so it survives orbax round-trips and stays human-readable."""
    import json

    os.makedirs(ckpt_dir, exist_ok=True)
    name = tag or f"step_{step}"
    path = osp.abspath(osp.join(ckpt_dir, name))
    payload = {
        "step": np.asarray(step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    _ckptr().save(path, payload, force=True)
    if meta is not None:
        with open(osp.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
    if tag is None and max_keep > 0:
        steps = sorted(
            (int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_")),
        )
        for s in steps[:-max_keep]:
            import shutil

            shutil.rmtree(osp.join(ckpt_dir, f"step_{s}"), ignore_errors=True)
    return path


def restore_checkpoint(path: str, target=None) -> Dict[str, Any]:
    """Restore a checkpoint payload.

    target: optional pytree TEMPLATE with the live state's structure
    ({'step', 'params', 'batch_stats', 'opt_state'}). Without it, orbax
    returns plain nested dicts/lists — fine for reading weights, but the
    optimizer state LOSES its optax container types (MultiStepsState &
    co.), and the first post-resume train step crashes on attribute
    access (caught by the r5 on-chip training soak: resume with
    grad_accum > 1 hit `'dict' object has no attribute gradient_step'`).
    Resume paths must pass the template; weights-only loads may omit it.
    """
    import json

    if target is not None:
        payload = _ckptr().restore(osp.abspath(path),
                                   item=jax.device_get(target))
    else:
        payload = _ckptr().restore(osp.abspath(path))
    meta_path = osp.join(osp.abspath(path), "meta.json")
    if osp.exists(meta_path):
        with open(meta_path) as f:
            payload["meta"] = json.load(f)
    return payload


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not osp.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if d.startswith("step_")]
    if not steps:
        return None
    best = max(steps, key=lambda d: int(d.split("_")[1]))
    return osp.join(ckpt_dir, best)


# ---------------------------------------------------------------------------
# torch .pth ingestion
# ---------------------------------------------------------------------------

def resolve_checkpoint_source(path: str,
                              cache_dir: Optional[str] = None) -> str:
    """Resolve a checkpoint SOURCE to a local filesystem path.

    The reference loads checkpoints from URLs (http/https via the torch
    model zoo) next to plain paths (mmcv_custom/checkpoint.py:364-470 —
    the pavi://, s3:// and open-mmlab:// schemes there are internal
    services with no public equivalent and are intentionally not
    mirrored). Here: http(s):// (and file://) sources download once into
    `cache_dir` (default ~/.cache/multimodal_sam_adapter_tpu/checkpoints,
    override with $MSA_CHECKPOINT_CACHE) keyed by URL hash + basename,
    then load locally; anything else is returned unchanged.
    """
    if not re.match(r"^(https?|file)://", path):
        return path
    import hashlib
    import urllib.request

    cache_dir = (cache_dir or os.environ.get("MSA_CHECKPOINT_CACHE")
                 or osp.expanduser("~/.cache/multimodal_sam_adapter_tpu/"
                                   "checkpoints"))
    os.makedirs(cache_dir, exist_ok=True)
    name = osp.basename(path.split("?")[0]) or "checkpoint"
    dest = osp.join(
        cache_dir, hashlib.sha256(path.encode()).hexdigest()[:16] + "_" + name
    )
    if not osp.exists(dest):
        tmp = dest + ".part"
        urllib.request.urlretrieve(path, tmp)
        os.replace(tmp, dest)
    return dest


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """torch.load -> flat {name: np.ndarray}, unwrapping common containers
    and the DDP 'module.' prefix (reference mmcv_custom/checkpoint.py:43-109).
    `path` may be a URL (see resolve_checkpoint_source)."""
    import torch

    path = resolve_checkpoint_source(path)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    out = {}
    for k, v in ckpt.items():
        if k.startswith("module."):
            k = k[7:]
        if hasattr(v, "numpy"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def ingest_sam_pth(path: str, interaction_indexes=((0, 5), (6, 11), (12, 17),
                                                   (18, 23)),
                   keep_prefix: str = "image_encoder.") -> dict:
    """SAM .pth (full SAM or encoder-only) -> adapter backbone params.

    Mirrors tools/SAM_checkpoint_convert.py (keep image_encoder.*, drop
    neck.*) then converts layouts (engine/convert.py).
    """
    from .convert import convert_sam_encoder

    sd = load_torch_checkpoint(path)
    if any(k.startswith(keep_prefix) for k in sd):
        sd = {k[len(keep_prefix):]: v for k, v in sd.items()
              if k.startswith(keep_prefix)}
    sd = {k: v for k, v in sd.items() if not k.startswith("neck.")}
    return convert_sam_encoder(sd, interaction_indexes)


def ingest_convnext_pth(path: str) -> dict:
    """ImageNet ConvNeXt .pth -> TwinConvNeXt params (both branches)."""
    from .convert import convert_twin_convnext

    return convert_twin_convnext(load_torch_checkpoint(path))


def merge_pretrained(params: dict, pretrained: dict) -> dict:
    """Recursively overwrite init params with pretrained leaves (strict=False:
    unmatched pretrained keys raise, missing ones keep their init)."""
    import copy

    out = copy.deepcopy(params)

    def rec(dst, src, path=""):
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"pretrained key {path + k} not in model params")
            if isinstance(v, dict):
                rec(dst[k], v, path + k + "/")
            else:
                want = np.shape(dst[k])
                got = np.shape(v)
                if want != got:
                    raise ValueError(
                        f"shape mismatch at {path + k}: model {want} vs "
                        f"checkpoint {got}"
                    )
                dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)

    rec(out, pretrained)
    return out
