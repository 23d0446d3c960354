"""Single-image inference API.

Re-design of reference mmseg_custom/apis/inference.py:12-130:
- `init_segmentor(config_name, checkpoint)` -> (model, variables, engine)
- `inference_segmentor(handle, img_path[, mod_path])` -> class map
- `show_result_pyplot` -> palette blend (engine/visualize.py)
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class SegmentorHandle:
    def __init__(self, model, variables, engine, cfg):
        self.model = model
        self.variables = variables
        self.engine = engine
        self.cfg = cfg


def init_segmentor(config_name: str, checkpoint: Optional[str] = None,
                   bf16: bool = True) -> SegmentorHandle:
    import jax
    import jax.numpy as jnp

    from ..configs import get_config
    from ..engine.checkpoint import restore_checkpoint
    from ..engine.inference import InferenceEngine
    from ..models.segmentor import EncoderDecoder

    cfg = get_config(config_name)
    m = cfg["model"]
    model = EncoderDecoder(
        num_classes=m["num_classes"], head_channels=m["head_channels"],
        dropout_ratio=m["dropout_ratio"], backbone_cfg=m["backbone"],
        head_type=m.get("head_type", "segformer"),
        head_cfg=m.get("head"),
        dtype=jnp.bfloat16 if bf16 else None,
    )
    if checkpoint:
        payload = restore_checkpoint(checkpoint)
        variables = {"params": payload["params"],
                     "batch_stats": payload["batch_stats"]}
    else:
        in_ch = sum(cfg["dataset"]["modalities_ch"])
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, in_ch), jnp.float32), train=False,
        )
    engine = InferenceEngine(model, variables, cfg["test_cfg"])
    return SegmentorHandle(model, variables, engine, cfg)


def inference_segmentor(handle: SegmentorHandle, img_path: str,
                        mod_path: Optional[str] = None) -> np.ndarray:
    """Run the test pipeline + inference on one image (+ aux modality)."""
    import jax.numpy as jnp

    from ..data.pipelines import TestPipeline, load_multimodal_image
    from ..engine.evaluator import _pad_for_model

    cfg = handle.cfg
    mods_ch = cfg["dataset"]["modalities_ch"]
    img = load_multimodal_image(
        img_path, [mod_path] if mod_path else [], mods_ch[1:] if mod_path else []
    )
    if not mod_path and sum(mods_ch) > img.shape[2]:
        # aux modality missing: zero-fill its channels
        pad_c = sum(mods_ch) - img.shape[2]
        img = np.concatenate([img, np.zeros_like(img[..., :pad_c])], axis=2)
    sample = {"img": img, "gt": None, "meta": {}}
    pipe = TestPipeline(cfg["test_pipeline"], mods_ch)
    sample = pipe(sample)
    arr, ori_hw = _pad_for_model(sample["img"])
    pred = handle.engine.predict(jnp.asarray(arr[None]))[0]
    mode = handle.engine.test_cfg.get("mode", "whole")
    if mode in ("whole", "slide"):
        pred = pred[: ori_hw[0], : ori_hw[1]]
    return pred


def show_result_pyplot(handle: SegmentorHandle, img_path: str,
                       result: np.ndarray, opacity: float = 0.5,
                       out_file: Optional[str] = None):
    import cv2

    from ..data.datasets import _DATASETS
    from ..engine.visualize import show_result

    ds_cls = _DATASETS[handle.cfg["dataset"]["type"]]
    img = cv2.imread(img_path, cv2.IMREAD_COLOR)
    return show_result(img, result, ds_cls.PALETTE, opacity, out_file)
