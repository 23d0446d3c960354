"""--cfg-options override semantics (reference: mmcv Config.merge_from_dict,
used by reference train.py:86-90 via --cfg-options / --options)."""
import pytest

from multimodal_sam_adapter_tpu.configs import get_config
from multimodal_sam_adapter_tpu.configs.registry import apply_overrides

pytestmark = pytest.mark.smoke


def test_overrides_existing_and_literal_types():
    cfg = get_config("deliver_rgblidar")
    apply_overrides(cfg, {
        "optimizer.base_lr": "1e-5",
        "data.samples_per_gpu": "2",
        "evaluation.metric": "mIoU",
    })
    assert cfg["optimizer"]["base_lr"] == 1e-5
    assert cfg["data"]["samples_per_gpu"] == 2
    assert cfg["evaluation"]["metric"] == "mIoU"


def test_overrides_create_missing_intermediate_dicts():
    # mmcv merge_from_dict creates intermediate keys; optional blocks like
    # log_config must be settable per-run without per-config declarations
    cfg = get_config("deliver_rgblidar")
    assert "log_config" not in cfg
    apply_overrides(cfg, {"log_config.interval": "8"})
    assert cfg["log_config"] == {"interval": 8}


def test_overrides_nested_list_value():
    cfg = get_config("deliver_rgblidar")
    apply_overrides(cfg, {"train_pipeline.crop.crop_size": "(512, 512)"})
    assert cfg["train_pipeline"]["crop"]["crop_size"] == (512, 512)
