"""FULL-MODEL logit parity vs the reference's own torch code.

One synthetic reference-layout state dict (tests/test_convert_full.py) is
loaded into BOTH:
- the reference's actual torch model, imported from /root/reference via
  tests/reference_oracle.py (SPM: TwinConvNeXt + RoadFormer2Neck ->
  interactions with MSDeformAttn -> pyramid -> SegformerHead ->
  resize-to-input), and
- this framework's EncoderDecoder after convert_full_checkpoint,

and the final logits are compared. This is the integration-level accuracy
evidence the reference itself provides only via published-checkpoint mIoU
tables (reference README "Checkpoints"); here it is exact at f32.

Covered math end to end: adapter_modules...with_cp.py:901-1076 (SPM),
:161-349 (backbone forward), segformer_head.py:48-66 (head),
encoder_decoder.py:87-117 (encode_decode resize).
"""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference/segmentation"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference tree not available"),
]

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from multimodal_sam_adapter_tpu.engine.convert_full import (
    convert_full_checkpoint,
)
from multimodal_sam_adapter_tpu.models.segmentor import EncoderDecoder
from tests.test_convert_full import (
    HEAD_CH, NCLS, IMG, synth_state_dict,
)
from tests.test_model_forward import TINY_BACKBONE as _TINY_ATTO

# the reference neck hardcodes 32-group convs/norms (GFE groups=32,
# FFRM/CA norm GN32, adapter_modules...py:365-370,360), so channels must
# divide 64; 'pico' (64,128,256,512) is the smallest arch that does.
# conv_inplane must satisfy 4*inplane == 2*ch0 (reference fc sizing).
PICO_CH = (64, 128, 256, 512)
PICO_DEPTHS = (2, 2, 6, 2)
TINY_BACKBONE = dict(_TINY_ATTO, arch="pico", conv_inplane=32,
                     drop_path_rate=0.0, conv_drop_path_rate=0.0)


def _sanitize_batchnorm_stats(sd):
    """synth running_var values are ~N(0, 0.05) and can be negative ->
    NaN through rsqrt on both sides; make them valid variances."""
    for k in list(sd):
        if k.endswith("running_var"):
            sd[k] = np.abs(sd[k]) + 0.5
    return sd


def _build_torch_model(sd):
    import torch

    from tests.reference_oracle import load_reference_modules

    ns = load_reference_modules()
    cls = ns.top_backbone.SAMAdapterbimodalMixModNewInTwinConvNEWwithcp
    backbone = cls(
        pretrain_size=TINY_BACKBONE["pretrained_size"],
        num_heads=TINY_BACKBONE["num_heads"],
        conv_inplane=TINY_BACKBONE["conv_inplane"],
        n_points=TINY_BACKBONE["n_points"],
        modalities_name=["rgb", "lidar"],
        modalities_ch=list(TINY_BACKBONE["modalities_ch"]),
        deform_num_heads=TINY_BACKBONE["deform_num_heads"],
        init_values=TINY_BACKBONE["init_values"],
        interaction_indexes=[list(s) for s in
                             TINY_BACKBONE["interaction_indexes"]],
        with_cffn=True,
        cffn_ratio=TINY_BACKBONE["cffn_ratio"],
        deform_ratio=TINY_BACKBONE["deform_ratio"],
        add_vit_feature=True,
        pretrained=None,
        use_extra_extractor=True,
        with_cp=False,
        drop_path_rate=0.0,
        drop_rate=0.0,
        conv_drop_path_rate=0.0,
        drop_multimodal_path=0.0,
        arch=TINY_BACKBONE["arch"],
        checkpoint=None,
        img_size=TINY_BACKBONE["img_size"],
        patch_size=TINY_BACKBONE["patch_size"],
        embed_dim=TINY_BACKBONE["embed_dim"],
        depth=TINY_BACKBONE["depth"],
        window_size=TINY_BACKBONE["window_size"],
        global_attn_indexes=tuple(TINY_BACKBONE["global_attn_indexes"]),
        pretrained_size=TINY_BACKBONE["pretrained_size"],
    )
    bsd = {k[len("backbone."):]: torch.tensor(v) for k, v in sd.items()
           if k.startswith("backbone.")}
    missing, unexpected = backbone.load_state_dict(bsd, strict=False)
    assert not unexpected, unexpected[:10]
    leftovers = [k for k in missing if "num_batches_tracked" not in k]
    assert not leftovers, leftovers[:10]

    head = ns.segformer_head.SegformerHead(
        in_channels=[TINY_BACKBONE["embed_dim"]] * 4,
        in_index=[0, 1, 2, 3],
        channels=HEAD_CH,
        dropout_ratio=0.1,
        num_classes=NCLS,
        norm_cfg=dict(type="SyncBN", requires_grad=True),
        align_corners=False,
        interpolate_mode="bilinear",
    )
    hsd = {k[len("decode_head."):]: torch.tensor(v) for k, v in sd.items()
           if k.startswith("decode_head.")}
    missing, unexpected = head.load_state_dict(hsd, strict=False)
    assert not unexpected, unexpected[:10]
    leftovers = [k for k in missing if "num_batches_tracked" not in k]
    assert not leftovers, leftovers[:10]
    return backbone.eval(), head.eval(), ns


def test_full_model_logits_match_reference_torch():
    import torch

    sd = _sanitize_batchnorm_stats(synth_state_dict(ch=PICO_CH, depths=PICO_DEPTHS))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, IMG, IMG, 6)).astype(np.float32) * 0.5

    backbone, head, ns = _build_torch_model(sd)
    with torch.no_grad():
        feats, _ = backbone(torch.tensor(x).permute(0, 3, 1, 2))
        logits_t = head(feats)
        logits_t = ns.resize(logits_t, size=(IMG, IMG), mode="bilinear",
                             align_corners=False)
    want = logits_t.permute(0, 2, 3, 1).numpy()  # NHWC

    tree = convert_full_checkpoint(
        sd, TINY_BACKBONE["interaction_indexes"])
    model = EncoderDecoder(num_classes=NCLS, head_channels=HEAD_CH,
                           backbone_cfg=TINY_BACKBONE)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(model.apply(
            {"params": tree["params"], "batch_stats": tree["batch_stats"]},
            jnp.asarray(x), train=False))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)
