"""Forward parity of the full Mask2Former head vs the REFERENCE's own torch
head (mmseg_custom/models/decode_heads/mask2former_head.py:579 — pixel
decoder + transformer decoder layers + cls/mask heads), loaded through
tests/reference_oracle_m2f.py.

Technique mirrors tests/test_full_model_parity.py: seed the torch head,
export its state dict, convert with engine/convert_m2f.py, run both
forwards on the same 4-level pyramid, compare every per-layer cls/mask
prediction at f32.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

if not os.path.isdir("/root/reference/segmentation"):  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)

from multimodal_sam_adapter_tpu.engine.convert_m2f import (
    convert_mask2former_head,
)
from multimodal_sam_adapter_tpu.models.mask2former.head import Mask2FormerHead

# small-but-structural operating point: distinct per-level channels (catches
# transposed/misrouted input convs), 3 encoder levels, 4 decoder layers
# (cycles all 3 memory levels + wraps), 8 heads, GN(32) over 64 ch
IN_CHANNELS = [24, 40, 56, 72]
FEAT = 64
NQ = 10
NCLS = 5  # 3 things + 2 stuff
N_DEC = 4
N_ENC = 2
HW0 = 32  # stride-4 level resolution; input notionally 128^2


def _build_torch_head():
    import torch

    from tests.reference_oracle_m2f import load_reference_mask2former

    ns = load_reference_mask2former()
    C = ns.to_cfgdict
    cfg = C(dict(
        in_channels=IN_CHANNELS,
        feat_channels=FEAT,
        out_channels=FEAT,
        num_things_classes=3,
        num_stuff_classes=2,
        num_queries=NQ,
        num_transformer_feat_level=3,
        pixel_decoder=dict(
            type="MSDeformAttnPixelDecoder",
            num_outs=3,
            norm_cfg=dict(type="GN", num_groups=32),
            act_cfg=dict(type="ReLU"),
            encoder=dict(
                type="DetrTransformerEncoder",
                num_layers=N_ENC,
                transformerlayers=dict(
                    type="BaseTransformerLayer",
                    attn_cfgs=dict(
                        type="MultiScaleDeformableAttention",
                        embed_dims=FEAT,
                        num_heads=8,
                        num_levels=3,
                        num_points=4,
                        im2col_step=64,
                        dropout=0.0,
                        batch_first=False,
                        norm_cfg=None,
                        init_cfg=None,
                    ),
                    ffn_cfgs=dict(
                        type="FFN",
                        embed_dims=FEAT,
                        feedforward_channels=1024,
                        num_fcs=2,
                        ffn_drop=0.0,
                        act_cfg=dict(type="ReLU", inplace=True),
                    ),
                    operation_order=("self_attn", "norm", "ffn", "norm"),
                ),
                init_cfg=None,
            ),
            positional_encoding=dict(
                type="SinePositionalEncoding", num_feats=FEAT // 2,
                normalize=True),
            init_cfg=None,
        ),
        enforce_decoder_input_project=False,
        positional_encoding=dict(
            type="SinePositionalEncoding", num_feats=FEAT // 2,
            normalize=True),
        transformer_decoder=dict(
            type="DetrTransformerDecoder",
            return_intermediate=False,
            num_layers=N_DEC,
            transformerlayers=dict(
                type="DetrTransformerDecoderLayer",
                attn_cfgs=dict(
                    type="MultiheadAttention",
                    embed_dims=FEAT,
                    num_heads=8,
                    attn_drop=0.0,
                    proj_drop=0.0,
                    dropout_layer=None,
                    batch_first=False,
                ),
                ffn_cfgs=dict(
                    embed_dims=FEAT,
                    feedforward_channels=2048,
                    num_fcs=2,
                    act_cfg=dict(type="ReLU", inplace=True),
                    ffn_drop=0.0,
                    dropout_layer=None,
                    add_identity=True,
                ),
                feedforward_channels=2048,
                operation_order=("cross_attn", "norm", "self_attn", "norm",
                                 "ffn", "norm"),
            ),
            init_cfg=None,
        ),
        loss_cls=dict(type="CrossEntropyLoss",
                      class_weight=[1.0] * NCLS + [0.1]),
        loss_mask=dict(type="CrossEntropyLoss", use_sigmoid=True),
        loss_dice=dict(type="DiceLoss"),
        train_cfg=None,
        test_cfg=None,
    ))
    torch.manual_seed(0)
    head = ns.head.Mask2FormerHead(**cfg)
    head.eval()
    return head, ns


def test_mask2former_head_forward_matches_reference_torch():
    import torch

    head, ns = _build_torch_head()
    sd = {k: v.detach().numpy() for k, v in head.state_dict().items()}

    rng = np.random.default_rng(0)
    feats_nhwc = [
        rng.standard_normal((1, HW0 // (2 ** i), HW0 // (2 ** i), c))
        .astype(np.float32)
        for i, c in enumerate(IN_CHANNELS)
    ]
    feats_t = [torch.tensor(f).permute(0, 3, 1, 2) for f in feats_nhwc]
    with torch.no_grad():
        cls_t, mask_t = head(feats_t, img_metas=[{}])
    want_cls = [c.detach().numpy() for c in cls_t]
    want_mask = [m.detach().numpy() for m in mask_t]

    model = Mask2FormerHead(num_classes=NCLS, feat_channels=FEAT,
                            num_queries=NQ, num_decoder_layers=N_DEC,
                            num_encoder_layers=N_ENC)
    params = convert_mask2former_head(sd)
    # shape-check against a fresh init (catches silently-missing leaves)
    init = model.init(jax.random.PRNGKey(0),
                      [jnp.asarray(f) for f in feats_nhwc], train=False)

    def _leaves(t, p=""):
        out = {}
        for k, v in t.items():
            q = f"{p}/{k}"
            out.update(_leaves(v, q) if isinstance(v, dict) else {q: v.shape})
        return out

    want_shapes = _leaves(init["params"])
    got_shapes = _leaves(params)
    assert set(want_shapes) == set(got_shapes), (
        sorted(set(want_shapes) ^ set(got_shapes))[:10]
    )
    bad = [k for k in want_shapes if want_shapes[k] != got_shapes[k]]
    assert not bad, [(k, want_shapes[k], got_shapes[k]) for k in bad[:5]]

    with jax.default_matmul_precision("highest"):
        all_cls, all_masks = jax.jit(
            lambda v, fs: model.apply(v, fs, train=False)
        )({"params": params}, [jnp.asarray(f) for f in feats_nhwc])

    assert len(all_cls) == len(want_cls) == N_DEC + 1
    for i, (gc, gm, wc, wm) in enumerate(
            zip(all_cls, all_masks, want_cls, want_mask)):
        np.testing.assert_allclose(
            np.asarray(gc), wc, rtol=2e-3, atol=2e-3,
            err_msg=f"cls logits diverge at decoder layer {i}")
        np.testing.assert_allclose(
            np.asarray(gm), wm, rtol=2e-3, atol=2e-3,
            err_msg=f"mask logits diverge at decoder layer {i}")
