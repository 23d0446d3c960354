"""Full-checkpoint converter coverage test.

Generates a synthetic torch-layout state dict for the TINY config, following
the reference module structure (adapter_modules...py / twin_convnext.py /
image_encoder...py / SegformerHead), converts it with
convert_full_checkpoint, and requires an EXACT bijection with the flax
init tree: every torch key maps to an existing leaf with matching shape, and
every model leaf is covered. This is the gate for logit-parity evaluation of
published checkpoints.
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_sam_adapter_tpu.engine.convert_full import (
    convert_full_checkpoint,
)
from multimodal_sam_adapter_tpu.models.segmentor import EncoderDecoder
from tests.test_model_forward import TINY_BACKBONE

pytestmark = pytest.mark.slow

EMBED = TINY_BACKBONE["embed_dim"]          # 32
HEADS = TINY_BACKBONE["num_heads"]          # 2
DEPTH = TINY_BACKBONE["depth"]              # 4
GRID = TINY_BACKBONE["pretrained_size"] // 16  # 4
WIN = TINY_BACKBONE["window_size"]          # 2
GLOBAL = TINY_BACKBONE["global_attn_indexes"]
DEF_HEADS = TINY_BACKBONE["deform_num_heads"]  # 4
NPTS = TINY_BACKBONE["n_points"]            # 2
RATIO = TINY_BACKBONE["deform_ratio"]       # 0.5
CFFN = TINY_BACKBONE["cffn_ratio"]          # 0.25
IMG = TINY_BACKBONE["img_size"]             # 64
CH = (40, 80, 160, 320)                     # atto
DEPTHS = (2, 2, 6, 2)
HEAD_CH, NCLS = 16, 7


def synth_state_dict(ch=CH, depths=DEPTHS, cfg=None, head_ch=None,
                     ncls=None):
    """Synthetic reference-layout state dict.

    cfg: backbone-config dict (TINY_BACKBONE by default). Passing the
    flagship dims (embed 1024 / 16 heads / window 14 / pretrained 1024)
    generates a production-geometry checkpoint for the flagship parity
    test."""
    bc = TINY_BACKBONE if cfg is None else cfg
    CH, DEPTHS = ch, depths  # noqa: N806 — allow arch overrides (e.g. pico)
    EMBED = bc["embed_dim"]                          # noqa: N806
    HEADS = bc["num_heads"]                          # noqa: N806
    DEPTH = bc["depth"]                              # noqa: N806
    GRID = bc["pretrained_size"] // bc["patch_size"]  # noqa: N806
    WIN = bc["window_size"]                          # noqa: N806
    GLOBAL = bc["global_attn_indexes"]               # noqa: N806
    DEF_HEADS = bc["deform_num_heads"]               # noqa: N806
    NPTS = bc["n_points"]                            # noqa: N806
    RATIO = bc["deform_ratio"]                       # noqa: N806
    CFFN = bc["cffn_ratio"]                          # noqa: N806
    IMG = bc["img_size"]                             # noqa: N806
    HEAD_CH = globals()["HEAD_CH"] if head_ch is None else head_ch  # noqa
    NCLS = globals()["NCLS"] if ncls is None else ncls  # noqa: N806
    sd = {}

    def add(name, *shape):
        sd[name] = np.random.default_rng(abs(hash(name)) % 2**32) \
            .standard_normal(shape).astype(np.float32) * 0.05

    # --- ViT
    add("backbone.pos_embed", 1, GRID, GRID, EMBED)
    add("backbone.patch_embed.proj.weight", EMBED, 3, 16, 16)
    add("backbone.patch_embed.proj.bias", EMBED)
    for i in range(DEPTH):
        win = GRID if i in GLOBAL else WIN
        b = f"backbone.blocks.{i}"
        add(f"{b}.norm1.weight", EMBED)
        add(f"{b}.norm1.bias", EMBED)
        add(f"{b}.attn.qkv.weight", 3 * EMBED, EMBED)
        add(f"{b}.attn.qkv.bias", 3 * EMBED)
        add(f"{b}.attn.proj.weight", EMBED, EMBED)
        add(f"{b}.attn.proj.bias", EMBED)
        add(f"{b}.attn.rel_pos_h", 2 * win - 1, EMBED // HEADS)
        add(f"{b}.attn.rel_pos_w", 2 * win - 1, EMBED // HEADS)
        add(f"{b}.norm2.weight", EMBED)
        add(f"{b}.norm2.bias", EMBED)
        add(f"{b}.mlp.lin1.weight", 4 * EMBED, EMBED)
        add(f"{b}.mlp.lin1.bias", 4 * EMBED)
        add(f"{b}.mlp.lin2.weight", EMBED, 4 * EMBED)
        add(f"{b}.mlp.lin2.bias", EMBED)

    # --- level embed / up / final norms
    add("backbone.level_embed", 3, EMBED)
    add("backbone.up.weight", EMBED, EMBED, 2, 2)
    add("backbone.up.bias", EMBED)
    for i in range(1, 5):
        for leaf, shape in (("weight", (EMBED,)), ("bias", (EMBED,)),
                            ("running_mean", (EMBED,)),
                            ("running_var", (EMBED,))):
            add(f"backbone.norm{i}.{leaf}", *shape)

    # --- twin ConvNeXt (both branches from one ImageNet layout + _x/_y)
    for br in ("x", "y"):
        add(f"backbone.spm.twin_conv.downsample_layers_{br}.0.0.weight",
            CH[0], 3, 4, 4)
        add(f"backbone.spm.twin_conv.downsample_layers_{br}.0.0.bias", CH[0])
        add(f"backbone.spm.twin_conv.downsample_layers_{br}.0.1.weight", CH[0])
        add(f"backbone.spm.twin_conv.downsample_layers_{br}.0.1.bias", CH[0])
        for i in range(1, 4):
            add(f"backbone.spm.twin_conv.downsample_layers_{br}.{i}.0.weight",
                CH[i - 1])
            add(f"backbone.spm.twin_conv.downsample_layers_{br}.{i}.0.bias",
                CH[i - 1])
            add(f"backbone.spm.twin_conv.downsample_layers_{br}.{i}.1.weight",
                CH[i], CH[i - 1], 2, 2)
            add(f"backbone.spm.twin_conv.downsample_layers_{br}.{i}.1.bias",
                CH[i])
        for i, (d, c) in enumerate(zip(DEPTHS, CH)):
            for j in range(d):
                s = f"backbone.spm.twin_conv.stages_{br}.{i}.{j}"
                add(f"{s}.depthwise_conv.weight", c, 1, 7, 7)
                add(f"{s}.depthwise_conv.bias", c)
                add(f"{s}.norm.weight", c)
                add(f"{s}.norm.bias", c)
                add(f"{s}.pointwise_conv1.weight", 4 * c, c)
                add(f"{s}.pointwise_conv1.bias", 4 * c)
                add(f"{s}.pointwise_conv2.weight", c, 4 * c)
                add(f"{s}.pointwise_conv2.bias", c)
                add(f"{s}.gamma", c)
            add(f"backbone.spm.twin_conv.norm_{br}{i}.weight", c)
            add(f"backbone.spm.twin_conv.norm_{br}{i}.bias", c)

    # --- fusion neck
    concat = [2 * c for c in CH]
    for i, cc in enumerate(concat):
        half = cc // 2
        groups = math.gcd(32, half)
        for mod in ("rgb", "sne"):
            g = f"backbone.spm.smart_fusion.global_feature_encoder_{mod}.{i}"
            add(f"{g}.norm1.body.weight", half)
            add(f"{g}.norm1.body.bias", half)
            add(f"{g}.attn.scale", 8, 1, 1)
            add(f"{g}.attn.scale2")
            add(f"{g}.attn.qkv1.weight", 3 * half, half // groups, 1, 1)
            add(f"{g}.attn.qkv2.weight", 3 * half, 3 * half // groups, 3, 3)
            add(f"{g}.attn.proj.weight", half, half, 1, 1)
            l = f"backbone.spm.smart_fusion.local_feature_encoder_{mod}.{i}"
            add(f"{l}.bottleneckBlock.0.weight", 2 * half, half, 1, 1)
            add(f"{l}.bottleneckBlock.2.weight", 2 * half, 1, 3, 3)
            add(f"{l}.bottleneckBlock.4.weight", half, 2 * half, 1, 1)
            add(f"{l}.scale")
        hw = (IMG // 2 ** (i + 2)) ** 2
        add(f"backbone.spm.smart_fusion.fuse_blocks.{i}.gammax.scale")
        add(f"backbone.spm.smart_fusion.fuse_blocks.{i}.gammay.scale")
        add(f"backbone.spm.smart_fusion.fuse_blocks.{i}.norm.weight", hw)
        add(f"backbone.spm.smart_fusion.fuse_blocks.{i}.norm.bias", hw)
        d = f"backbone.spm.smart_fusion.detail_feature_extractions.{i}"
        add(f"{d}.project_in.weight", 2 * cc, cc, 1, 1)
        add(f"{d}.dwconv.weight", 2 * cc, 2, 3, 3)
        add(f"{d}.project_out.weight", cc, cc, 1, 1)
        e = f"backbone.spm.smart_fusion.enhance_blocks.{i}"
        add(f"{e}.conv_atten.conv.weight", cc, cc, 1, 1)
        add(f"{e}.conv_atten.gn.weight", cc)
        add(f"{e}.conv_atten.gn.bias", cc)
        mip = max(8, cc // 32)
        ca = f"backbone.spm.smart_fusion.ca_blocks.{i}.coord_atten"
        add(f"{ca}.conv1.weight", mip, cc, 1, 1)
        add(f"{ca}.conv1.bias", mip)
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            add(f"{ca}.bn1.{leaf}", mip)
        add(f"{ca}.conv_h.weight", cc, mip, 1, 1)
        add(f"{ca}.conv_h.bias", cc)
        add(f"{ca}.conv_w.weight", cc, mip, 1, 1)
        add(f"{ca}.conv_w.bias", cc)
        add(f"backbone.spm.smart_fusion.scale_layers.{i}.scale1")
        add(f"backbone.spm.smart_fusion.scale_layers.{i}.scale2")
        add(f"backbone.spm.fc{i + 1}.weight", EMBED, cc, 1, 1)
        add(f"backbone.spm.fc{i + 1}.bias", EMBED)

    # --- interactions
    d_val = int(EMBED * RATIO)
    for s in range(4):
        def add_msda(prefix, n_levels):
            add(f"{prefix}.sampling_offsets.weight",
                DEF_HEADS * n_levels * NPTS * 2, EMBED)
            add(f"{prefix}.sampling_offsets.bias",
                DEF_HEADS * n_levels * NPTS * 2)
            add(f"{prefix}.attention_weights.weight",
                DEF_HEADS * n_levels * NPTS, EMBED)
            add(f"{prefix}.attention_weights.bias",
                DEF_HEADS * n_levels * NPTS)
            add(f"{prefix}.value_proj.weight", d_val, EMBED)
            add(f"{prefix}.value_proj.bias", d_val)
            add(f"{prefix}.output_proj.weight", EMBED, d_val)
            add(f"{prefix}.output_proj.bias", EMBED)

        inj = f"backbone.interactions.{s}.injector"
        add(f"{inj}.query_norm.weight", EMBED)
        add(f"{inj}.query_norm.bias", EMBED)
        add(f"{inj}.feat_norm.weight", EMBED)
        add(f"{inj}.feat_norm.bias", EMBED)
        add(f"{inj}.gamma", EMBED)
        add_msda(f"{inj}.attn", 3)

        exts = [f"backbone.interactions.{s}.extractor"]
        if s == 3:
            exts += [f"backbone.interactions.{s}.extra_extractors.{j}"
                     for j in range(2)]
        hidden = int(EMBED * CFFN)
        for ext in exts:
            add(f"{ext}.query_norm.weight", EMBED)
            add(f"{ext}.query_norm.bias", EMBED)
            add(f"{ext}.feat_norm.weight", EMBED)
            add(f"{ext}.feat_norm.bias", EMBED)
            add_msda(f"{ext}.attn", 1)
            add(f"{ext}.ffn.fc1.weight", hidden, EMBED)
            add(f"{ext}.ffn.fc1.bias", hidden)
            add(f"{ext}.ffn.dwconv.dwconv.weight", hidden, 1, 3, 3)
            add(f"{ext}.ffn.dwconv.dwconv.bias", hidden)
            add(f"{ext}.ffn.fc2.weight", EMBED, hidden)
            add(f"{ext}.ffn.fc2.bias", EMBED)
            add(f"{ext}.ffn_norm.weight", EMBED)
            add(f"{ext}.ffn_norm.bias", EMBED)

    # --- decode head
    for i in range(4):
        add(f"decode_head.convs.{i}.conv.weight", HEAD_CH, EMBED, 1, 1)
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            add(f"decode_head.convs.{i}.bn.{leaf}", HEAD_CH)
    add("decode_head.fusion_conv.conv.weight", HEAD_CH, 4 * HEAD_CH, 1, 1)
    for leaf in ("weight", "bias", "running_mean", "running_var"):
        add(f"decode_head.fusion_conv.bn.{leaf}", HEAD_CH)
    add("decode_head.conv_seg.weight", NCLS, HEAD_CH, 1, 1)
    add("decode_head.conv_seg.bias", NCLS)
    return sd


def _leaves(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_leaves(v, p))
        else:
            out[p] = np.shape(v)
    return out


def test_full_checkpoint_bijection():
    interaction_indexes = TINY_BACKBONE["interaction_indexes"]
    sd = synth_state_dict()
    tree = convert_full_checkpoint(sd, interaction_indexes)

    model = EncoderDecoder(num_classes=NCLS, head_channels=HEAD_CH,
                           backbone_cfg=TINY_BACKBONE)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 6)),
                           train=False)

    got_p = _leaves(tree["params"])
    want_p = _leaves(variables["params"])
    missing = sorted(set(want_p) - set(got_p))
    extra = sorted(set(got_p) - set(want_p))
    assert not missing, f"model params not covered: {missing[:10]}"
    assert not extra, f"converted keys not in model: {extra[:10]}"
    bad = [k for k in want_p if want_p[k] != got_p[k]]
    assert not bad, f"shape mismatches: {[(k, want_p[k], got_p[k]) for k in bad[:5]]}"

    got_s = _leaves(tree["batch_stats"])
    want_s = _leaves(variables["batch_stats"])
    assert set(got_s) == set(want_s), (
        sorted(set(want_s) ^ set(got_s))[:10]
    )
    assert all(want_s[k] == got_s[k] for k in want_s)
