"""Oracle loader for the reference's Mask2Former head
(mmseg_custom/models/decode_heads/mask2former_head.py:579 +
mmseg_custom/models/plugins/msdeformattn_pixel_decoder.py +
mmseg_custom/models/utils/transformer.py + the vendored
mmcv_custom/cnn/bricks/transformer.py BaseTransformerLayer/FFN stack).

Extends tests/reference_oracle.py's fake-package environment with the extra
mmcv/mmengine leaves this stack pulls in. As with the base oracle, only
math-free leaves are stubbed; one mathful leaf is unavailable in this
environment and is provided as a functional subset written to its public
spec:

- mmcv.ops.multi_scale_deform_attn.MultiScaleDeformableAttention — the
  module wrapper (value/offset/weight projections + residual); its core
  sampling math delegates to the reference's OWN pure-torch
  `ms_deform_attn_core_pytorch` (reference
  ops/functions/ms_deform_attn_func.py:53-75), same as the base oracle's
  CUDA-extension replacement.
- mmcv.ops.point_sample — denormalizing grid_sample wrapper (public mmcv
  semantics: coords in [0,1] -> grid_sample(2p-1), align_corners=False).

Everything that defines head MATH (BaseTransformerLayer operation orders,
DetrTransformerEncoder, SinePositionalEncoding, MlvlPointGenerator, the
pixel decoder, the head itself) is imported verbatim from the reference.
"""
import importlib
import sys
import types

from tests.reference_oracle import (REF, _MiniRegistry, _fake_pkg,
                                    load_reference_modules)

_loaded_m2f = None


class ConfigDict(dict):
    """dict with attribute access (mmengine ConfigDict functional subset)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    def __deepcopy__(self, memo):
        import copy

        return ConfigDict(
            {k: copy.deepcopy(v, memo) for k, v in self.items()}
        )


def _to_cfgdict(x):
    if isinstance(x, dict):
        return ConfigDict({k: _to_cfgdict(v) for k, v in x.items()})
    if isinstance(x, (list, tuple)):
        return type(x)(_to_cfgdict(v) for v in x)
    return x


def load_reference_mask2former():
    """Import and return the reference Mask2Former modules (cached)."""
    global _loaded_m2f
    if _loaded_m2f is not None:
        return _loaded_m2f

    ns_base = load_reference_modules()

    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    reg = sys.modules["mmengine_custom.registry"].MODELS
    me_model = sys.modules["mmengine_custom.model"]

    # --- mmengine_custom extras used by the vendored transformer bricks
    me_cfg = _fake_pkg("mmengine_custom.config")
    me_cfg.ConfigDict = ConfigDict
    me_utils = sys.modules["mmengine_custom.utils"]

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    me_utils.to_2tuple = to_2tuple
    me_utils.deprecated_api_warning = lambda *a, **k: (lambda fn: fn)

    # --- mmcv_custom.cnn leaves the vendored bricks import
    mmcv_custom_cnn = sys.modules["mmcv_custom.cnn"]
    mmcv_custom_cnn.Linear = tnn.Linear

    _ACTS = {"ReLU": tnn.ReLU, "GELU": tnn.GELU, "LeakyReLU": tnn.LeakyReLU}

    def build_activation_layer(cfg):
        cfg = dict(cfg)
        cls = _ACTS[cfg.pop("type")]
        return cls(**cfg)

    def build_norm_layer(cfg, num_features, postfix=""):
        cfg = dict(cfg)
        t = cfg.pop("type")
        cfg.pop("requires_grad", None)
        if t == "LN":
            return f"ln{postfix}", tnn.LayerNorm(num_features, **cfg)
        if t == "GN":
            groups = cfg.pop("num_groups")
            return f"gn{postfix}", tnn.GroupNorm(groups, num_features, **cfg)
        raise KeyError(t)

    def build_conv_layer(cfg, *args, **kwargs):
        assert cfg is None or dict(cfg).get("type") in (None, "Conv2d")
        return tnn.Conv2d(*args, **kwargs)

    mmcv_custom_cnn.build_activation_layer = build_activation_layer
    mmcv_custom_cnn.build_norm_layer = build_norm_layer
    mmcv_custom_cnn.build_conv_layer = build_conv_layer

    # --- the reference's own pure-torch MSDA core (numerical spec of the
    # CUDA kernel, already loaded by the base oracle)
    core = sys.modules["ops.functions"].ms_deform_attn_core_pytorch

    class MultiScaleDeformableAttention(me_model.BaseModule):
        """Functional subset of mmcv.ops.MultiScaleDeformableAttention
        (public spec; core math = reference ms_deform_attn_core_pytorch)."""

        def __init__(self, embed_dims=256, num_heads=8, num_levels=4,
                     num_points=4, im2col_step=64, dropout=0.1,
                     batch_first=False, norm_cfg=None, init_cfg=None):
            super().__init__(init_cfg)
            self.embed_dims = embed_dims
            self.num_heads = num_heads
            self.num_levels = num_levels
            self.num_points = num_points
            self.batch_first = batch_first
            self.sampling_offsets = tnn.Linear(
                embed_dims, num_heads * num_levels * num_points * 2)
            self.attention_weights = tnn.Linear(
                embed_dims, num_heads * num_levels * num_points)
            self.value_proj = tnn.Linear(embed_dims, embed_dims)
            self.output_proj = tnn.Linear(embed_dims, embed_dims)
            self.dropout = tnn.Dropout(dropout)

        def init_weights(self):
            self._is_init = True

        def forward(self, query, key=None, value=None, identity=None,
                    query_pos=None, key_padding_mask=None,
                    reference_points=None, spatial_shapes=None,
                    level_start_index=None, **kwargs):
            if value is None:
                value = query
            if identity is None:
                identity = query
            if query_pos is not None:
                query = query + query_pos
            if not self.batch_first:
                query = query.permute(1, 0, 2)
                value = value.permute(1, 0, 2)
            bs, num_query, _ = query.shape
            bs, num_value, _ = value.shape
            value = self.value_proj(value)
            if key_padding_mask is not None:
                value = value.masked_fill(key_padding_mask[..., None], 0.0)
            value = value.view(bs, num_value, self.num_heads, -1)
            offs = self.sampling_offsets(query).view(
                bs, num_query, self.num_heads, self.num_levels,
                self.num_points, 2)
            w = self.attention_weights(query).view(
                bs, num_query, self.num_heads,
                self.num_levels * self.num_points)
            w = w.softmax(-1).view(bs, num_query, self.num_heads,
                                   self.num_levels, self.num_points)
            assert reference_points.shape[-1] == 2
            normalizer = torch.stack(
                [spatial_shapes[..., 1], spatial_shapes[..., 0]], -1)
            locs = (reference_points[:, :, None, :, None, :]
                    + offs / normalizer[None, None, None, :, None, :])
            out = core(value, spatial_shapes, locs, w)
            out = self.output_proj(out)
            if not self.batch_first:
                out = out.permute(1, 0, 2)
            return self.dropout(out) + identity

    reg.register_module(module=MultiScaleDeformableAttention)
    mmcv_ops = _fake_pkg("mmcv.ops")
    msda_pkg = _fake_pkg("mmcv.ops.multi_scale_deform_attn")
    msda_pkg.MultiScaleDeformableAttention = MultiScaleDeformableAttention
    mmcv_ops.multi_scale_deform_attn = msda_pkg

    def point_sample(input, points, align_corners=False, **kwargs):
        """mmcv.ops.point_sample: [0,1] coords -> grid_sample(2p-1)."""
        add_dim = False
        if points.dim() == 3:
            add_dim = True
            points = points.unsqueeze(2)
        out = F.grid_sample(input, 2.0 * points - 1.0,
                            align_corners=align_corners, **kwargs)
        if add_dim:
            out = out.squeeze(3)
        return out

    mmcv_ops.point_sample = point_sample

    # --- mmcv.* aliases the reference files import under
    mmcv_cnn = sys.modules["mmcv.cnn"]
    mmcv_cnn.Conv2d = tnn.Conv2d
    mmcv_cnn.Linear = tnn.Linear
    mmcv_cnn.build_activation_layer = build_activation_layer
    mmcv_cnn.build_norm_layer = build_norm_layer
    mmcv_cnn.build_conv_layer = build_conv_layer
    mmcv_cnn.PLUGIN_LAYERS = reg

    def _noop_init(module, *a, **k):
        return None

    for fn in ("caffe2_xavier_init", "normal_init", "xavier_init",
               "constant_init", "kaiming_init", "trunc_normal_init",
               "uniform_init"):
        setattr(mmcv_cnn, fn, _noop_init)

    def build_plugin_layer(cfg, postfix="", **kwargs):
        cfg = dict(cfg)
        cls = reg.get(cfg.pop("type"))
        return "plugin" + str(postfix), cls(**cfg, **kwargs)

    mmcv_cnn.build_plugin_layer = build_plugin_layer

    mmcv_reg = _fake_pkg("mmcv.cnn.bricks.registry")
    mmcv_reg.TRANSFORMER_LAYER = reg
    mmcv_reg.TRANSFORMER_LAYER_SEQUENCE = reg
    mmcv_reg.FEEDFORWARD_NETWORK = reg
    mmcv_reg.ATTENTION = reg
    mmcv_reg.POSITIONAL_ENCODING = reg

    mmcv_utils = _fake_pkg("mmcv.utils")
    mmcv_utils.to_2tuple = to_2tuple
    mmcv_utils.ConfigDict = ConfigDict
    mmcv_utils.deprecated_api_warning = (
        lambda *a, **k: (lambda fn: fn))
    mmcv_utils.Registry = _MiniRegistry

    def force_fp32(*a, **k):
        def deco(fn):
            return fn

        return deco

    mmcv_runner = _fake_pkg("mmcv.runner")
    mmcv_runner.BaseModule = me_model.BaseModule
    mmcv_runner.ModuleList = me_model.ModuleList
    mmcv_runner.Sequential = me_model.Sequential
    mmcv_runner.force_fp32 = force_fp32
    mmcv_base_mod = _fake_pkg("mmcv.runner.base_module")
    mmcv_base_mod.BaseModule = me_model.BaseModule
    mmcv_base_mod.ModuleList = me_model.ModuleList
    mmcv_base_mod.Sequential = me_model.Sequential

    # --- the vendored transformer bricks (registers MultiheadAttention,
    # FFN, BaseTransformerLayer, TransformerLayerSequence into reg)
    bricks = importlib.import_module("mmcv_custom.cnn.bricks.transformer")
    bricks.POSITIONAL_ENCODING = reg
    sys.modules["mmcv.cnn.bricks"] = sys.modules["mmcv_custom.cnn.bricks"]
    sys.modules["mmcv.cnn.bricks.transformer"] = bricks
    try:
        drop_mod = importlib.import_module("mmcv_custom.cnn.bricks.drop")
        sys.modules["mmcv.cnn.bricks.drop"] = drop_mod
    except Exception:
        dm = _fake_pkg("mmcv.cnn.bricks.drop")

        def build_dropout(cfg, default_args=None):
            if cfg is None:
                return tnn.Identity()
            cfg = dict(cfg)
            cfg.pop("type", None)
            return tnn.Dropout(cfg.get("drop_prob", 0.0))

        dm.build_dropout = build_dropout

    # --- mmseg_custom.core leaves (loss-path helpers + MlvlPointGenerator)
    core_pkg = _fake_pkg("mmseg_custom.core", f"{REF}/mmseg_custom/core")

    def multi_apply(func, *args, **kwargs):
        import functools

        pfunc = functools.partial(func, **kwargs) if kwargs else func
        map_results = map(pfunc, *args)
        return tuple(map(list, zip(*map_results)))

    def reduce_mean(tensor):
        return tensor

    def build_sampler(cfg, **kwargs):  # pragma: no cover — train_cfg only
        raise NotImplementedError("oracle heads are built with train_cfg=None")

    core_pkg.multi_apply = multi_apply
    core_pkg.reduce_mean = reduce_mean
    core_pkg.build_sampler = build_sampler
    _fake_pkg("mmseg_custom.core.anchor", f"{REF}/mmseg_custom/core/anchor")
    anchor_builder = _fake_pkg("mmseg_custom.core.anchor.builder")
    anchor_builder.PRIOR_GENERATORS = _MiniRegistry()
    pg = importlib.import_module("mmseg_custom.core.anchor.point_generator")
    sys.modules["mmseg_custom.core.anchor"].MlvlPointGenerator = (
        pg.MlvlPointGenerator
    )

    # --- mmseg_custom.models leaves
    models_builder = _fake_pkg("mmseg_custom.models.builder")
    models_builder.TRANSFORMER = reg

    def build_assigner(cfg, **kw):  # pragma: no cover — train_cfg only
        raise NotImplementedError("oracle heads are built with train_cfg=None")

    models_builder.build_assigner = build_assigner
    _fake_pkg("mmseg_custom.models.utils", f"{REF}/mmseg_custom/models/utils")
    _fake_pkg("mmseg_custom.models.plugins",
              f"{REF}/mmseg_custom/models/plugins")

    sys.modules["mmseg.models.builder"].build_loss = (
        lambda cfg: tnn.Identity()
    )

    pos_mod = importlib.import_module(
        "mmseg_custom.models.utils.positional_encoding")
    trans_mod = importlib.import_module(
        "mmseg_custom.models.utils.transformer")
    ps_mod = importlib.import_module(
        "mmseg_custom.models.utils.point_sample")
    sys.modules["mmseg_custom.models.utils"]. \
        get_uncertain_point_coords_with_randomness = (
            ps_mod.get_uncertain_point_coords_with_randomness
        )
    pix_mod = importlib.import_module(
        "mmseg_custom.models.plugins.msdeformattn_pixel_decoder")
    head_mod = importlib.import_module(
        "mmseg_custom.models.decode_heads.mask2former_head")

    _loaded_m2f = types.SimpleNamespace(
        base=ns_base,
        head=head_mod,
        pixel_decoder=pix_mod,
        transformer=trans_mod,
        positional_encoding=pos_mod,
        msda=MultiScaleDeformableAttention,
        ConfigDict=ConfigDict,
        to_cfgdict=_to_cfgdict,
    )
    return _loaded_m2f
