"""Loader that imports the REFERENCE's own torch model code as a numerics
oracle for full-model parity tests.

The reference tree at /root/reference/segmentation vendors nearly all of its
framework (mmengine_custom / mmcv_custom / mmpretrain_custom); only a few
leaves are unavailable in this environment and get stubbed here:

- `timm.models.layers` (DropPath / trunc_normal_ / to_2tuple) — init-only
  or inert-at-eval helpers,
- the pip `mmseg` registry symbols (pure registration decorators),
- `mmengine_custom`'s dist/logging/registry utility leaves (the model files
  only use them for init bookkeeping),
- the CUDA extension `MultiScaleDeformableAttention` — replaced by the
  reference's OWN pure-torch `ms_deform_attn_core_pytorch`
  (reference ops/functions/ms_deform_attn_func.py:53-75), which is the
  numerical spec the CUDA kernel is tested against (reference ops/test.py).

Everything that defines model MATH (adapter modules, TwinConvNeXt, fusion
neck, SAM encoder, ConvModule/build_norm_layer) is imported verbatim from
the reference so the oracle is the reference, not a re-expression of it.

No reference code is copied into this repo; tests importing this module
must skip when /root/reference is absent.
"""
import importlib
import logging
import sys
import types

REF = "/root/reference/segmentation"

_loaded = None


def _fake_pkg(name, path=None):
    m = types.ModuleType(name)
    if path:
        m.__path__ = [path]
    sys.modules[name] = m
    return m


class _MiniRegistry:
    """Functional subset of mmengine's Registry used by the vendored files."""

    def __init__(self):
        self._d = {}

    def register_module(self, name=None, module=None, force=False):
        if module is not None:
            for key in ([name] if isinstance(name, str) else (name or [module.__name__])):
                self._d[key] = module
            return module

        def deco(cls):
            keys = name if name is not None else cls.__name__
            for key in ([keys] if isinstance(keys, str) else keys):
                self._d[key] = cls
            return cls

        return deco

    def get(self, key):
        return self._d.get(key)

    def build(self, cfg, **default_args):
        cfg = dict(cfg)
        # mmcv-style builders pass `default_args=<dict|None>` as a single
        # kwarg; mmengine-style callers pass defaults as **kwargs directly
        nested = default_args.pop("default_args", None)
        if nested:
            default_args.update(nested)
        cfg.update({k: v for k, v in default_args.items() if k not in cfg})
        cls = self._d[cfg.pop("type")]
        return cls(**cfg)

    def switch_scope_and_registry(self, scope):
        reg = self

        class _Ctx:
            scope = "oracle"

            def __enter__(self):
                return reg

            def __exit__(self, *a):
                return False

            def get(self, key):  # pragma: no cover
                return reg.get(key)

        return _Ctx()


def load_reference_modules():
    """Import and return the reference model modules (cached)."""
    global _loaded
    if _loaded is not None:
        return _loaded

    import torch
    import torch.nn as tnn

    # --- timm stub (init helpers + eval-inert DropPath)
    timm = _fake_pkg("timm")
    tmod = _fake_pkg("timm.models")
    tl = _fake_pkg("timm.models.layers")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            t.normal_(mean, std).clamp_(a * std, b * std)
        return t

    def drop_path(x, drop_prob=0.0, training=False):
        return x

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    tl.to_2tuple, tl.trunc_normal_ = to_2tuple, trunc_normal_
    tl.drop_path, tl.DropPath = drop_path, DropPath
    timm.models = tmod
    tmod.layers = tl

    # --- pip-mmseg stub (registries + logger only)
    reg = _MiniRegistry()
    _fake_pkg("mmseg")
    _fake_pkg("mmseg.models")
    b = _fake_pkg("mmseg.models.builder")
    b.BACKBONES = b.HEADS = b.LOSSES = b.SEGMENTORS = b.NECKS = reg
    u = _fake_pkg("mmseg.utils")
    u.get_root_logger = lambda *a, **k: logging.getLogger("ref-oracle")

    # --- CUDA extension stub; replaced post-import by the file's own
    # pure-torch core (see below)
    _fake_pkg("MultiScaleDeformableAttention")

    # --- vendored trees as __init__-skipping namespace packages
    for name, sub in [
        ("mmseg_custom", ""),
        ("mmseg_custom.models", "models"),
        ("mmseg_custom.models.backbones", "models/backbones"),
        ("mmseg_custom.models.backbones.base", "models/backbones/base"),
        ("mmseg_custom.models.decode_heads", "models/decode_heads"),
    ]:
        _fake_pkg(name, f"{REF}/mmseg_custom/{sub}".rstrip("/"))
    for name, sub in [
        ("mmcv_custom", ""),
        ("mmcv_custom.cnn", "cnn"),
        ("mmcv_custom.cnn.bricks", "cnn/bricks"),
    ]:
        _fake_pkg(name, f"{REF}/mmcv_custom/{sub}".rstrip("/"))
    _fake_pkg("ops", f"{REF}/ops")
    _fake_pkg("ops.modules", f"{REF}/ops/modules")
    _fake_pkg("ops.functions", f"{REF}/ops/functions")

    # --- mmengine_custom leaves: stub the non-math utilities the model
    # files pull in (dist/logging/registry/version helpers)
    me = _fake_pkg("mmengine_custom", f"{REF}/mmengine_custom")
    me_dist = _fake_pkg("mmengine_custom.dist")
    me_dist.master_only = lambda fn: fn
    me_log = _fake_pkg("mmengine_custom.logging")

    class _MMLogger:
        @staticmethod
        def get_current_instance():
            return logging.getLogger("ref-oracle")

    me_log.MMLogger = _MMLogger
    me_log.print_log = lambda msg, logger=None, level=logging.INFO: None
    me_reg = _fake_pkg("mmengine_custom.registry")
    me_reg.MODELS = reg
    me_reg.WEIGHT_INITIALIZERS = _MiniRegistry()

    def build_from_cfg(cfg, registry, default_args=None):
        cfg = dict(cfg)
        cls = registry.get(cfg.pop("type"))
        return cls(**cfg)

    me_reg.build_from_cfg = build_from_cfg
    me_utils = _fake_pkg("mmengine_custom.utils")

    def digit_version(v, length=4):
        out = []
        for part in str(v).split("+")[0].split("."):
            out.append(int("".join(ch for ch in part if ch.isdigit()) or 0))
        return tuple(out + [0] * (length - len(out)))

    me_utils.digit_version = digit_version
    me_utils.is_tuple_of = lambda seq, typ: isinstance(seq, tuple) and all(
        isinstance(s, typ) for s in seq)
    me_dl = _fake_pkg("mmengine_custom.utils.dl_utils")
    me_dl.TORCH_VERSION = torch.__version__
    pw = _fake_pkg("mmengine_custom.utils.dl_utils.parrots_wrapper")
    from torch.nn.modules.batchnorm import _BatchNorm
    from torch.nn.modules.instancenorm import _InstanceNorm

    pw._BatchNorm, pw._InstanceNorm = _BatchNorm, _InstanceNorm
    pw.SyncBatchNorm = tnn.SyncBatchNorm
    me_runner = _fake_pkg("mmengine_custom.runner")

    class CheckpointLoader:
        @classmethod
        def load_checkpoint(cls, filename, map_location=None, logger=None):
            if filename is None:
                # oracle models are built weightless and overwritten by the
                # test's synthetic state dict; a non-empty placeholder keeps
                # TwinConvNeXt.init_weights' key-rewrite loop total
                return {"state_dict": {"_oracle_placeholder": torch.zeros(1)}}
            return torch.load(filename, map_location=map_location)

    me_runner.CheckpointLoader = CheckpointLoader

    # mmengine_custom.model: vendored weight_init (math-free init fns are
    # fine either way, but base_module pulls a deep dist/logging chain —
    # provide a behavior-equivalent shim instead)
    me_model = _fake_pkg("mmengine_custom.model")

    class BaseModule(tnn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg
            self._is_init = False

        def init_weights(self):
            self._is_init = True
            for m in self.children():
                if hasattr(m, "init_weights"):
                    m.init_weights()

    class ModuleList(tnn.ModuleList, BaseModule):
        def __init__(self, modules=None, init_cfg=None):
            BaseModule.__init__(self, init_cfg)
            tnn.ModuleList.__init__(self, modules)

    class Sequential(tnn.Sequential, BaseModule):
        def __init__(self, *args, init_cfg=None):
            BaseModule.__init__(self, init_cfg)
            tnn.Sequential.__init__(self, *args)

    me_model.BaseModule, me_model.ModuleList = BaseModule, ModuleList
    me_model.Sequential = Sequential

    def _noop_init(module, *a, **k):
        return None

    for fn in ("caffe2_xavier_init", "constant_init", "kaiming_init",
               "normal_init", "trunc_normal_init", "xavier_init",
               "uniform_init"):
        setattr(me_model, fn, _noop_init)

    # --- mmpretrain_custom leaves
    mp = _fake_pkg("mmpretrain_custom", f"{REF}/mmpretrain_custom")
    mp_reg = _fake_pkg("mmpretrain_custom.registry")
    mp_reg.MODELS = reg
    _fake_pkg("mmpretrain_custom.models", f"{REF}/mmpretrain_custom/models")
    _fake_pkg("mmpretrain_custom.models.utils",
              f"{REF}/mmpretrain_custom/models/utils")
    _fake_pkg("mmpretrain_custom.models.backbones",
              f"{REF}/mmpretrain_custom/models/backbones")

    # real vendored math/helpers, loaded under the fake packages
    norm_mod = importlib.import_module("mmpretrain_custom.models.utils.norm")
    sys.modules["mmpretrain_custom.models.utils"].build_norm_layer = (
        norm_mod.build_norm_layer
    )
    # GRN lives in mmpretrain's utils package; find its module
    grn = None
    for cand in ("mmpretrain_custom.models.utils.norm",):
        m = importlib.import_module(cand)
        if hasattr(m, "GRN"):
            grn = m.GRN
    if grn is None:
        class GRN(tnn.Module):  # ConvNeXt-v2 GRN; unused by v1 checkpoints
            def __init__(self, in_channels, eps=1e-6):
                super().__init__()
                self.in_channels = in_channels
                self.gamma = tnn.Parameter(torch.zeros(in_channels))
                self.beta = tnn.Parameter(torch.zeros(in_channels))
                self.eps = eps

            def forward(self, x, data_format="channel_first"):
                if data_format == "channel_last":
                    gx = torch.norm(x, p=2, dim=(1, 2), keepdim=True)
                    nx = gx / (gx.mean(dim=-1, keepdim=True) + self.eps)
                    x = self.gamma * (x * nx) + self.beta + x
                else:
                    gx = torch.norm(x, p=2, dim=(2, 3), keepdim=True)
                    nx = gx / (gx.mean(dim=1, keepdim=True) + self.eps)
                    x = (self.gamma.view(1, -1, 1, 1) * (x * nx)
                         + self.beta.view(1, -1, 1, 1) + x)
                return x

        grn = GRN
    sys.modules["mmpretrain_custom.models.utils"].GRN = grn
    bb = _fake_pkg("mmpretrain_custom.models.backbones.base_backbone")

    class BaseBackbone(BaseModule):
        def __init__(self, init_cfg=None):
            super().__init__(init_cfg)

        def forward(self, x):  # pragma: no cover
            raise NotImplementedError

        def train(self, mode=True):
            super().train(mode)
            return self

    bb.BaseBackbone = BaseBackbone

    # the encoder does `from mmcv_custom import load_checkpoint` (only used
    # when pretrained= is a path; the oracle always passes None)
    def _unused_load_checkpoint(*a, **k):  # pragma: no cover
        raise RuntimeError("oracle models must be built with pretrained=None")

    sys.modules["mmcv_custom"].load_checkpoint = _unused_load_checkpoint
    # image_encoder.py picks its import path from os.getcwd(); satisfy the
    # non-/segmentation branch too
    _fake_pkg("ViTAdapter", "/nonexistent")
    _fake_pkg("ViTAdapter.segmentation", "/nonexistent")
    va = _fake_pkg("ViTAdapter.segmentation.mmcv_custom")
    va.load_checkpoint = _unused_load_checkpoint
    _fake_pkg("ViTAdapter.segmentation.ops", f"{REF}/ops")
    _fake_pkg("ViTAdapter.segmentation.ops.modules", f"{REF}/ops/modules")

    # mmcv_custom ConvModule chain (real vendored files)
    cm = importlib.import_module("mmcv_custom.cnn.bricks.conv_module")
    sys.modules["mmcv_custom.cnn"].ConvModule = cm.ConvModule
    sys.modules["mmcv_custom.cnn.bricks"].ConvModule = cm.ConvModule
    try:
        dpm = importlib.import_module("mmcv_custom.cnn.bricks.drop")
        sys.modules["mmcv_custom.cnn.bricks"].DropPath = dpm.DropPath
    except Exception:
        sys.modules["mmcv_custom.cnn.bricks"].DropPath = DropPath

    # --- the reference model files themselves
    func_mod = importlib.import_module("ops.functions.ms_deform_attn_func")

    # swap the CUDA autograd Function for the file's own pure-torch core
    class _TorchMSDAFunction:
        @staticmethod
        def apply(value, shapes, level_start_index, sampling_locations,
                  attention_weights, im2col_step):
            return func_mod.ms_deform_attn_core_pytorch(
                value, shapes, sampling_locations, attention_weights)

    func_mod.MSDeformAttnFunction = _TorchMSDAFunction
    ops_functions = sys.modules["ops.functions"]
    ops_functions.MSDeformAttnFunction = _TorchMSDAFunction
    ops_functions.ms_deform_attn_core_pytorch = (
        func_mod.ms_deform_attn_core_pytorch
    )
    msda_mod = importlib.import_module("ops.modules.ms_deform_attn")
    msda_mod.MSDeformAttnFunction = _TorchMSDAFunction
    sys.modules["ops.modules"].MSDeformAttn = msda_mod.MSDeformAttn
    sys.modules["ViTAdapter.segmentation.ops.modules"].MSDeformAttn = (
        msda_mod.MSDeformAttn
    )

    # --- pip-mmseg leaves for the decode head: functional subsets of
    # mmseg 0.20.2 BaseDecodeHead/resize (the reference SegformerHead only
    # touches _transform_inputs / cls_seg / align_corners / norm_cfg)
    _fake_pkg("mmcv")
    mmcv_cnn = _fake_pkg("mmcv.cnn")
    mmcv_cnn.ConvModule = cm.ConvModule
    ops_pkg = _fake_pkg("mmseg.ops")

    def resize(input, size=None, scale_factor=None, mode="nearest",
               align_corners=None, warning=True):
        import torch.nn.functional as F

        return F.interpolate(input, size, scale_factor, mode, align_corners)

    ops_pkg.resize = resize
    _fake_pkg("mmseg.models.decode_heads")
    dh = _fake_pkg("mmseg.models.decode_heads.decode_head")

    class BaseDecodeHead(tnn.Module):
        """Functional subset of mmseg 0.20.2 BaseDecodeHead."""

        def __init__(self, in_channels, channels, *, num_classes,
                     dropout_ratio=0.1, conv_cfg=None, norm_cfg=None,
                     act_cfg=dict(type="ReLU"), in_index=-1,
                     input_transform=None, loss_decode=None,
                     ignore_index=255, sampler=None, align_corners=False,
                     init_cfg=None):
            super().__init__()
            self.in_channels = in_channels
            self.channels = channels
            self.num_classes = num_classes
            self.dropout_ratio = dropout_ratio
            self.conv_cfg = conv_cfg
            self.norm_cfg = norm_cfg
            self.act_cfg = act_cfg
            self.in_index = in_index
            self.input_transform = input_transform
            self.ignore_index = ignore_index
            self.align_corners = align_corners
            self.conv_seg = tnn.Conv2d(channels, num_classes, kernel_size=1)
            self.dropout = (tnn.Dropout2d(dropout_ratio)
                            if dropout_ratio > 0 else None)

        def _transform_inputs(self, inputs):
            if self.input_transform == "multiple_select":
                return [inputs[i] for i in self.in_index]
            if self.input_transform == "resize_concat":
                raise NotImplementedError
            return inputs[self.in_index]

        def cls_seg(self, feat):
            if self.dropout is not None:
                feat = self.dropout(feat)
            return self.conv_seg(feat)

    dh.BaseDecodeHead = BaseDecodeHead

    enc = importlib.import_module(
        "mmseg_custom.models.backbones.base.image_encoder")
    twin = importlib.import_module(
        "mmseg_custom.models.backbones.base.twin_convnext")
    am = importlib.import_module(
        "mmseg_custom.models.backbones."
        "adapter_modules_multimodal_mix_mod_new_in_twin_convnext_new_with_cp")
    top = importlib.import_module(
        "mmseg_custom.models.backbones."
        "image_encoder_adapter_bimodal_mix_mod_new_in_twin_convnext_new_with_cp")
    seg_head = importlib.import_module(
        "mmseg_custom.models.decode_heads.segformer_head")

    _loaded = types.SimpleNamespace(
        image_encoder=enc, twin_convnext=twin, adapter_modules=am,
        top_backbone=top, msda=msda_mod, conv_module=cm.ConvModule,
        build_norm_layer=norm_mod.build_norm_layer,
        segformer_head=seg_head, resize=resize,
    )
    return _loaded
