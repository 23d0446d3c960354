from .sam_vit import PatchEmbed, ViTAttention, ViTBlock, ImageEncoderViT
from .twin_convnext import ConvNeXtBlock, TwinConvNeXt, CONVNEXT_ARCHS
from .fusion_neck import RoadFormer2Neck
from .adapter import (
    SpatialPriorModule,
    SpatialPriorModuleBimodal,
    Injector,
    Extractor,
    InteractionBlock,
    deform_inputs,
)
from .backbone import SAMAdapterBimodal
from .segformer_head import SegformerHead
from .losses import ohem_cross_entropy, cross_entropy_loss, dice_loss, focal_loss
from .segmentor import EncoderDecoder
