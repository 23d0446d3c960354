from .layers import (
    LayerNorm,
    BiasFreeLayerNorm,
    DropPath,
    MLPBlock,
    ConvNormAct,
    Scale,
    Scale2,
    trunc_normal_init,
    fan_out_conv_init,
)
