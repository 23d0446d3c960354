from .positional_encoding import SinePositionalEncoding
from .pixel_decoder import MSDeformAttnPixelDecoder
from .transformer_decoder import Mask2FormerDecoder
from .head import Mask2FormerHead, MaskFormerHead
from .matching import (
    classification_cost,
    dice_cost,
    mask_bce_cost,
    hungarian_assign,
)
from .losses import mask2former_loss
