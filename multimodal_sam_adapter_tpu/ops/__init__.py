from .msda import ms_deform_attn, MSDeformAttention
from .attention import (
    window_partition,
    window_unpartition,
    get_rel_pos,
    rel_pos_bias_terms,
    attention_with_decomposed_rel_pos,
)
