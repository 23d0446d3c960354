from .interpolate import (
    resize_bilinear,
    resize_bicubic,
    interp_linear_1d,
)
