from .pipelines import (
    load_multimodal_image,
    resize_multimodal,
    random_scale_resize,
    random_crop,
    random_flip,
    photometric_distortion,
    random_gaussian_blur,
    normalize_multimodal,
    pad_to_size,
    TrainPipeline,
    TestPipeline,
)
from .datasets import build_dataset, DELIVER, FMB, MUSES
from .loader import DataLoader
