from .inference import init_segmentor, inference_segmentor, show_result_pyplot
