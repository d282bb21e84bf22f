from . import sliding_window, postprocess, metrics, predictor  # noqa: F401
