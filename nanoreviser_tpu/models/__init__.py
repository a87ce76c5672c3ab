from .reviser import ReviserConfig, reviser_apply, init_reviser_params, param_count
from .import_keras import load_keras_weights, infer_window_size

__all__ = [
    "ReviserConfig",
    "reviser_apply",
    "init_reviser_params",
    "param_count",
    "load_keras_weights",
    "infer_window_size",
]
