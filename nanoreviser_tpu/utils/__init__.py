from .logging import logger_config
from .files import check_path, model_fn_generate, summary_generate, write_summary_file

__all__ = [
    "logger_config",
    "check_path",
    "model_fn_generate",
    "summary_generate",
    "write_summary_file",
]
