from .merge import merge_revision, labels_to_bases
from .pipeline import ReviserEngine, revise_read_passthrough

__all__ = [
    "merge_revision",
    "labels_to_bases",
    "ReviserEngine",
    "revise_read_passthrough",
]
