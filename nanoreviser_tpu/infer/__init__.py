from .merge import merge_revision, labels_to_bases
from .pipeline import ReviserEngine, revise_read_passthrough
from .streaming import StreamingReviser

__all__ = [
    "merge_revision",
    "labels_to_bases",
    "ReviserEngine",
    "StreamingReviser",
    "revise_read_passthrough",
]
