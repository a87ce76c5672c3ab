from .segmentation import SegmentedSignal, segment_signal, mad_normalizers
from .features import (
    BASE_COLOR_TABLE,
    BASE_LABEL_TABLE,
    base_colors,
    base_labels,
    assemble_features,
)

__all__ = [
    "SegmentedSignal",
    "segment_signal",
    "mad_normalizers",
    "BASE_COLOR_TABLE",
    "BASE_LABEL_TABLE",
    "base_colors",
    "base_labels",
    "assemble_features",
]
