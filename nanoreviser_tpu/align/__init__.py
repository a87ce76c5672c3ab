from .sam import parse_sam_record, pick_sam_record, rev_comp, SamParseError
from .labels import clean_read_map_ref, fix_raw_starts_for_clipped_bases

__all__ = [
    "parse_sam_record",
    "pick_sam_record",
    "rev_comp",
    "SamParseError",
    "clean_read_map_ref",
    "fix_raw_starts_for_clipped_bases",
]
