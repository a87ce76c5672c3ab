from .fast5 import ReadData, get_read_data, extract_fastq, list_fast5_files
from .writers import (
    format_read_fasta,
    format_read_fastq,
    write_read_fasta,
    write_read_fastq,
    format_train_fasta,
)
from .fasta import parse_fasta

__all__ = [
    "ReadData",
    "get_read_data",
    "extract_fastq",
    "list_fast5_files",
    "format_read_fasta",
    "format_read_fastq",
    "write_read_fasta",
    "write_read_fastq",
    "format_train_fasta",
    "parse_fasta",
]
