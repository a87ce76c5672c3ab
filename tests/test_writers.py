"""Byte-exact output format tests, incl. the golden fallback fasta."""

from pathlib import Path

from nanoreviser_tpu.io import (
    get_read_data,
    format_read_fasta,
    format_read_fastq,
    format_train_fasta,
    extract_fastq,
)


def test_fasta_format_quirks():
    text = format_read_fasta("/a/b/my read.fast5", "ACGT")
    assert text == ">my|||read.fast5\nACGT"  # basename, |||, no trailing newline


def test_fastq_format_missing_newline_quirk():
    text = format_read_fastq("/a/b/r.fast5", "ACGT", "!!!!")
    assert text == "@r.fast5\nACGT+\n!!!!"  # missing \n before '+', reproduced


def test_train_fasta_full_path_and_newline():
    text = format_train_fasta("/a/b c/r.fast5", "ACGT")
    assert text == ">/a/b|||c/r.fast5\nACGT\n"


def test_fallback_fasta_golden(unitest_fast5_files, tmp_path: Path):
    """The shipped reference's observable unitest output: event-derived bases
    under the basename header (SURVEY.md §0). Byte-exact reconstruction."""
    for fn in unitest_fast5_files:
        rd = get_read_data(str(fn))
        out = format_read_fasta(str(fn), rd.bases)
        # golden derivation: embedded fastq[2:-2] == decoded sequence
        with open(fn, "rb"):
            pass
        bases7, _ = extract_fastq(str(fn), trim=7)
        golden = ">" + fn.name.replace(" ", "|||") + "\n"
        assert out.startswith(golden)
        assert out[len(golden):][5:-5] == bases7


def test_fallback_fastq_golden(unitest_fast5_files):
    """Reference fastq fallback: extract_fastq bases[7:-7] with quirky format."""
    fn = unitest_fast5_files[0]
    seq, qual = extract_fastq(str(fn))
    text = format_read_fastq(str(fn), seq, qual)
    lines = text.split("\n")
    assert lines[0] == "@" + fn.name
    assert lines[1].endswith("+")
    assert len(lines) == 3
