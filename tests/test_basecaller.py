"""External-basecaller hook tests (reference get_base_G path,
output_handeler.py:159-197) — driven by a stub basecaller script."""

import os
import stat
import subprocess
import sys
from pathlib import Path

import pytest

from nanoreviser_tpu.infer.basecaller import (
    harvest_fastq,
    prep_basecaller_options,
    rebasecall_read,
)
from nanoreviser_tpu.io import get_read_data

# the stub emits the reference trim geometry: readlines() keeps the newline,
# and the reference slices the raw line [13:-13] (output_handeler.py:98-99) —
# so the tail trim eats 12 payload chars + '\n'
SEQ_CORE = "ACGTACGTACGTACGTACGT"
QUAL_CORE = "!!!!!!!!!!!!!!!!!!!!"
PAD13 = "N" * 13
PAD12 = "N" * 12

STUB = f"""#!{sys.executable}
import argparse, os, sys
p = argparse.ArgumentParser()
p.add_argument("--input_path", required=True)
p.add_argument("--save_path", required=True)
p.add_argument("--config", required=True)
a = p.parse_args()
fast5s = [f for f in os.listdir(a.input_path) if f.endswith(".fast5")]
assert len(fast5s) == 1, fast5s
with open(os.path.join(a.save_path, "stub_out.fastq"), "w") as fp:
    fp.write("@stub\\n{PAD13}{SEQ_CORE}{PAD12}\\n+\\n{PAD13}{QUAL_CORE}{PAD12}\\n")
sys.exit(0)
"""


@pytest.fixture()
def stub_exe(tmp_path: Path) -> str:
    exe = tmp_path / "basecaller"
    exe.write_text(STUB)
    exe.chmod(exe.stat().st_mode | stat.S_IXUSR)
    return str(exe)


def test_option_shape():
    opts = prep_basecaller_options("/in", "/out", "/cfg/x.cfg")
    assert opts == ["--input_path", "/in", "--save_path", "/out",
                    "--config", "/cfg/x.cfg"]


def test_harvest_trim(tmp_path: Path):
    (tmp_path / "r.fastq").write_text(
        f"@r\n{PAD13}{SEQ_CORE}{PAD12}\n+\n{PAD13}{QUAL_CORE}{PAD12}\n"
    )
    seq, qual = harvest_fastq(str(tmp_path))
    assert seq == SEQ_CORE
    assert qual == QUAL_CORE


def test_rebasecall_read_stub(unitest_fast5_files, tmp_path: Path, stub_exe):
    seq, qual = rebasecall_read(
        str(unitest_fast5_files[0]), str(tmp_path / "tmp"), stub_exe, "x.cfg"
    )
    assert seq == SEQ_CORE
    assert qual == QUAL_CORE
    # staging dir cleaned up
    assert not any((tmp_path / "tmp").glob("*_bc"))


def test_rebasecall_missing_exe_raises(unitest_fast5_files, tmp_path: Path):
    with pytest.raises(Exception):
        rebasecall_read(
            str(unitest_fast5_files[0]), str(tmp_path / "tmp"),
            str(tmp_path / "no_such_basecaller"), "x.cfg",
        )


def _run_cli(args, cwd):
    env_script = (
        "import sys; sys.argv[0]='NanoReviser.py'; "
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "from nanoreviser_tpu.cli.reviser import main; sys.exit(main())"
    )
    return subprocess.run(
        [sys.executable, "-c", env_script] + args, cwd=cwd,
        capture_output=True, text=True, timeout=600,
    )


@pytest.mark.slow
def test_cli_basecaller_mode(unitest_fast5_files, tmp_path: Path, stub_exe):
    out_dir = tmp_path / "out"
    fn = unitest_fast5_files[0]
    one_dir = tmp_path / "one"
    one_dir.mkdir()
    os.symlink(fn, one_dir / fn.name)
    res = _run_cli(
        [
            "-d", str(one_dir), "-o", str(out_dir), "-F", "fasta",
            "--revise_mode", "basecaller",
            "--basecaller_exe", stub_exe,
            "--basecaller_config", "x.cfg",
            "-t", str(tmp_path / "tmp"),
            "-e", str(tmp_path / "failed.txt"),
        ],
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    stem = fn.name.split(".")[0]
    content = (out_dir / (stem + "_out.fasta")).read_bytes()
    golden = (">" + fn.name.replace(" ", "|||") + "\n" + SEQ_CORE).encode()
    assert content == golden


@pytest.mark.slow
def test_cli_basecaller_degrades_without_binary(
    unitest_fast5_files, tmp_path: Path
):
    """Absent binary: per-read fallback to the original event bases
    (reference NanoReviser.py:146-154), recorded in -e and exit code 1."""
    out_dir = tmp_path / "out"
    fn = unitest_fast5_files[0]
    one_dir = tmp_path / "one"
    one_dir.mkdir()
    os.symlink(fn, one_dir / fn.name)
    failed_fn = tmp_path / "failed.txt"
    res = _run_cli(
        [
            "-d", str(one_dir), "-o", str(out_dir), "-F", "fasta",
            "--revise_mode", "basecaller",
            "--basecaller_exe", str(tmp_path / "no_such_basecaller"),
            "-t", str(tmp_path / "tmp"),
            "-e", str(failed_fn),
        ],
        cwd="/root/repo",
    )
    assert res.returncode == 1
    stem = fn.name.split(".")[0]
    content = (out_dir / (stem + "_out.fasta")).read_bytes()
    rd = get_read_data(str(fn))
    golden = (">" + fn.name.replace(" ", "|||") + "\n" + rd.bases).encode()
    assert content == golden
    assert fn.name in failed_fn.read_text()
