"""Inference CLI end-to-end tests (CPU backend, passthrough + model modes)."""

import subprocess
import sys
from pathlib import Path

import numpy as np

import pytest

from nanoreviser_tpu.io import extract_fastq, get_read_data


def _run_cli(args, cwd):
    env_script = (
        "import sys; sys.argv[0]='NanoReviser.py'; "
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "from nanoreviser_tpu.cli.reviser import main; sys.exit(main())"
    )
    return subprocess.run(
        [sys.executable, "-c", env_script] + args,
        cwd=cwd,
        capture_output=True,
        text=True,
        timeout=600,
    )


@pytest.mark.slow
def test_cli_passthrough_bit_exact(unitest_fast5_files, tmp_path: Path):
    """Golden: passthrough mode == shipped reference fallback output, byte-exact."""
    out_dir = tmp_path / "out"
    src_dir = unitest_fast5_files[0].parent
    res = _run_cli(
        [
            "-d", str(src_dir),
            "-o", str(out_dir),
            "-F", "fasta",
            "--revise_mode", "passthrough",
            "-e", str(tmp_path / "failed.txt"),
        ],
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    for fn in unitest_fast5_files:
        stem = fn.name.split(".")[0]
        out_fn = out_dir / (stem + "_out.fasta")
        content = out_fn.read_bytes()
        rd = get_read_data(str(fn))
        golden = (">" + fn.name.replace(" ", "|||") + "\n" + rd.bases).encode()
        assert content == golden
        # cross-check vs the embedded-fastq invariant
        bases7, _ = extract_fastq(str(fn))
        assert rd.bases[5:-5] == bases7


@pytest.mark.slow
def test_cli_passthrough_fastq(unitest_fast5_files, tmp_path: Path):
    out_dir = tmp_path / "outq"
    src_dir = unitest_fast5_files[0].parent
    res = _run_cli(
        [
            "-d", str(src_dir),
            "-o", str(out_dir),
            "-F", "fastq",
            "--revise_mode", "passthrough",
            "-e", str(tmp_path / "failed.txt"),
        ],
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    fn = unitest_fast5_files[0]
    stem = fn.name.split(".")[0]
    content = (out_dir / (stem + "_out.fastq")).read_text()
    seq, qual = extract_fastq(str(fn))
    assert content == "@" + fn.name + "\n" + seq + "+\n" + qual


@pytest.mark.slow
def test_cli_model_path_fastq(unitest_fast5_files, tmp_path: Path):
    """MODEL-path fastq through the CLI: revised sequence + real per-base
    phred qualities (the engine-level quality emission is covered in
    test_streaming; this pins the CLI wiring — emit_quality engine +
    fastq writer format)."""
    out_dir = tmp_path / "outmq"
    src_dir = unitest_fast5_files[0].parent
    res = _run_cli(
        [
            "-d", str(src_dir),
            "-o", str(out_dir),
            "-F", "fastq",
            "--model_dir_root", "/root/reference/model/",
            "-S", "ecoli",
            "--revise_mode", "model",
            "-e", str(tmp_path / "failed.txt"),
        ],
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    failed = (tmp_path / "failed.txt")
    assert not failed.exists() or not failed.read_text().strip(), (
        failed.read_text())
    for fn in unitest_fast5_files:
        stem = fn.name.split(".")[0]
        content = (out_dir / (stem + "_out.fastq")).read_text()
        # reference fastq quirks: @name\nseq (no newline before '+')
        assert content.startswith("@" + fn.name + "\n")
        body = content[len("@" + fn.name) + 1 :]
        seq, _, qual = body.partition("+\n")
        assert len(qual) == len(seq)
        q = np.frombuffer(qual.encode(), np.uint8) - 33
        assert (q >= 0).all() and (q <= 93).all()
        assert np.median(q) > 10          # real confidences, not fill
        rd = get_read_data(str(fn))
        # revised, not passthrough-with-padding: same scale, few edits
        assert abs(len(seq) - rd.n_bases) < 0.05 * rd.n_bases


@pytest.mark.slow
def test_cli_basecaller_mode_with_stub(unitest_fast5_files, tmp_path: Path):
    """--revise_mode basecaller drives the external-binary hook through the
    CLI (reference get_base_G path): staged tmp copy, option shape, 13/13
    fastq trim, per-read fasta output."""
    import stat

    core = "ACGTACGTACGTACGTACGT"
    pad13, pad12 = "N" * 13, "N" * 12
    exe = tmp_path / "basecaller"
    exe.write_text(f"""#!{sys.executable}
import argparse, os
p = argparse.ArgumentParser()
p.add_argument("--input_path", required=True)
p.add_argument("--save_path", required=True)
p.add_argument("--config", required=True)
a = p.parse_args()
with open(os.path.join(a.save_path, "out.fastq"), "w") as fp:
    fp.write("@stub\\n{pad13}{core}{pad12}\\n+\\n{pad13}{'!' * 20}{pad12}\\n")
""")
    exe.chmod(exe.stat().st_mode | stat.S_IXUSR)
    cfg = tmp_path / "dna.cfg"
    cfg.write_text("[basecaller]\n")
    out_dir = tmp_path / "outbc"
    src_dir = unitest_fast5_files[0].parent
    res = _run_cli(
        [
            "-d", str(src_dir),
            "-o", str(out_dir),
            "-F", "fasta",
            "--revise_mode", "basecaller",
            "--basecaller_exe", str(exe),
            "--basecaller_config", str(cfg),
            "-t", str(tmp_path / "bctmp"),
            "-e", str(tmp_path / "failed.txt"),
        ],
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    failed = tmp_path / "failed.txt"
    assert not failed.exists() or not failed.read_text().strip()
    for fn in unitest_fast5_files:
        stem = fn.name.split(".")[0]
        content = (out_dir / (stem + "_out.fasta")).read_text()
        # 13/13 trim leaves the core + 1 pad char each side eaten by the
        # reference's line-slice semantics (see tests/test_basecaller.py)
        assert core in content
        assert content.startswith(">" + fn.name.replace(" ", "|||") + "\n")
