"""Engine + CLI end-to-end tests on the 8-device virtual CPU mesh."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from nanoreviser_tpu.io import get_read_data, extract_fastq


@pytest.fixture(scope="module")
def small_engine(ecoli_model_paths):
    from nanoreviser_tpu.infer import ReviserEngine

    m1, m2 = ecoli_model_paths
    return ReviserEngine(str(m1), str(m2), chunk=64)


def test_engine_loads_window11(small_engine):
    assert small_engine.window == 11
    assert small_engine.n_classes == (6, 5)
    assert small_engine.mesh.devices.size == 8  # virtual CPU mesh


def test_predict_labels_shapes_and_padding_invariance(small_engine):
    rng = np.random.default_rng(0)
    n = 100
    sigwin = rng.normal(0, 1, (n, 50)).astype(np.float32)
    feats = rng.normal(0.5, 0.2, (n, 6)).astype(np.float32)
    y1, y2 = small_engine.predict_labels(sigwin, feats)
    assert y1.shape == (n - 11,)
    assert y2.shape == (n - 11,)
    assert y1.max() < 6 and y2.max() < 5
    # padding must not change results: append junk rows, expect same prefix
    sig2 = np.concatenate([sigwin, rng.normal(5, 3, (40, 50)).astype(np.float32)])
    ft2 = np.concatenate([feats, rng.normal(2, 1, (40, 6)).astype(np.float32)])
    y1b, y2b = small_engine.predict_labels(sig2, ft2)
    np.testing.assert_array_equal(y1, y1b[: n - 11])
    np.testing.assert_array_equal(y2, y2b[: n - 11])


def test_revise_read_on_truncated_real_read(small_engine, unitest_fast5_files):
    rd = get_read_data(str(unitest_fast5_files[0]))
    # truncate to keep the CPU test fast: keep the first 150 bases
    import dataclasses

    n = 150
    rd_small = dataclasses.replace(
        rd,
        starts=rd.starts[:n],
        lengths=rd.lengths[:n],
        bases=rd.bases[:n],
        ab_mean=rd.ab_mean[:n],
        ab_std=rd.ab_std[:n],
    )
    seq = small_engine.revise_read(rd_small)
    assert len(seq) > 0
    acgt = set("ACGT")
    assert set(seq) <= acgt


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
