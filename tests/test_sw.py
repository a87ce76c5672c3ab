"""Banded SW labeler: label recovery on synthetic mutated references."""

import numpy as np
import pytest

from nanoreviser_tpu.align.sw import (
    KmerIndex,
    align_banded,
    align_read_to_genome,
    columns_from_ops,
)


def _mutate(rng, seq: str, sub=0.05, ins=0.02, dele=0.02) -> str:
    bases = "ACGT"
    out = []
    for ch in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append(bases[rng.integers(4)])
        else:
            out.append(ch)
        if rng.random() < ins:
            out.append(bases[rng.integers(4)])
    return "".join(out)


def test_align_banded_identity():
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), 300))
    ops, j_start, score = align_banded(seq, seq, band=128)
    assert j_start == 0
    rv, fv, mv = columns_from_ops(ops, seq, seq, j_start)
    assert rv == seq
    assert mv == "M" * len(seq)


def test_align_banded_with_errors():
    rng = np.random.default_rng(1)
    ref = "".join(rng.choice(list("ACGT"), 500))
    read = _mutate(rng, ref)
    ops, j_start, _ = align_banded(read, ref, band=256)
    rv, fv, mv = columns_from_ops(ops, read, ref, j_start)
    # read fully consumed; match rate high
    assert rv.replace("-", "") == read
    m_frac = mv.count("M") / len(read)
    assert m_frac > 0.85, m_frac


def test_align_banded_offset_window():
    """Read placed mid-window: glocal alignment must skip the overhangs."""
    rng = np.random.default_rng(2)
    core = "".join(rng.choice(list("ACGT"), 400))
    target = (
        "".join(rng.choice(list("ACGT"), 150))
        + core
        + "".join(rng.choice(list("ACGT"), 150))
    )
    ops, j_start, _ = align_banded(core, target, band=512)
    assert abs(j_start - 150) < 20
    rv, fv, mv = columns_from_ops(ops, core, target, j_start)
    assert mv.count("M") / len(core) > 0.95


def test_seed_and_align_genome():
    rng = np.random.default_rng(3)
    genome = {"chr1": "".join(rng.choice(list("ACGT"), 20000))}
    index = KmerIndex(genome)
    true_start = 5000
    read = _mutate(rng, genome["chr1"][true_start : true_start + 1500])
    res = align_read_to_genome(read, index, genome)
    assert res is not None
    assert res.strand == "+"
    assert abs(res.genome_start - true_start) < 50
    m_frac = res.map_vals.count("M") / len(read)
    assert m_frac > 0.85

    # reverse-strand read
    from nanoreviser_tpu.align.sam import rev_comp

    read_rc = rev_comp(read)
    res2 = align_read_to_genome(read_rc, index, genome)
    assert res2 is not None
    assert res2.strand == "-"
    assert res2.map_vals.count("M") / len(read_rc) > 0.85
