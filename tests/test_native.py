"""Native C++ aligner: exact agreement with the JAX banded SW path."""

import numpy as np
import pytest

from nanoreviser_tpu import native
from nanoreviser_tpu.align.sw import align_banded, columns_from_ops

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libnanorev.so not built"
)


def _mutate(rng, seq, sub=0.06, ins=0.03, dele=0.03):
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


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_matches_jax(seed):
    rng = np.random.default_rng(seed)
    ref = "".join(rng.choice(list("ACGT"), 1200))
    read = _mutate(rng, ref[100:1100])
    for backend in ("jax",):
        ops_j, js_j, sc_j = align_banded(
            read, ref, band=256, t_lead=100, t_tail=100, backend="jax"
        )
    ops_n, js_n, sc_n = align_banded(
        read, ref, band=256, t_lead=100, t_tail=100, backend="native"
    )
    assert sc_n == sc_j
    assert js_n == js_j
    np.testing.assert_array_equal(ops_n, ops_j)


def test_native_identity():
    rng = np.random.default_rng(7)
    seq = "".join(rng.choice(list("ACGT"), 400))
    ops, j_start, score = align_banded(seq, seq, band=128, backend="native")
    rv, fv, mv = columns_from_ops(ops, seq, seq, j_start)
    assert j_start == 0
    assert rv == seq
    assert mv == "M" * len(seq)
