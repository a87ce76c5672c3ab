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


def test_native_prep_matches_numpy(unitest_fast5_files):
    """C++ nr_prep_read vs the numpy prep path on real reads: identical
    normalizers/vlen, identical valid window samples, f16-close features."""
    import numpy as np
    import pytest

    from nanoreviser_tpu.io import get_read_data
    from nanoreviser_tpu.native import available, prep_read_native_arrays
    from nanoreviser_tpu.signal.host_prep import prep_read_numpy

    if not available():
        pytest.skip("libnanorev.so not available")
    for p in unitest_fast5_files[:3]:
        rd = get_read_data(str(p))
        ref = prep_read_numpy(rd)
        tail = rd.signal[rd.read_start_rel_to_raw :]
        win, vlen, feats, shift, scale = prep_read_native_arrays(
            tail, rd.starts, rd.bases, rd.lengths,
            rd.ab_mean, rd.ab_std, 50,
        )
        assert shift == ref.shift and scale == ref.scale
        np.testing.assert_array_equal(vlen, ref.vlen)
        # valid window samples identical; outside-valid cols are masked on
        # device, so only the valid span must agree
        left = (50 - vlen.astype(np.int32) + 1) // 2
        cols = np.arange(50)[None, :]
        valid = (cols >= left[:, None]) & (cols < (left + vlen)[:, None])
        np.testing.assert_array_equal(win[valid], ref.win[valid])
        # f16 features: f64->f16 (numpy) vs f64->f32->f16 (C++) may double-
        # round by 1 ulp
        np.testing.assert_allclose(
            feats.astype(np.float32), ref.feats.astype(np.float32),
            rtol=2e-3, atol=2e-3,
        )
