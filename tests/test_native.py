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
        # f16 features now bit-exact: the C++ path does all-f64 math and a
        # single-rounded f64->f16 (round-to-odd via f32), matching numpy
        np.testing.assert_array_equal(
            feats.view(np.uint16), ref.feats.view(np.uint16)
        )


def test_native_compact_matches_numpy(unitest_fast5_files):
    """C++ nr_compact_read vs compact_read_numpy on real reads: identical
    compacted signal, positions, vlen, normalizers and bit-exact features."""
    from nanoreviser_tpu.io import get_read_data
    from nanoreviser_tpu.native import compact_read_native_arrays
    from nanoreviser_tpu.signal.host_prep import compact_read_numpy

    for p in unitest_fast5_files[:3]:
        rd = get_read_data(str(p))
        ref = compact_read_numpy(rd)
        tail = rd.signal[rd.read_start_rel_to_raw :]
        csig, pos0, vlen, feats, shift, scale = compact_read_native_arrays(
            tail, rd.starts, rd.bases, rd.lengths,
            rd.ab_mean, rd.ab_std, 50,
        )
        assert shift == ref.shift and scale == ref.scale
        np.testing.assert_array_equal(csig, ref.csig)
        np.testing.assert_array_equal(pos0, ref.pos0)
        np.testing.assert_array_equal(vlen, ref.vlen)
        np.testing.assert_array_equal(
            feats.view(np.uint16), ref.feats.view(np.uint16)
        )


def test_truncated_signal_clamps_like_cpp(unitest_fast5_files):
    """A tail barely shorter than starts[-1]+last_dur must not crash the
    numpy paths (ends clamp, round-3 verdict item 5) and must agree with
    the C++ twin on both prep flavors."""
    import dataclasses

    from nanoreviser_tpu.io import get_read_data
    from nanoreviser_tpu.native import compact_read_native_arrays
    from nanoreviser_tpu.signal.host_prep import (
        compact_read_numpy,
        prep_read_numpy,
    )

    rd = get_read_data(str(unitest_fast5_files[0]))
    # cut the signal mid-way through the final event segment
    cut = rd.read_start_rel_to_raw + int(rd.starts[-1]) + 1
    rd = dataclasses.replace(rd, signal=rd.signal[:cut])
    p = prep_read_numpy(rd)          # must not IndexError
    c = compact_read_numpy(rd)
    assert p.n_bases == c.n_bases == rd.n_bases
    tail = rd.signal[rd.read_start_rel_to_raw :]
    csig, pos0, vlen, feats, shift, scale = compact_read_native_arrays(
        tail, rd.starts, rd.bases, rd.lengths, rd.ab_mean, rd.ab_std, 50,
    )
    np.testing.assert_array_equal(csig, c.csig)
    np.testing.assert_array_equal(
        feats.view(np.uint16), c.feats.view(np.uint16)
    )
    np.testing.assert_array_equal(
        feats.view(np.uint16), p.feats.view(np.uint16)
    )


def test_native_encode_wire_matches_numpy(unitest_fast5_files):
    """C++ nr_encode_wire vs infer.wire.encode_read on real reads: identical
    streams, escape lists (indices, values, order) and derived arrays."""
    from nanoreviser_tpu.infer.wire import encode_read
    from nanoreviser_tpu.io import get_read_data
    from nanoreviser_tpu.native import encode_wire_native
    from nanoreviser_tpu.signal.host_prep import compact_read_numpy

    for p in unitest_fast5_files[:3]:
        c = compact_read_numpy(get_read_data(str(p)))
        ref = encode_read(c)
        n, m = c.n_bases, c.n_samples
        out = {
            "sig8": np.zeros(m, np.uint8),
            "posd": np.zeros(n, np.uint8),
            "evf": np.zeros((n, 4), np.float16),
            "codes": np.zeros(n, np.uint8),
            "sig_esc_idx": np.zeros(m // 16 + 8, np.int32),
            "sig_esc_delta": np.zeros(m // 16 + 8, np.int32),
            "dur_esc_idx": np.zeros(n // 4 + 8, np.int32),
            "dur_esc_f32": np.zeros(n // 4 + 8, np.float32),
            "vlen_esc_idx": np.zeros(4096, np.int32),
            "vlen_esc_val": np.zeros(4096, np.int32),
            "col_esc_idx": np.zeros(4096, np.int32),
        }
        ne, nd, nv, nc = encode_wire_native(c, out)
        assert (ne, nd, nv, nc) == (
            len(ref.sig_esc_idx), len(ref.dur_esc_idx),
            len(ref.vlen_esc_idx), len(ref.col_esc_idx))
        np.testing.assert_array_equal(out["sig8"], ref.sig8)
        np.testing.assert_array_equal(out["posd"], ref.posd)
        np.testing.assert_array_equal(
            out["evf"].view(np.uint16), ref.evf.view(np.uint16))
        np.testing.assert_array_equal(out["codes"], ref.codes)
        np.testing.assert_array_equal(out["sig_esc_idx"][:ne], ref.sig_esc_idx)
        np.testing.assert_array_equal(
            out["sig_esc_delta"][:ne], ref.sig_esc_delta)
        np.testing.assert_array_equal(out["dur_esc_idx"][:nd], ref.dur_esc_idx)
        np.testing.assert_array_equal(out["dur_esc_f32"][:nd], ref.dur_esc_f32)
        np.testing.assert_array_equal(
            out["vlen_esc_idx"][:nv], ref.vlen_esc_idx)
        np.testing.assert_array_equal(
            out["vlen_esc_val"][:nv], ref.vlen_esc_val)
        np.testing.assert_array_equal(out["col_esc_idx"][:nc], ref.col_esc_idx)
