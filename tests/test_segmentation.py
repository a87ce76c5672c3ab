"""Signal-windowing parity: vectorized segmentation vs the reference loop."""

import numpy as np

from nanoreviser_tpu.io import get_read_data
from nanoreviser_tpu.signal import segment_signal, assemble_features, base_labels
from tests.ref_harness import reference_get_read_data, reference_signal_segmentation


def test_segmentation_matches_reference(unitest_fast5_files):
    ref_seg = reference_signal_segmentation()
    for fn in unitest_fast5_files[:3]:
        rd = get_read_data(str(fn))
        tail = rd.signal[rd.read_start_rel_to_raw:]
        seg = segment_signal(
            tail, rd.starts, int(rd.lengths[-1]), query_len=50, dtype=np.float64
        )
        windows_ref, mean_ref, std_ref, shift_ref, scale_ref = ref_seg(
            tail, rd.starts, int(rd.lengths[-1]), query_len=50
        )
        assert seg.shift == shift_ref
        assert seg.scale == scale_ref
        np.testing.assert_array_equal(seg.windows, np.asarray(windows_ref))
        np.testing.assert_allclose(seg.event_mean, np.asarray(mean_ref), rtol=0, atol=0)
        np.testing.assert_allclose(seg.event_std, np.asarray(std_ref), rtol=1e-9)
        assert seg.windows.shape == (rd.n_bases, 50)


def test_window_count_one_per_base(unitest_fast5_files):
    rd = get_read_data(str(unitest_fast5_files[0]))
    tail = rd.signal[rd.read_start_rel_to_raw:]
    seg = segment_signal(tail, rd.starts, int(rd.lengths[-1]))
    assert seg.windows.shape[0] == rd.n_bases
    assert seg.windows.dtype == np.float32


def test_feature_assembly_shapes(unitest_fast5_files):
    rd = get_read_data(str(unitest_fast5_files[0]))
    tail = rd.signal[rd.read_start_rel_to_raw:]
    seg = segment_signal(tail, rd.starts, int(rd.lengths[-1]))
    feats = assemble_features(
        rd.bases, seg.event_mean, seg.event_std, rd.lengths,
        rd.ab_mean, rd.ab_std, seg.shift, seg.scale,
    )
    assert feats.shape == (rd.n_bases, 6)
    assert feats.dtype == np.float32
    # color feature for 'A' is 250/300
    labels = base_labels(rd.bases)
    assert np.all((labels >= 2) & (labels <= 5))  # decoded bases are ACGT


def test_segmentation_reference_loop_vs_vectorized_synthetic():
    ref_seg = reference_signal_segmentation()
    rng = np.random.default_rng(0)
    sig = rng.integers(400, 900, size=2000).astype(np.int16)
    starts = np.sort(rng.choice(np.arange(0, 1900), size=120, replace=False))
    seg = segment_signal(sig, starts, 5, query_len=50, dtype=np.float64)
    windows_ref, mean_ref, std_ref, shift_ref, scale_ref = ref_seg(sig, starts, 5)
    np.testing.assert_array_equal(seg.windows, np.asarray(windows_ref))
    np.testing.assert_allclose(seg.event_mean, np.asarray(mean_ref))
    np.testing.assert_allclose(seg.event_std, np.asarray(std_ref), rtol=1e-9)
