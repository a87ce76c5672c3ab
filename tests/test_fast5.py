"""Event-decode parity: vectorized decode vs the reference's per-event loop."""

import numpy as np
import pytest

from nanoreviser_tpu.io import get_read_data, extract_fastq
from tests.ref_harness import reference_get_read_data


def test_decode_matches_embedded_fastq(unitest_fast5_files):
    """Empirical invariant (SURVEY.md §0): decoded == embedded fastq[2:-2]."""
    for fn in unitest_fast5_files:
        rd = get_read_data(str(fn))
        bases7, _ = extract_fastq(str(fn), trim=7)
        # extract_fastq trims 7/7; decode trims 2/2 → compare on overlap
        assert rd.bases[5:-5] == bases7
        assert rd.n_bases == len(bases7) + 10


@pytest.mark.parametrize("subset", [slice(0, 5)])
def test_decode_matches_reference_loop(unitest_fast5_files, subset):
    ref_fn = reference_get_read_data()
    for fn in unitest_fast5_files[subset]:
        rd = get_read_data(str(fn))
        (abs_start, starts, lengths, bases, signal, ab_mean, ab_std) = ref_fn(
            str(fn), "Basecall_1D_000", "BaseCalled_template"
        )
        assert rd.read_start_rel_to_raw == abs_start
        np.testing.assert_array_equal(rd.starts, np.asarray(starts))
        np.testing.assert_array_equal(rd.lengths, np.asarray(lengths))
        assert rd.bases == "".join(bases)
        np.testing.assert_array_equal(rd.signal, signal)
        np.testing.assert_array_equal(rd.ab_mean, np.asarray(ab_mean))
        np.testing.assert_array_equal(rd.ab_std, np.asarray(ab_std))


def test_decode_matches_reference_on_training_reads(train_fast5_files):
    ref_fn = reference_get_read_data()
    for fn in train_fast5_files[:8]:
        rd = get_read_data(str(fn))
        (abs_start, starts, lengths, bases, *_rest) = ref_fn(
            str(fn), "Basecall_1D_000", "BaseCalled_template"
        )
        assert rd.read_start_rel_to_raw == abs_start
        np.testing.assert_array_equal(rd.starts, np.asarray(starts))
        assert rd.bases == "".join(bases)
