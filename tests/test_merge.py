"""Revision-merge parity vs the reference get_base_2 executed from source."""

import numpy as np

from nanoreviser_tpu.infer.merge import labels_to_bases, merge_core, merge_revision
from tests.ref_harness import reference_output_handler


def _ref_merge():
    # get_base_2 operates on chars and carries the shared branch semantics
    fns = reference_output_handler(["get_base_2"])
    return fns["get_base_2"]


def _codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), dtype=np.uint8)


def test_merge_core_matches_reference_random():
    ref = _ref_merge()
    rng = np.random.default_rng(7)
    alphabet = list("ACGT-D")
    for _ in range(20):
        n = int(rng.integers(5, 200))
        bases = "".join(rng.choice(list("ACGT"), n))
        y1 = "".join(rng.choice(alphabet, n))
        y2 = "".join(rng.choice(list("ACGT-"), n))
        ref_out = ref(list(bases), list(y1), list(y2))
        mine = merge_core(_codes(bases), _codes(y1), _codes(y2))
        mine = np.concatenate([_codes(y1[0]), mine])
        mine = mine[mine != ord("-")].tobytes().decode()
        assert mine == ref_out


def test_merge_revision_reference_mode():
    ref = _ref_merge()
    rng = np.random.default_rng(3)
    n = 100
    bases = "".join(rng.choice(list("ACGT"), n))
    y1_labels = rng.integers(0, 6, n)
    y2_labels = rng.integers(0, 5, n)
    y1c = labels_to_bases(y1_labels).tobytes().decode()
    y2c = labels_to_bases(y2_labels, model2=True).tobytes().decode()
    expected = ref(list(bases), list(y1c), list(y2c))
    got = merge_revision(bases, y1_labels, y2_labels, align="reference")
    assert got == expected


def test_merge_revision_center_mode_passthrough_outside_coverage():
    bases = "ACGTACGTACGTA"
    window = 5
    n_windows = len(bases) - window
    # model predicts 'keep' (label == base) everywhere
    from nanoreviser_tpu.signal.features import base_labels

    set_bef = (window - 1) // 2
    covered = bases[set_bef : set_bef + n_windows]
    y1 = base_labels(covered)
    y2 = y1 - 1  # model2 class space
    got = merge_revision(bases, y1, y2, align="center", window=window)
    assert got == bases
