"""Pinned model-path goldens (unitest/goldens/) — existence, format, and
(on a TPU session) bit-exact output parity.

Round-4 lesson baked into the layout: the unitest driver's scratch outputs
live in a gitignored directory, and the canonical TPU outputs live here
where no code path writes. bench.py re-checks parity on the real chip every
benchmark run; this test adds the same check for TPU test sessions and
keeps the CPU suite honest about the files' shape.
"""

import os

import pytest

GOLD_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "unitest", "goldens",
)
UNITEST = "/root/reference/unitest/test_data/fast5"


def _golden_files():
    return sorted(
        f for f in os.listdir(GOLD_DIR) if f.endswith("_out.fasta")
    )


def test_goldens_present_and_wellformed():
    files = _golden_files()
    assert len(files) == 5
    for f in files:
        text = open(os.path.join(GOLD_DIR, f)).read()
        header, seq = text.split("\n", 1)
        assert header.startswith(">") and header.endswith(".fast5")
        assert not seq.endswith("\n")        # reference quirk: no trailing \n
        assert set(seq) <= set("ACGT")
        assert len(seq) > 1000


def test_goldens_match_tpu_output():
    """On a TPU session, the full production path must reproduce the pinned
    goldens byte-for-byte. (bench.py enforces the same on every bench run.)"""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("goldens pin TPU-path numerics; no TPU in this session")
    if not os.path.isdir(UNITEST):
        pytest.skip("reference unitest data not present")

    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.io import list_fast5_files
    from nanoreviser_tpu.signal.host_prep import compact_fast5

    engine = StreamingReviser(
        "/root/reference/model/ecoli/ecoli_win13_50ep_model1.h5",
        "/root/reference/model/ecoli/ecoli_win13_50ep_model2.h5",
    )
    fns = list_fast5_files(UNITEST)
    items = [(fn, compact_fast5(os.path.join(UNITEST, fn))) for fn in fns]
    errors: list = []
    for fn, _, seq, _ in engine.revise_stream(iter(items), errors=errors):
        stem = fn.split(".")[0]
        gold = open(os.path.join(GOLD_DIR, stem + "_out.fasta")).read()
        gold_seq = gold.split("\n", 1)[1]
        assert seq == gold_seq, (
            f"{stem}: model-path output diverged from the pinned golden — "
            "see unitest/goldens/README.md for the blessed-update procedure"
        )
    assert not errors, errors
