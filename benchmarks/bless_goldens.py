#!/usr/bin/env python
"""Regenerate the pinned TPU model-path goldens (unitest/goldens/).

Refuses to run without --yes, prints the per-read diff summary, and reminds
the operator that the commit must cite accuracy evidence (see
unitest/goldens/README.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UNITEST = "/root/reference/unitest/test_data/fast5"
M1 = "/root/reference/model/ecoli/ecoli_win13_50ep_model1.h5"
M2 = "/root/reference/model/ecoli/ecoli_win13_50ep_model2.h5"
GOLD_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "unitest", "goldens")


def main():
    if "--yes" not in sys.argv:
        print("This rewrites the pinned model-path goldens.\n"
              "Run with --yes AFTER producing accuracy evidence "
              "(unitest/goldens/README.md).")
        return 1
    import jax

    if jax.default_backend() not in ("tpu",):
        print(f"refusing: goldens are TPU outputs, backend is "
              f"{jax.default_backend()}")
        return 1

    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.io import list_fast5_files
    from nanoreviser_tpu.io.writers import write_read_fasta
    from nanoreviser_tpu.signal.host_prep import compact_fast5

    engine = StreamingReviser(M1, M2)
    fns = list_fast5_files(UNITEST)
    items = [(fn, compact_fast5(os.path.join(UNITEST, fn))) for fn in fns]
    errors: list = []
    n_changed = 0
    for fn, _, seq, _ in engine.revise_stream(iter(items), errors=errors):
        assert not errors, errors
        stem = fn.split(".")[0]
        out_fn = os.path.join(GOLD_DIR, stem + "_out.fasta")
        old = open(out_fn).read() if os.path.exists(out_fn) else ""
        write_read_fasta(fn, out_fn, seq)
        new = open(out_fn).read()
        changed = old != new
        n_changed += changed
        print(f"{'CHANGED' if changed else 'same   '} {stem}")
    print(f"{n_changed}/{len(fns)} goldens changed — commit WITH accuracy "
          "evidence cited.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
