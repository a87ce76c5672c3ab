"""Measure the reference's CPU throughput on the unitest reads.

The reference's shipped observable inference path per read is: copy fast5 to
tmp -> per-event-loop decode (get_read_data) -> per-base-loop windowing
(signal_segmentation) -> (Guppy attempt fails: binary absent) -> write the
event-derived bases as fasta (SURVEY.md §0, NanoReviser.py:105-183). This
script executes exactly those reference functions *from source* under the
reference's own multiprocessing.Pool fan-out (NanoReviser.py:203-223) and
reports wall-clock reads/s. Keras model construction (which the reference
also pays per read, NanoReviser.py:129-130) is excluded — making the baseline
faster than the real reference, i.e. conservative for our speedup claims.

Usage: python benchmarks/reference_baseline.py [fast5_dir] [repeats]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(__file__))
from ref_exec import load_reference_functions  # noqa: E402

FAST5_DIR = "/root/reference/unitest/test_data/fast5"

_FNS = None


def _init():
    global _FNS
    decode = load_reference_functions(
        "nanorevutils/nanorev_fast5_handeler.py", ["get_read_data"]
    )["get_read_data"]
    seg = load_reference_functions(
        "nanorevutils/preprocessing.py", ["signal_segmentation"]
    )["signal_segmentation"]
    _FNS = (decode, seg)


def _one_read(task):
    fast5_dir, fn, tmp_root, slot = task
    decode, seg = _FNS
    src = os.path.join(fast5_dir, fn)
    tmp_dir = os.path.join(tmp_root, str(slot), "basecall_tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    dst = shutil.copy(src, tmp_dir)
    (abs_start, starts, lengths, bases, signal, ab_mean, ab_std) = decode(
        dst, "Basecall_1D_000", "BaseCalled_template"
    )
    tail = signal[int(abs_start):]
    seg(tail, starts, int(lengths[-1]))
    out = ">" + fn.replace(" ", "|||") + "\n" + "".join(bases)
    out_fn = os.path.join(tmp_root, str(slot), fn.split(".")[0] + "_out.fasta")
    with open(out_fn, "w") as fp:
        fp.write(out)
    return len(bases)


def main():
    fast5_dir = sys.argv[1] if len(sys.argv) > 1 else FAST5_DIR
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    fns = sorted(os.listdir(fast5_dir))
    pool_size = min(100, len(fns))

    best = None
    for _ in range(repeats):
        with tempfile.TemporaryDirectory() as tmp_root:
            tasks = [(fast5_dir, fn, tmp_root, i) for i, fn in enumerate(fns)]
            t0 = time.time()
            with mp.Pool(pool_size, initializer=_init) as pool:
                n_bases = sum(pool.map(_one_read, tasks))
            dt = time.time() - t0
        result = {
            "reads_per_s": len(fns) / dt,
            "bases_per_s": n_bases / dt,
            "wall_s": dt,
            "n_reads": len(fns),
            "pool_size": pool_size,
        }
        if best is None or result["reads_per_s"] > best["reads_per_s"]:
            best = result
    print(json.dumps(best))
    return best


if __name__ == "__main__":
    main()
