#!/usr/bin/env python
"""Instrumented end-to-end engine run: where does wall time go?

Monkeypatch-times the engine's internal phases over the 100-read set:
  add      _add_read packing
  submit   _submit_group (device_put + dispatch)
  wait     _Pending.future.result() blocking in _finish
  merge    label unpack + merge_revision
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_DIR = "/root/reference/unitest/training_data/fast5"
MODEL1 = "/root/reference/model/ecoli/ecoli_win13_50ep_model1.h5"
MODEL2 = "/root/reference/model/ecoli/ecoli_win13_50ep_model2.h5"

P = lambda *a: print(*a, flush=True)


def main():
    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.infer import streaming as S
    from nanoreviser_tpu.io import get_read_data, list_fast5_files

    engine = StreamingReviser(MODEL1, MODEL2)
    fns = list_fast5_files(TRAIN_DIR)
    reads = [(fn, get_read_data(os.path.join(TRAIN_DIR, fn))) for fn in fns]
    P(f"{len(reads)} reads decoded")

    tm = {"add": 0.0, "submit": 0.0, "wait": 0.0, "merge": 0.0}

    orig_add = engine._add_read
    orig_submit = engine._submit_group
    orig_finish = engine._finish

    def timed_add(b, n, r, p):
        t0 = time.perf_counter()
        out = orig_add(b, n, r, p)
        tm["add"] += time.perf_counter() - t0
        return out

    def timed_submit(group):
        t0 = time.perf_counter()
        out = orig_submit(group)
        tm["submit"] += time.perf_counter() - t0
        return out

    def timed_finish(pending, emit="seq"):
        t0 = time.perf_counter()
        pending.future.result()
        tm["wait"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        for item in orig_finish(pending, emit):
            tm["merge"] += time.perf_counter() - t0
            yield item
            t0 = time.perf_counter()
        tm["merge"] += time.perf_counter() - t0

    engine._add_read = timed_add
    engine._submit_group = timed_submit
    engine._finish = timed_finish

    for rep in range(3):
        for k in tm:
            tm[k] = 0.0
        t0 = time.time()
        errors = []
        n = sum(1 for _ in engine.revise_stream(iter(reads), errors=errors))
        e2e = time.time() - t0
        assert not errors, errors[:2]
        acc = sum(tm.values())
        P(f"rep{rep}: e2e={e2e:.3f}s  add={tm['add']:.3f} submit={tm['submit']:.3f} "
          f"wait={tm['wait']:.3f} merge={tm['merge']:.3f} "
          f"other={e2e-acc:.3f}  ({n} reads, {n/e2e:.1f} reads/s)")


if __name__ == "__main__":
    main()
