#!/usr/bin/env python
"""Benchmark: TPU model-path inference throughput on the unitest reads.

Prints ONE JSON line:
  {"metric": "model_path_reads_per_s_per_chip", "value": N, "unit": "reads/s",
   "vs_baseline": N / <reference CPU reads/s>, ...extras}

The headline is the resurrected model path (decode -> windows -> model1+model2
-> merge -> fasta) per chip, warm (post-compile). The baseline is the
reference's shipped per-read work (its own functions run from source under its
own Pool fan-out — benchmarks/reference_baseline.py); the reference does LESS
work per read (it never runs its models), so vs_baseline is conservative.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

FAST5_DIR = "/root/reference/unitest/test_data/fast5"
MODEL1 = "/root/reference/model/ecoli/ecoli_win13_50ep_model1.h5"
MODEL2 = "/root/reference/model/ecoli/ecoli_win13_50ep_model2.h5"

# measured once on this machine (2-core CPU, pool of 5 reads); re-measured
# live when the reference tree is present
FALLBACK_BASELINE = {"reads_per_s": 6.507, "bases_per_s": 53282.0}


def measure_baseline():
    try:
        out = subprocess.run(
            [sys.executable, os.path.join("benchmarks", "reference_baseline.py"),
             FAST5_DIR, "2"],
            capture_output=True, text=True, timeout=300,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:  # noqa: BLE001
        return dict(FALLBACK_BASELINE)


def main():
    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.io import get_read_data, list_fast5_files, write_read_fasta

    engine = StreamingReviser(MODEL1, MODEL2)
    fns = list_fast5_files(FAST5_DIR)
    reads = {fn: get_read_data(os.path.join(FAST5_DIR, fn)) for fn in fns}
    n_bases = sum(r.n_bases for r in reads.values())

    with tempfile.TemporaryDirectory() as out_dir:
        # warm-up: compile every bucket used by this read set
        for _ in engine.revise_stream(iter(reads.items())):
            pass

        # timed: full end-to-end warm path incl. re-decode + fasta write
        best_dt = float("inf")
        for _ in range(3):
            t0 = time.time()
            items = (
                (fn, get_read_data(os.path.join(FAST5_DIR, fn))) for fn in fns
            )
            for fn, _rd, seq in engine.revise_stream(items):
                write_read_fasta(
                    fn, os.path.join(out_dir, fn.split(".")[0] + "_out.fasta"), seq
                )
            best_dt = min(best_dt, time.time() - t0)

        # passthrough (bit-exact reference-output path) timing
        t0 = time.time()
        for fn in fns:
            rd = get_read_data(os.path.join(FAST5_DIR, fn))
            write_read_fasta(
                fn, os.path.join(out_dir, fn.split(".")[0] + "_pt.fasta"), rd.bases
            )
        passthrough_dt = time.time() - t0

    baseline = measure_baseline()
    reads_per_s = len(fns) / best_dt
    result = {
        "metric": "model_path_reads_per_s_per_chip",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / baseline["reads_per_s"], 3),
        "bases_per_s": round(n_bases / best_dt, 1),
        "passthrough_reads_per_s": round(len(fns) / passthrough_dt, 3),
        "passthrough_vs_baseline": round(
            (len(fns) / passthrough_dt) / baseline["reads_per_s"], 3
        ),
        "baseline_reads_per_s": round(baseline["reads_per_s"], 3),
        "n_reads": len(fns),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
