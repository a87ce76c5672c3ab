#!/usr/bin/env python
"""Ground-truth accuracy experiment: does the full pipeline actually CORRECT
reads? (round-2/3 verdict item — the reference's entire value claim,
/root/reference/README.md:17-21.)

No real reference genome ships with the test data, and purely RANDOM
mutations of a pseudo-reference are information-theoretically unlearnable
from signal — a model trained on them can only predict the signal's base.
So the truth here carries SYSTEMATIC, context-dependent substitutions: a
deterministic function of the local base context that the Bi-LSTM can
genuinely learn. That exercises every stage the production path uses —
k-mer seeding + banded-SW labeling, window/feature assembly, dual-model
training, Keras export, the streaming TPU inference engine, and the
revision merge — and measures, on HELD-OUT reads, whether revision moves
basecalls toward the truth.

Protocol:
  1. truth(read) = read bases with 3 context rules applied
     (CA,T->G / GG,A->C / TC,G->A), ~2-4%% of positions; one truth contig
     per read forms the training "genome".
  2. Label + train model1/model2 on the first 80 training reads.
  3. Revise the held-out 20 reads with the trained weights through the
     production StreamingReviser.
  4. Report per-read edit distance to truth BEFORE (basecall) vs AFTER
     (revised), via banded Levenshtein.

Prints a table + ONE JSON line; ACCURACY.md records the committed run.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_DIR = "/root/reference/unitest/training_data/fast5"
RULES = {("C", "A", "T"): "G", ("G", "G", "A"): "C", ("T", "C", "G"): "A"}
WINDOW = 13
EPOCHS = 4
N_TRAIN_READS = 80


def apply_rules(bases: str) -> str:
    out = list(bases)
    for i in range(2, len(bases)):
        w = RULES.get((bases[i - 2], bases[i - 1], bases[i]))
        if w is not None:
            out[i] = w
    return "".join(out)


def edit_distance(a: str, b: str, band: int = 256) -> int:
    """Banded Levenshtein distance (exact when the optimal path stays within
    the band; distances here are a few percent of read length, far inside).

    Row i covers j in [i-h, i+h]; the left-gap chain is resolved exactly via
    a running prefix-min (cur[k] = k + cummin(cur_nf[k'] - k'))."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return max(n, m)
    band = max(band, 2 * abs(n - m) + 8)
    h = band // 2
    av = np.frombuffer(a.encode(), np.uint8)
    bv = np.frombuffer(b.encode(), np.uint8)
    INF = np.int64(1) << 40
    ks = np.arange(band, dtype=np.int64)

    j_row = ks - h                              # row 0: D(0, j) = j
    prev = np.where((j_row >= 0) & (j_row <= m), np.abs(j_row), INF)
    for i in range(1, n + 1):
        j_row = i - h + ks
        jb = np.clip(j_row - 1, 0, m - 1)
        sub = (bv[jb] != av[i - 1]).astype(np.int64)
        diag = prev + sub                        # D(i-1, j-1) + sub
        up = np.concatenate([prev[1:], [INF]]) + 1   # D(i-1, j) + 1
        cur_nf = np.minimum(diag, up)
        cur_nf = np.where(j_row >= 1, cur_nf, INF)
        cur_nf = np.where(j_row == 0, np.int64(i), cur_nf)
        cur = np.minimum.accumulate(cur_nf - ks) + ks    # left-gap chain
        cur = np.where((j_row >= 0) & (j_row <= m), cur, INF)
        prev = cur
    k_end = m - n + h
    assert 0 <= k_end < band
    return int(prev[k_end])


def main():
    import jax

    from nanoreviser_tpu.align.sw import KmerIndex
    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.io import get_read_data, list_fast5_files
    from nanoreviser_tpu.models.export_keras import save_keras_weights
    from nanoreviser_tpu.parallel import make_mesh
    from nanoreviser_tpu.train.data import (
        label_read,
        load_training_corpus,
        save_read_npz,
    )
    from nanoreviser_tpu.train.loop import train_model

    fns = list_fast5_files(TRAIN_DIR)
    train_fns, eval_fns = fns[:N_TRAIN_READS], fns[N_TRAIN_READS:]
    print(f"{len(train_fns)} train reads, {len(eval_fns)} eval reads",
          flush=True)

    reads = {fn: get_read_data(os.path.join(TRAIN_DIR, fn)) for fn in fns}
    truth = {fn: apply_rules(rd.bases) for fn, rd in reads.items()}
    n_sites = {fn: sum(x != y for x, y in zip(reads[fn].bases, truth[fn]))
               for fn in fns}
    genome = {fn.split(".")[0]: truth[fn] for fn in train_fns}

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.time()
        index = KmerIndex(genome)
        npz_dir = os.path.join(tmp, "npz")
        os.makedirs(npz_dir)
        for fn in train_fns:
            labeled = label_read(
                os.path.join(TRAIN_DIR, fn), genome, engine="sw",
                kmer_index=index,
            )
            save_read_npz(labeled, os.path.join(npz_dir, fn.split(".")[0]))
        print(f"labeled {len(train_fns)} reads in {time.time()-t0:.1f}s",
              flush=True)

        corpus = load_training_corpus(npz_dir, WINDOW)
        print(f"corpus: {len(corpus.y)} windows", flush=True)
        mesh = make_mesh(jax.devices())

        model_paths = []
        for tag, y, n_classes in (("model1", corpus.y, 6),
                                  ("model2", corpus.y2, 5)):
            t0 = time.time()
            params, history = train_model(
                corpus.feats, corpus.signal, y,
                n_classes=n_classes, window=WINDOW, epochs=EPOCHS,
                batch_size=512, verbose=False, mesh=mesh,
            )
            path = os.path.join(tmp, f"{tag}.h5")
            save_keras_weights(params, path, WINDOW, n_classes)
            model_paths.append(path)
            print(f"{tag}: {EPOCHS} epochs in {time.time()-t0:.1f}s "
                  f"(final loss {history['loss'][-1]:.4f})", flush=True)

        engine = StreamingReviser(*model_paths)
        errors: list = []
        results = []
        items = [(fn, reads[fn]) for fn in eval_fns]
        for fn, rd, seq, _ in engine.revise_stream(iter(items), errors=errors):
            before = edit_distance(rd.bases, truth[fn])
            after = edit_distance(seq, truth[fn])
            results.append((fn, len(rd.bases), n_sites[fn], before, after))
        assert not errors, errors[:2]

    print(f"\n{'read':>8} {'len':>7} {'sites':>6} {'before':>7} {'after':>6}")
    for fn, ln, ns, b, a in results:
        print(f"{fn.split('_')[-2][-6:]:>8} {ln:7d} {ns:6d} {b:7d} {a:6d}")
    tb = sum(r[3] for r in results)
    ta = sum(r[4] for r in results)
    out = {
        "metric": "ground_truth_edit_distance",
        "eval_reads": len(results),
        "train_reads": len(train_fns),
        "epochs": EPOCHS,
        "total_before": tb,
        "total_after": ta,
        "reduction_pct": round(100.0 * (tb - ta) / max(tb, 1), 1),
        "mean_before_per_kb": round(
            1000.0 * tb / sum(r[1] for r in results), 2),
        "mean_after_per_kb": round(
            1000.0 * ta / sum(r[1] for r in results), 2),
        "improved_reads": sum(r[4] < r[3] for r in results),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
