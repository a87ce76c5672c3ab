#!/usr/bin/env python
"""Model-path accuracy evidence (VERDICT r1 item 6).

The reference's purpose is error *correction* (reference README.md:17-21);
this reports what the models actually do to real reads: per-read edit
counts by type, identity between the revised sequence and the original
event-derived bases (== embedded fastq[2:-2]), and model1's center-base
agreement (on a mostly-correct read, a discriminative model must agree with
the original base at the vast majority of positions — a collapsed or
mis-wired model shows up immediately as agreement near a class prior).

Writes ACCURACY.md and prints one JSON line. Exits 1 if the evidence says
the model path is degenerate:
  * any read degraded, or
  * mean center agreement < 0.85, or
  * zero edits across all reads (passthrough), or
  * edit rate > 20% (label/merge mis-wiring).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

UNITEST_DIR = "/root/reference/unitest/test_data/fast5"
TRAIN_DIR = "/root/reference/unitest/training_data/fast5"
MODEL1 = "/root/reference/model/ecoli/ecoli_win13_50ep_model1.h5"
MODEL2 = "/root/reference/model/ecoli/ecoli_win13_50ep_model2.h5"


def report_reads(engine, fast5_dir, fns):
    from nanoreviser_tpu.infer.merge import (
        calibrate_center_offset,
        merge_revision,
        revision_stats,
    )
    from nanoreviser_tpu.io import get_read_data

    reads = [(fn, get_read_data(os.path.join(fast5_dir, fn))) for fn in fns]
    errors: list = []
    rows = []
    off = None
    for name, rd, y1, y2 in engine.revise_stream(
        iter(reads), errors=errors, emit="labels"
    ):
        if y1 is None:
            continue
        if off is None:
            off, agree = calibrate_center_offset(rd.bases, y1, engine.window)
            print(f"center offset: {off} (agreement {agree:.4f})")
        stats = revision_stats(rd.bases, y1, y2, center_offset=off)
        seq = merge_revision(rd.bases, y1, y2, align="center",
                             window=engine.window, center_offset=off)
        stats["read"] = name
        stats["n_bases"] = rd.n_bases
        stats["revised_len"] = len(seq)
        stats["edit_rate"] = stats["edits"] / max(stats["covered"], 1)
        rows.append(stats)
    return rows, errors


def main():
    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.io import list_fast5_files

    # --species human profiles the reference's DEFAULT pair (-S human) and
    # only prints the JSON line (ACCURACY.md is the curated document; its
    # §2 embeds these outputs rather than being overwritten)
    m1, m2, write_md = MODEL1, MODEL2, "--no-write" not in sys.argv
    if "--species" in sys.argv:
        sp = sys.argv[sys.argv.index("--species") + 1]
        base = f"/root/reference/model/{sp}"
        m1 = os.path.join(base, f"{sp}_win13_50ep_model1.h5")
        m2 = os.path.join(base, f"{sp}_win13_50ep_model2.h5")
        write_md = False

    engine = StreamingReviser(m1, m2)
    fns = list_fast5_files(UNITEST_DIR)
    rows, errors = report_reads(engine, UNITEST_DIR, fns)

    train_rows = []
    if os.path.isdir(TRAIN_DIR):
        train_fns = list_fast5_files(TRAIN_DIR)[:20]
        train_rows, terr = report_reads(engine, TRAIN_DIR, train_fns)
        errors += terr

    all_rows = rows + train_rows
    agree = float(np.mean([r["center_agreement"] for r in all_rows]))
    edits = int(np.sum([r["edits"] for r in all_rows]))
    covered = int(np.sum([r["covered"] for r in all_rows]))
    edit_rate = edits / max(covered, 1)

    ok = (
        not errors
        and agree >= 0.85
        and edits > 0
        and edit_rate <= 0.20
    )

    lines = [
        "# ACCURACY — model-path evidence (shipped ecoli weights)",
        "",
        f"Reads: {len(all_rows)} ({len(rows)} unitest + {len(train_rows)} "
        "training); degraded: " + str(len(errors)),
        f"Mean model1 center-base agreement: **{agree:.4f}**",
        f"Total edits: **{edits}** over {covered} covered positions "
        f"(rate {edit_rate:.4%})",
        "",
        "| read | bases | subs | dels recovered | ins dropped | "
        "agreement | edit rate |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in all_rows:
        lines.append(
            f"| {r['read'][:46]} | {r['n_bases']} | {r['substitutions']} | "
            f"{r['deletions_recovered']} | {r['insertions_dropped']} | "
            f"{r['center_agreement']:.4f} | {r['edit_rate']:.4%} |"
        )
    lines += [
        "",
        "Interpretation: the shipped ecoli weights revise real R9.4 E. coli",
        "reads with a small, plausible edit rate while agreeing with the",
        "original base at almost all positions — i.e. the model path applies",
        "targeted corrections, not noise, and is not passing reads through.",
        "(Absolute error-rate improvement vs a reference genome cannot be",
        "measured on this checkout: the training genome is a missing blob,",
        "SURVEY.md §4.)",
    ]
    if write_md:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "ACCURACY.md"), "w") as fp:
            fp.write("\n".join(lines) + "\n")

    print(json.dumps({
        "reads": len(all_rows),
        "degraded": len(errors),
        "mean_center_agreement": round(agree, 4),
        "total_edits": edits,
        "edit_rate": round(edit_rate, 6),
        "ok": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
