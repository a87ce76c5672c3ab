"""File-path and training-summary helpers.

Parity: reference fileoptions.py — the model filename scheme
``<species>_win<w>_<e>ep_model<k>.h5`` (:57-75) and the summary dict (:89-102)
are preserved so downstream tooling keeps working; weights themselves are
saved in our own msgpack format plus optional Keras-compatible h5 export.
"""

from __future__ import annotations

import json
import os
import time


def check_path(path: str) -> None:
    os.makedirs(str(path), exist_ok=True)


def model_fn_generate(
    model_dir: str,
    train_model_dir: str,
    output_dir: str,
    species: str,
    window_size: int,
    epochs: int,
    model_tag: str,
) -> tuple[str, str, str, str]:
    stem = f"{species}_win{window_size}_{epochs}ep_{model_tag}"
    model_predict_fn = os.path.join(model_dir, stem + ".h5")
    model_train_fn = os.path.join(train_model_dir, "train_" + stem + ".h5")
    # reference's 'hisroty' typo preserved for drop-in artifact compatibility
    model_history_fn = os.path.join(output_dir, stem + "_hisroty.csv")
    model_summary_fn = os.path.join(output_dir, stem + "_parameters.json")
    return model_predict_fn, model_train_fn, model_history_fn, model_summary_fn


def summary_generate(args, start_t: float) -> dict:
    return {
        "model_type": args.model_type,
        "species": args.species,
        "input_file": args.fast5_base_dir,
        "read_counts": args.read_counts,
        "window_size": args.window_size,
        "epochs": args.epochs,
        "batch_size": args.batch_size,
        "validation_split": args.validation_split,
        "training_time": str(int(time.time() - start_t)) + " seconds",
    }


def write_summary_file(history: dict, summary: dict, history_fn: str, summary_fn: str):
    with open(summary_fn, "w") as f:
        json.dump(summary, f)
    import pandas as pd

    pd.DataFrame(history).to_csv(history_fn, index=False)
