"""REAL-TPU compile-and-run tests for the production Pallas kernel.

The main suite (tests/) pins JAX_PLATFORMS=cpu and exercises the kernels in
interpret mode only — which is exactly how a Mosaic-invalid kernel shipped in
round 1. These tests compile the production kernel on the actual chip and
assert the model path produces real (non-passthrough) revisions.

Run:  python -m pytest tests_tpu/ -x -q   (on a machine with a TPU)
      (unitest.sh also drives the same path end-to-end via the CLI)
"""

import os
import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

if jax.default_backend() != "tpu":  # pragma: no cover
    pytest.skip("requires a real TPU backend", allow_module_level=True)

REFERENCE_DIR = pathlib.Path("/root/reference")
FAST5_DIR = REFERENCE_DIR / "unitest" / "test_data" / "fast5"
M1 = REFERENCE_DIR / "model" / "ecoli" / "ecoli_win13_50ep_model1.h5"
M2 = REFERENCE_DIR / "model" / "ecoli" / "ecoli_win13_50ep_model2.h5"


@pytest.fixture(scope="module")
def engine():
    from nanoreviser_tpu.infer import StreamingReviser

    if not (M1.exists() and M2.exists() and FAST5_DIR.is_dir()):
        pytest.skip("reference data not available")
    eng = StreamingReviser(str(M1), str(M2))
    assert eng._use_pallas, "TPU backend must use the Pallas kernel"
    return eng


def test_production_kernel_compiles_and_revises(engine):
    """The round-1 failure mode: kernel fails Mosaic compile, every read
    silently degrades to passthrough, output == input. Assert the opposite."""
    from nanoreviser_tpu.io import get_read_data, list_fast5_files

    fns = list_fast5_files(str(FAST5_DIR))
    reads = [
        (fn, get_read_data(os.path.join(str(FAST5_DIR), fn))) for fn in fns
    ]
    errors: list = []
    out = list(engine.revise_stream(iter(reads), errors=errors))
    assert errors == [], f"degraded reads: {errors}"
    assert len(out) == len(fns)
    n_edited = sum(1 for _, rd, seq, _ in out if seq != rd.bases)
    assert n_edited == len(out), (
        f"only {n_edited}/{len(out)} reads were actually revised — "
        "silent passthrough degradation"
    )


def test_kernel_matches_jnp_reference_on_real_read(engine):
    """TPU kernel labels vs the f32 jnp stack on a real read's windows."""
    import jax.numpy as jnp

    from nanoreviser_tpu.io import get_read_data, list_fast5_files
    from nanoreviser_tpu.models import load_keras_weights
    from nanoreviser_tpu.models.fused import (
        fold_inference_params,
        lstm_stack_apply,
        signal_branch_apply,
    )
    from nanoreviser_tpu.ops.reviser_kernel import GP, stack_logits_full
    from nanoreviser_tpu.signal.features import assemble_features
    from nanoreviser_tpu.signal.segmentation import segment_signal

    fn = list_fast5_files(str(FAST5_DIR))[0]
    rd = get_read_data(os.path.join(str(FAST5_DIR), fn))
    t = engine.window
    tail = rd.signal[rd.read_start_rel_to_raw :]
    seg = segment_signal(tail, rd.starts, int(rd.lengths[-1]))
    durations = np.concatenate([np.diff(rd.starts), [rd.lengths[-1]]])
    feats = assemble_features(
        rd.bases, seg.event_mean, seg.event_std, durations,
        rd.ab_mean, rd.ab_std, seg.shift, seg.scale,
    )
    n = (rd.n_bases - t) // engine.block * engine.block + t
    windows = seg.windows[:n]
    feats = feats[:n]

    sig_pad = jnp.pad(jnp.asarray(windows, jnp.bfloat16), ((0, 0), (0, GP - 50)))
    feat_pad = jnp.pad(jnp.asarray(feats, jnp.bfloat16), ((0, 0), (0, GP - 6)))
    logits = np.asarray(
        stack_logits_full(
            engine._ws, sig_pad, feat_pad, t_len=t, block=engine.block
        )
    )

    # f32 oracle on the same windows (CPU)
    cpu = jax.devices("cpu")[0]
    p1, _, nc1 = load_keras_weights(str(M1))
    f1 = fold_inference_params(p1)
    idx = np.arange(n - t)[:, None] + np.arange(t)[None, :]
    with jax.default_device(cpu):
        ref = np.asarray(
            lstm_stack_apply(
                f1,
                jnp.asarray(feats[idx]),
                signal_branch_apply(f1, jnp.asarray(windows[idx]), engine.cfg),
            )
        )
    agree = (logits[0, :, :nc1].argmax(1) == ref.argmax(1)).mean()
    assert agree > 0.995, f"TPU/f32 label agreement {agree} on real windows"
