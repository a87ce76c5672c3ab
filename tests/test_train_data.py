"""Streaming training corpus: sample-exact parity with the reference's
materialized window tensors (nanorevtrainutils.py:181-213) without the
[W, T, 50] RAM blowup (SURVEY.md §7 hard-part 6)."""

import numpy as np

from nanoreviser_tpu.train.data import (
    BatchIterator,
    TrainingCorpus,
    load_training_corpus,
)


def _fake_npz(tmp_path, n_reads=3, seed=0):
    rng = np.random.default_rng(seed)
    for r in range(n_reads):
        n = int(rng.integers(40, 80))
        np.savez(
            tmp_path / f"read{r}.npz",
            refvals=rng.integers(0, 6, n),
            refvals2=rng.integers(1, 6, n),
            readVals=rng.choice([250, 180, 100, 30], n),
            signal_mean=rng.normal(600, 40, n),
            signal_std=rng.normal(20, 4, n),
            signal_len=rng.integers(3, 30, n),
            ab_mean=rng.normal(0, 1, n),
            ab_std=rng.normal(1, 0.2, n),
            signal_x=rng.normal(0, 1, (n, 50)),
            mapvals=np.array(["M"] * n),
            starts=np.arange(n) * 9,
            scale=54.0,
            shift=687.0,
        )


def _reference_windows(tmp_path, window):
    """The reference's own corpus construction (get_trainning_input
    semantics: concat all reads, slide window, center targets)."""
    xs, sigs, ys, y2s = [], [], [], []
    import os

    for fn in sorted(os.listdir(tmp_path)):
        z = np.load(tmp_path / fn)
        shift, scale = float(z["shift"]), float(z["scale"])
        feats = np.stack(
            [
                z["readVals"] / 300.0,
                z["signal_mean"] / shift,
                z["signal_std"] / scale,
                z["signal_len"] / 10.0,
                z["ab_mean"],
                z["ab_std"],
            ],
            axis=1,
        )
        xs.append(feats)
        sigs.append(z["signal_x"])
        ys.append(z["refvals"])
        y2s.append(z["refvals2"])
    x = np.concatenate(xs).astype(np.float32)
    sig = np.concatenate(sigs).astype(np.float32)
    y = np.concatenate(ys).astype(np.int32)
    y2 = np.concatenate(y2s).astype(np.int32)
    w = np.arange(len(x) - window)[:, None] + np.arange(window)[None, :]
    bef, aft = (window - 1) // 2, (window + 1) // 2
    return x[w], sig[w], y[bef:-aft].reshape(-1, 1), (y2[bef:-aft] - 1).reshape(-1, 1)


def test_streaming_corpus_matches_materialized(tmp_path):
    _fake_npz(tmp_path)
    window = 13
    corpus = load_training_corpus(str(tmp_path), window)
    assert isinstance(corpus, TrainingCorpus)
    # base arrays only — no [W, T, 50] tensor held
    assert corpus.signal.ndim == 2 and corpus.feats.ndim == 2

    ref_x, ref_sig, ref_y, ref_y2 = _reference_windows(tmp_path, window)
    mx, msig, my, my2 = corpus.materialize()
    np.testing.assert_array_equal(my, ref_y)
    np.testing.assert_array_equal(my2, ref_y2)
    np.testing.assert_allclose(mx, ref_x, rtol=1e-6)
    np.testing.assert_allclose(msig, ref_sig, rtol=1e-6)
    assert corpus.n_windows == len(ref_y)


def test_batch_iterator_streaming_equals_materialized(tmp_path):
    _fake_npz(tmp_path)
    window = 7
    corpus = load_training_corpus(str(tmp_path), window)
    mx, msig, my, _ = corpus.materialize()

    kw = dict(batch_size=32, validation_split=0.1, seed=3)
    it_mat = BatchIterator(mx, msig, my, **kw)
    it_str = BatchIterator(corpus.feats, corpus.signal, corpus.y,
                           window=window, **kw)
    assert it_mat.steps_per_epoch == it_str.steps_per_epoch

    for phase in ("epoch", "validation"):
        for bm, bs in zip(getattr(it_mat, phase)(), getattr(it_str, phase)()):
            np.testing.assert_array_equal(bm["y"], bs["y"])
            np.testing.assert_array_equal(bm["weight"], bs["weight"])
            np.testing.assert_array_equal(bm["signal"], bs["signal"])
            np.testing.assert_array_equal(bm["feats"], bs["feats"])
