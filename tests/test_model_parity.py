"""JAX reviser forward vs an independent tf.keras oracle, shipped weights."""

import numpy as np
import pytest

from nanoreviser_tpu.models import load_keras_weights
from nanoreviser_tpu.models.reviser import (
    ReviserConfig,
    init_reviser_params,
    reviser_apply,
    param_count,
)


def test_importer_all_shipped_files(ecoli_model_paths):
    m1, m2 = ecoli_model_paths
    p1, w1, c1 = load_keras_weights(m1)
    p2, w2, c2 = load_keras_weights(m2)
    assert (w1, c1) == (11, 6)
    assert (w2, c2) == (11, 5)
    assert p1["conv1"]["w"].shape == (3, 1, 8)
    assert p1["total_rnn2"]["fwd"]["wh"].shape == (64, 256)


def test_importer_human_shipped_files():
    """The reference DEFAULTS to the human pair (-S human,
    NanoReviser.py:55,191-195); the shape-classifying importer must handle
    all four shipped files, and both species encode the window-11 quirk
    (SURVEY §5 item 5) despite the win13 filenames."""
    import os

    import pytest as _pytest

    base = "/root/reference/model/human"
    m1 = os.path.join(base, "human_win13_50ep_model1.h5")
    m2 = os.path.join(base, "human_win13_50ep_model2.h5")
    if not os.path.exists(m1):
        _pytest.skip("human weights not available")
    p1, w1, c1 = load_keras_weights(m1)
    p2, w2, c2 = load_keras_weights(m2)
    assert (w1, c1) == (11, 6)
    assert (w2, c2) == (11, 5)
    # weights genuinely differ from the ecoli pair (not copies)
    ep1, _, _ = load_keras_weights(
        "/root/reference/model/ecoli/ecoli_win13_50ep_model1.h5")
    assert not np.array_equal(p1["conv1"]["w"], ep1["conv1"]["w"])
    # and are loadable into the forward pass
    cfg = ReviserConfig(window=w1, n_classes=c1)
    rng = np.random.default_rng(0)
    sig = rng.normal(0, 1, (8, w1, 50, 1)).astype(np.float32)
    feats = rng.normal(0.5, 0.5, (8, w1, 6)).astype(np.float32)
    probs, _ = reviser_apply(p1, sig, feats, cfg=cfg)
    assert probs.shape == (8, c1)
    assert np.all(np.isfinite(np.asarray(probs)))


@pytest.mark.slow
def test_forward_matches_keras_oracle(ecoli_model_paths):
    tf = pytest.importorskip("tensorflow")  # noqa: F841
    from tests.keras_oracle import build_keras_reviser

    m1, _ = ecoli_model_paths
    params, window, n_classes = load_keras_weights(m1)
    model = build_keras_reviser(params, window, n_classes)

    rng = np.random.default_rng(42)
    B = 64
    sig = rng.normal(0, 1, (B, window, 50, 1)).astype(np.float32)
    feats = rng.normal(0.5, 0.5, (B, window, 6)).astype(np.float32)

    keras_probs = model.predict([sig, feats], verbose=0)
    probs, feature = reviser_apply(params, sig, feats)
    probs = np.asarray(probs)

    np.testing.assert_allclose(probs, keras_probs, atol=2e-5)
    assert (probs.argmax(1) == keras_probs.argmax(1)).all()
    assert feature.shape == (B, 16)


def test_init_and_apply_shapes():
    import jax

    cfg = ReviserConfig(window=13, n_classes=6)
    params = init_reviser_params(jax.random.PRNGKey(0), cfg)
    # ~600k params like the reference models (SURVEY.md §2.3)
    assert 400_000 < param_count(params) < 1_000_000
    sig = np.zeros((4, 13, 50), np.float32)
    feats = np.zeros((4, 13, 6), np.float32)
    probs, feature = reviser_apply(params, sig, feats, cfg=cfg)
    assert probs.shape == (4, 6)
    np.testing.assert_allclose(np.asarray(probs).sum(1), 1.0, rtol=1e-5)


def test_train_mode_returns_stats():
    import jax

    cfg = ReviserConfig(window=11, n_classes=5)
    params = init_reviser_params(jax.random.PRNGKey(1), cfg)
    sig = np.ones((8, 11, 50), np.float32)
    feats = np.ones((8, 11, 6), np.float32)
    probs, feature, stats = reviser_apply(
        params, sig, feats, train=True, dropout_rng=jax.random.PRNGKey(2), cfg=cfg
    )
    assert probs.shape == (8, 5)
    assert set(stats) == {"bn_c1", "bn_c2", "bn_r1", "bn_r2", "bn_t1"}
