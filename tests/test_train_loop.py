"""train_model's jitted step: end-to-end on a tiny synthetic corpus.

Regression: cw[batch["y"]] with numpy cw raised TracerArrayConversionError
under jit (caught by unitest.sh, not by the unit suite — hence this test).
"""

import numpy as np

from nanoreviser_tpu.train.loop import load_params_npz, save_params_npz, train_model


def test_train_model_two_epochs(tmp_path):
    rng = np.random.default_rng(0)
    n, t = 96, 5
    x = rng.normal(size=(n, t, 6)).astype(np.float32)
    sig = rng.normal(size=(n, t, 50)).astype(np.float32)
    y = rng.integers(0, 6, size=(n, 1)).astype(np.int32)

    params, history = train_model(
        x, sig, y,
        n_classes=6, window=t, epochs=2, batch_size=32,
        validation_split=0.1, verbose=False,
        checkpoint_path=str(tmp_path / "ck.pkl"),
    )
    assert len(history["loss"]) == 2
    assert np.isfinite(history["loss"]).all()
    assert np.isfinite(history["val_loss"]).all()

    # resume from the checkpoint: starts at epoch 2, so no further epochs run
    params2, history2 = train_model(
        x, sig, y,
        n_classes=6, window=t, epochs=2, batch_size=32,
        validation_split=0.1, verbose=False,
        checkpoint_path=str(tmp_path / "ck.pkl"), resume=True,
    )
    assert history2["loss"] == []

    # npz round-trip
    save_params_npz(params, str(tmp_path / "p.npz"))
    loaded = load_params_npz(str(tmp_path / "p.npz"))
    np.testing.assert_array_equal(
        np.asarray(params["final_out"]["w"]), loaded["final_out"]["w"]
    )
