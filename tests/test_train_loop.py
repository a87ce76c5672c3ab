"""train_model's jitted step: end-to-end on a tiny synthetic corpus.

Regression: cw[batch["y"]] with numpy cw raised TracerArrayConversionError
under jit (caught by unitest.sh, not by the unit suite — hence this test).
"""

import numpy as np
import pytest

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


@pytest.mark.slow
def test_multi_step_dispatch_on_dp_mesh():
    """The K-steps-per-dispatch scan path (train/step.make_sharded_multi_step)
    must compile and train on a multi-device dp mesh — the dryrun's tiny
    corpus only exercises the single-step fallback. Also checks the k=1 and
    k=4 loops train to similar losses (they consume dropout RNG in different
    orders, so equality is not expected)."""
    import jax

    from nanoreviser_tpu.parallel import make_mesh
    from nanoreviser_tpu.train.loop import train_model

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    mesh = make_mesh(devs[:8])
    rng = np.random.default_rng(0)
    window, nc = 5, 6
    n = 16 * 40 + window            # ~40 batches of 16 -> 10 chunks at k=4
    x = rng.normal(0.5, 0.3, (n, window, 6)).astype(np.float32)
    sig = rng.normal(0, 1, (n, window, 50)).astype(np.float32)
    y = rng.integers(0, nc, (n - window, 1)).astype(np.int32)
    losses = {}
    for k in (4, 1):
        _, hist = train_model(
            x, sig, y, n_classes=nc, window=window, epochs=1,
            batch_size=16, validation_split=0.0, verbose=False, mesh=mesh,
            steps_per_dispatch=k,
        )
        losses[k] = hist["loss"][-1]
        assert np.isfinite(hist["loss"][-1])
    assert abs(losses[4] - losses[1]) < 0.5, losses
