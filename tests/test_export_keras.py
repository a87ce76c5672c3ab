"""Round-trip: our Keras-2-style .h5 export must load in real Keras.

VERDICT r2 item 7: the export claimed reference-compatibility without a
test that ever called ``load_weights`` on its output. Here: random params
-> save_keras_weights -> fresh tf.keras oracle model (the reference graph,
tests/keras_oracle.py) -> load_weights -> forward parity vs the same
params set directly.
"""

import numpy as np
import pytest

from nanoreviser_tpu.models.export_keras import save_keras_weights
from nanoreviser_tpu.models.reviser import ReviserConfig, init_reviser_params

WINDOW = 5
N_CLASSES = 6


@pytest.mark.slow
def test_h5_export_loads_in_keras(tmp_path):
    keras = pytest.importorskip("keras")
    from tests.keras_oracle import build_keras_reviser

    import jax

    params = init_reviser_params(
        jax.random.PRNGKey(0), ReviserConfig(window=WINDOW, n_classes=N_CLASSES)
    )
    params = jax.tree.map(lambda a: np.asarray(a, np.float32), params)

    h5_fn = str(tmp_path / "export.h5")
    save_keras_weights(params, h5_fn, window=WINDOW, n_classes=N_CLASSES)

    rng = np.random.default_rng(0)
    sig = rng.normal(size=(3, WINDOW, 50, 1)).astype(np.float32)
    feats = rng.normal(size=(3, WINDOW, 6)).astype(np.float32)

    # oracle A: weights set directly from the pytree (the validated path)
    direct = build_keras_reviser(params, WINDOW, N_CLASSES)
    want = np.asarray(direct([sig, feats]))

    # oracle B: fresh random model, weights loaded from OUR h5 artifact
    fresh_params = init_reviser_params(
        jax.random.PRNGKey(1), ReviserConfig(window=WINDOW, n_classes=N_CLASSES)
    )
    fresh_params = jax.tree.map(lambda a: np.asarray(a, np.float32), fresh_params)
    loaded = build_keras_reviser(fresh_params, WINDOW, N_CLASSES)
    assert not np.allclose(np.asarray(loaded([sig, feats])), want)
    loaded.load_weights(h5_fn)
    got = np.asarray(loaded([sig, feats]))
    np.testing.assert_allclose(got, want, atol=2e-5)
