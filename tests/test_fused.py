"""BN-folded fused forward must match the standard inference forward."""

import numpy as np

from nanoreviser_tpu.models import load_keras_weights
from nanoreviser_tpu.models.fused import fold_inference_params, fused_forward
from nanoreviser_tpu.models.reviser import ReviserConfig, reviser_apply


def test_fused_matches_standard(ecoli_model_paths):
    m1, _ = ecoli_model_paths
    params, window, n_classes = load_keras_weights(m1)
    cfg = ReviserConfig(window=window, n_classes=n_classes)
    fused = fold_inference_params(params)

    rng = np.random.default_rng(0)
    B = 32
    sig = rng.normal(0, 1, (B, window, 50)).astype(np.float32)
    feats = rng.normal(0.5, 0.3, (B, window, 6)).astype(np.float32)

    probs_std, _ = reviser_apply(params, sig, feats, cfg=cfg)
    probs_fused = fused_forward(fused, sig, feats, cfg)
    np.testing.assert_allclose(
        np.asarray(probs_fused), np.asarray(probs_std), atol=2e-5
    )
