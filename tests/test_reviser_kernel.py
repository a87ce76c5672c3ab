"""Fused Pallas kernel vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

from nanoreviser_tpu.models import load_keras_weights
from nanoreviser_tpu.models.fused import fold_inference_params
from nanoreviser_tpu.ops.reviser_kernel import (
    pack_stack_weights,
    stack_logits_pallas,
    stack_logits_reference,
)


@pytest.mark.slow
def test_kernel_matches_reference_interpret(ecoli_model_paths):
    m1, _ = ecoli_model_paths
    params, window, n_classes = load_keras_weights(m1)
    fused = fold_inference_params(params)
    w = pack_stack_weights(fused, window)

    rng = np.random.default_rng(0)
    B = 256
    feats = rng.normal(0.5, 0.3, (B, window, 6)).astype(np.float32)
    sig_out = rng.normal(0, 1, (B, window, 64)).astype(np.float32)

    ref_logits = np.asarray(stack_logits_reference(fused, feats, sig_out))
    got = np.asarray(
        stack_logits_pallas(
            w, feats, sig_out, t_len=window, block=128, interpret=True
        )
    )[:, :n_classes]
    # bf16 matmuls: compare argmax + loose numeric agreement
    agree = (got.argmax(1) == ref_logits.argmax(1)).mean()
    assert agree > 0.99, f"argmax agreement {agree}"
    np.testing.assert_allclose(got, ref_logits, atol=0.15)
