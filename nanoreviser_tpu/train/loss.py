"""Training loss: class-weighted sparse CE + center loss.

Parity with the reference's Keras training objective (lstmmodel.py:70-74,
NanoReviser_train.py:165-172):

* primary head: sparse categorical cross-entropy over the softmax output,
  sample-weighted by class_weight[y] (the reference passes
  {0:3, 1:5, 2:1, 3:1, 4:1, 5:1} for both models);
* auxiliary head: center loss sum((feature - center[y])^2) with loss_weight
  0.4. Keras also applies class_weight to this head using its all-zeros
  dummy target, i.e. every sample gets class_weight[0] (= 3) — this quirk is
  reproduced via ``center_target_weight`` so losses match Keras numerically.
* Keras clips softmax outputs to [eps, 1-eps] with eps=1e-7 before the log.
"""

from __future__ import annotations

import jax.numpy as jnp

KERAS_EPS = 1e-7


def reviser_loss(
    probs: jnp.ndarray,            # [B, C] softmax outputs
    feature: jnp.ndarray,          # [B, 16]
    centers: jnp.ndarray,          # [C, 16]
    y: jnp.ndarray,                # [B] int labels
    class_weights: jnp.ndarray,    # [C]
    center_loss_weight: float = 0.4,
    center_target_weight: float | None = None,
    sample_weight: jnp.ndarray | None = None,   # [B]; pad rows weigh 0
) -> tuple[jnp.ndarray, dict]:
    p = jnp.clip(probs, KERAS_EPS, 1.0 - KERAS_EPS)
    ce = -jnp.log(jnp.take_along_axis(p, y[:, None], axis=1))[:, 0]
    w = class_weights[y]
    if center_target_weight is None:
        center_target_weight = class_weights[0]
    l2 = jnp.sum((feature - centers[y]) ** 2, axis=1)
    hit = (jnp.argmax(probs, axis=-1) == y).astype(jnp.float32)

    if sample_weight is None:
        ce_loss = jnp.mean(ce * w)
        center_loss = jnp.mean(l2 * center_target_weight)
        acc = jnp.mean(hit)
    else:
        denom = jnp.maximum(jnp.sum(sample_weight), 1.0)
        ce_loss = jnp.sum(ce * w * sample_weight) / denom
        center_loss = jnp.sum(l2 * center_target_weight * sample_weight) / denom
        acc = jnp.sum(hit * sample_weight) / denom

    total = ce_loss + center_loss_weight * center_loss
    return total, {"ce_loss": ce_loss, "center_loss": center_loss, "accuracy": acc}
