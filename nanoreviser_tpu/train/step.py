"""Data-parallel training step (jit + sharding; XLA inserts the psum).

Design (SURVEY.md §2.3): parameters replicated over the mesh, window batches
sharded on axis "dp"; the gradient all-reduce rides ICI automatically via
sharding propagation — no explicit collectives needed in user code.

Optimizer: Adam with Keras-2.2.4 defaults (lr=1e-3, b1=0.9, b2=0.999,
eps=1e-7 = K.epsilon()). BatchNorm moving statistics are carried inside the
param pytree and updated with Keras momentum 0.99 after the gradient step
(their gradients are identically zero because the train-mode forward uses
batch statistics, so Adam leaves them untouched).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.reviser import ReviserConfig, reviser_apply
from .loss import reviser_loss

BN_KEYS = ("bn_c1", "bn_c2", "bn_r1", "bn_r2", "bn_t1")
KERAS_BN_MOMENTUM = 0.99


def default_class_weights(n_classes: int) -> np.ndarray:
    """Reference class weights {0:3, 1:5, rest:1} (NanoReviser_train.py:167)."""
    w = np.ones(n_classes, np.float32)
    w[0] = 3.0
    if n_classes > 1:
        w[1] = 5.0
    return w


def keras_adam(learning_rate: float = 1e-3) -> optax.GradientTransformation:
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-7)


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def make_train_step(
    cfg: ReviserConfig,
    optimizer: optax.GradientTransformation | None = None,
    class_weights: np.ndarray | None = None,
    center_loss_weight: float = 0.4,
    bn_momentum: float = KERAS_BN_MOMENTUM,
):
    """Returns train_step(params, opt_state, batch, rng) -> (params, opt_state, metrics).

    batch: {"signal": [B,T,50], "feats": [B,T,6], "y": [B]}.
    """
    if optimizer is None:
        optimizer = keras_adam()
    if class_weights is None:
        class_weights = default_class_weights(cfg.n_classes)
    class_weights = jnp.asarray(class_weights)

    def loss_fn(params, batch, rng):
        probs, feature, stats = reviser_apply(
            params, batch["signal"], batch["feats"],
            train=True, dropout_rng=rng, cfg=cfg,
        )
        loss, metrics = reviser_loss(
            probs, feature, params["centers"], batch["y"],
            class_weights, center_loss_weight,
            sample_weight=batch.get("weight"),
        )
        return loss, (metrics, stats)

    def train_step(params, opt_state, batch, rng):
        (loss, (metrics, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # Keras-style moving-statistics update after the step
        m = bn_momentum
        for key in BN_KEYS:
            params[key]["mean"] = params[key]["mean"] * m + stats[key]["mean"] * (1 - m)
            params[key]["var"] = params[key]["var"] * m + stats[key]["var"] * (1 - m)
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    return train_step, optimizer


def make_sharded_train_step(cfg: ReviserConfig, mesh, **kwargs):
    """jit the train step with dp-sharded batch + replicated params."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    train_step, optimizer = make_train_step(cfg, **kwargs)
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("dp"))
    batch_shardings = {
        "signal": shard, "feats": shard, "y": shard, "weight": shard,
    }
    jitted = jax.jit(
        train_step,
        in_shardings=(rep, rep, batch_shardings, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )
    return jitted, optimizer


def _multi_from(train_step):
    """K steps per dispatch via lax.scan over stacked batches.

    The per-step host dispatch over the tunnel attachment costs 4-25 ms
    (latency weather) against ~2-4 ms of on-chip compute, capping the naive
    loop at 40-270 steps/s; scanning K steps inside one jit amortizes it
    (measured 449 steps/s at K=16). batches: leading axis K on every leaf;
    rngs: [K, 2] split dropout keys. Returns stacked per-step metrics.
    """
    def multi_step(params, opt_state, batches, rngs):
        def body(carry, xs):
            p, o = carry
            b, r = xs
            p, o, m = train_step(p, o, b, r)
            return (p, o), (m["loss"], m["accuracy"])

        (params, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, opt_state), (batches, rngs))
        return params, opt_state, {"loss": losses, "accuracy": accs}

    return multi_step


def make_multi_step(cfg: ReviserConfig, **kwargs):
    """Single-device K-steps-per-dispatch train step."""
    train_step, optimizer = make_train_step(cfg, **kwargs)
    jitted = jax.jit(_multi_from(train_step), donate_argnums=(0, 1))
    return jitted, optimizer


def make_sharded_multi_step(cfg: ReviserConfig, mesh, **kwargs):
    """dp-sharded K-steps-per-dispatch train step: batches [K, B, ...] are
    sharded on the BATCH axis (P(None, "dp")); params/opt replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    train_step, optimizer = make_train_step(cfg, **kwargs)
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(None, "dp"))
    batch_shardings = {
        "signal": shard, "feats": shard, "y": shard, "weight": shard,
    }
    jitted = jax.jit(
        _multi_from(train_step),
        in_shardings=(rep, rep, batch_shardings, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )
    return jitted, optimizer
