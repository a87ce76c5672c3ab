"""The reviser network: conv residual signal encoder + stacked Bi-LSTMs.

Architecture (parity with reference lstmmodel.py:32-133; model1 and model2
differ only in the number of output classes, 6 vs 5):

    signal [B,T,50,1] -> identity block (2x Conv1D(8,k=3,'same',relu)+BN,
                          residual add broadcasting the 1-channel input onto
                          the 8-channel conv output — reference nanorevcnn.py:37)
                      -> (dropout 0.2, train only)
                      -> flatten per step [B,T,400] -> Dense(64) [B,T,64]
    read   [B,T,6]    -> BiLSTM(16) -> BN -> BiLSTM(64) -> BN   [B,T,128]
    concat            -> BiLSTM(128) -> BN -> BiLSTM(64)        [B,T,128]
                      -> Dense(128,relu) -> Dense(32,relu)
                      -> Dense(6,relu) 'main_out'               [B,T,6]
                      -> flatten [B,T*6] -> Dense(16,relu) 'feature'
                      -> Dense(nb_classes, softmax) 'final_out'

Center-loss embedding (train path): per-class 16-dim centers; the auxiliary
loss is sum((feature - center[y])^2) weighted 0.4 (reference lstmmodel.py:65-74).

The forward returns (probs, feature) — probs is one prediction per *window*
(the center base of each sliding window).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .layers import batch_norm, batch_norm_train, bilstm, conv1d_relu, dense


@dataclass(frozen=True)
class ReviserConfig:
    window: int = 13          # T, sliding-window length in bases
    signal_len: int = 50      # raw samples per base window
    n_features: int = 6       # per-base scalar features
    n_classes: int = 6        # 6 for model1, 5 for model2
    conv_filters: int = 8
    conv_kernel: int = 3
    dropout_rate: float = 0.2


def _signal_branch(params, signal, *, train: bool, dropout_rng, cfg: ReviserConfig):
    """[B,T,S,1] -> [B,T,64]; returns (out, batch_stats)."""
    b, t, s, c = signal.shape
    x = signal.reshape(b * t, s, c)
    stats = {}
    h = conv1d_relu(params["conv1"], x)
    if train:
        h, stats["bn_c1"] = batch_norm_train(params["bn_c1"], h)
    else:
        h = batch_norm(params["bn_c1"], h)
    h = conv1d_relu(params["conv2"], h)
    if train:
        h, stats["bn_c2"] = batch_norm_train(params["bn_c2"], h)
    else:
        h = batch_norm(params["bn_c2"], h)
    h = h + x  # residual: broadcasts 1-channel input onto conv_filters channels
    if train and cfg.dropout_rate > 0:
        keep = 1.0 - cfg.dropout_rate
        mask = jax.random.bernoulli(dropout_rng, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)
    h = h.reshape(b, t, s * cfg.conv_filters)
    out = dense(params["sig_dense"], h)
    return out, stats


def reviser_apply(
    params: dict,
    signal: jnp.ndarray,
    feats: jnp.ndarray,
    *,
    train: bool = False,
    dropout_rng=None,
    cfg: ReviserConfig | None = None,
):
    """Forward pass.

    signal: [B, T, S] or [B, T, S, 1]; feats: [B, T, 6].
    Returns (probs [B, n_classes], feature [B, 16]) at inference, and
    additionally a dict of BN batch statistics when ``train=True``.
    """
    if cfg is None:
        cfg = ReviserConfig(
            window=feats.shape[1],
            n_classes=params["final_out"]["b"].shape[0],
        )
    if signal.ndim == 3:
        signal = signal[..., None]

    sig_out, stats = _signal_branch(
        params, signal, train=train, dropout_rng=dropout_rng, cfg=cfg
    )

    def bn(name, x):
        if train:
            y, s = batch_norm_train(params[name], x)
            stats[name] = s
            return y
        return batch_norm(params[name], x)

    r = bilstm(params["read_rnn1"], feats)
    r = bn("bn_r1", r)
    r = bilstm(params["read_rnn2"], r)
    r = bn("bn_r2", r)

    h = jnp.concatenate([r, sig_out], axis=-1)
    h = bilstm(params["total_rnn1"], h)
    h = bn("bn_t1", h)
    h = bilstm(params["total_rnn2"], h)

    h = dense(params["dense1"], h, jax.nn.relu)
    h = dense(params["dense2"], h, jax.nn.relu)
    main = dense(params["main_out"], h, jax.nn.relu)          # [B,T,6]
    flat = main.reshape(main.shape[0], -1)                    # [B,T*6]
    feature = dense(params["feature"], flat, jax.nn.relu)     # [B,16]
    # softmax in f32 regardless of compute dtype
    logits = dense(params["final_out"], feature).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    if train:
        return probs, feature, stats
    return probs, feature


def _glorot(rng, shape):
    fan_in, fan_out = shape[-2], shape[-1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, jnp.float32, -limit, limit)


def _orthogonal(rng, shape):
    return jax.nn.initializers.orthogonal()(rng, shape, jnp.float32)


def _lstm_params(rng, d_in, hidden):
    k1, k2 = jax.random.split(rng)
    # Keras LSTM init: glorot kernel, orthogonal recurrent, zero bias with
    # unit_forget_bias (forget-gate bias = 1)
    bias = np.zeros(4 * hidden, dtype=np.float32)
    bias[hidden : 2 * hidden] = 1.0
    return {
        "wi": _glorot(k1, (d_in, 4 * hidden)),
        "wh": _orthogonal(k2, (hidden, 4 * hidden)),
        "b": jnp.asarray(bias),
    }


def _bilstm_params(rng, d_in, hidden):
    k1, k2 = jax.random.split(rng)
    return {"fwd": _lstm_params(k1, d_in, hidden), "bwd": _lstm_params(k2, d_in, hidden)}


def _bn_params(dim):
    return {
        "gamma": jnp.ones(dim, jnp.float32),
        "beta": jnp.zeros(dim, jnp.float32),
        "mean": jnp.zeros(dim, jnp.float32),
        "var": jnp.ones(dim, jnp.float32),
    }


def _dense_params(rng, d_in, d_out):
    return {"w": _glorot(rng, (d_in, d_out)), "b": jnp.zeros(d_out, jnp.float32)}


def init_reviser_params(rng, cfg: ReviserConfig) -> dict:
    """Random init mirroring Keras defaults (glorot/orthogonal/zeros)."""
    keys = jax.random.split(rng, 16)
    f = cfg.conv_filters
    params = {
        "conv1": {
            "w": _glorot(keys[0], (cfg.conv_kernel, 1, f)),
            "b": jnp.zeros(f, jnp.float32),
        },
        "bn_c1": _bn_params(f),
        "conv2": {
            "w": _glorot(keys[1], (cfg.conv_kernel, f, f)),
            "b": jnp.zeros(f, jnp.float32),
        },
        "bn_c2": _bn_params(f),
        "sig_dense": _dense_params(keys[2], cfg.signal_len * f, 64),
        "read_rnn1": _bilstm_params(keys[3], cfg.n_features, 16),
        "bn_r1": _bn_params(32),
        "read_rnn2": _bilstm_params(keys[4], 32, 64),
        "bn_r2": _bn_params(128),
        "total_rnn1": _bilstm_params(keys[5], 192, 128),
        "bn_t1": _bn_params(256),
        "total_rnn2": _bilstm_params(keys[6], 256, 64),
        "dense1": _dense_params(keys[7], 128, 128),
        "dense2": _dense_params(keys[8], 128, 32),
        "main_out": _dense_params(keys[9], 32, 6),
        "feature": _dense_params(keys[10], cfg.window * 6, 16),
        "final_out": _dense_params(keys[11], 16, cfg.n_classes),
        # center-loss class centers (train path; Keras Embedding init: uniform)
        "centers": jax.random.uniform(
            keys[12], (cfg.n_classes, 16), jnp.float32, -0.05, 0.05
        ),
    }
    return params


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
