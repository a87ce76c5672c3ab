"""Functional building blocks for the reviser models (pure JAX).

Numerical semantics match Keras 2.2.4 / TF 1.12 (the stack that produced the
shipped weights, reference lstmmodel.py / nanorevcnn.py):

* LSTM: gate order [i, f, c, o]; ``recurrent_activation`` is Keras'
  hard_sigmoid ``clip(0.2x + 0.5, 0, 1)``; cell activation tanh.
* Bidirectional: backward pass consumes the reversed sequence and its output
  is reversed back so both directions align per time step; concat merge.
* BatchNormalization: eps=1e-3, axis=-1; inference uses moving statistics.
* Conv1D: 'same' padding, stride 1, ReLU applied *before* the following BN
  (the activation lives inside the Conv layer in the reference).

The input projection of each LSTM (x @ W for all timesteps) is hoisted out of
the recurrence into one large matmul so the MXU sees [B*T, D] x [D, 4H]; the
scan carries only the [B, H] x [H, 4H] recurrent matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hard_sigmoid(x):
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def lstm(params: dict, x: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
    """Single-direction LSTM over [B, T, D] -> [B, T, H].

    params: {"wi": [D, 4H], "wh": [H, 4H], "b": [4H]}.
    """
    wi, wh, b = params["wi"], params["wh"], params["b"]
    hidden = wh.shape[0]
    batch = x.shape[0]
    if reverse:
        x = jnp.flip(x, axis=1)
    # hoist the input projection out of the scan: one big MXU matmul
    # (f32 accumulation, activations stay in the compute dtype)
    x_proj = (
        jnp.einsum("btd,dh->bth", x, wi, preferred_element_type=jnp.float32).astype(
            x.dtype
        )
        + b
    )

    def step(carry, xp):
        h_prev, c_prev = carry
        z = xp + jnp.dot(h_prev, wh, preferred_element_type=jnp.float32).astype(
            xp.dtype
        )
        i = hard_sigmoid(z[:, :hidden])
        f = hard_sigmoid(z[:, hidden : 2 * hidden])
        g = jnp.tanh(z[:, 2 * hidden : 3 * hidden])
        o = hard_sigmoid(z[:, 3 * hidden :])
        c = f * c_prev + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    # derive the initial carry from x_proj (not a fresh zeros) so it inherits
    # any varying-manual-axes when this runs inside shard_map
    h0 = jnp.zeros((batch, hidden), dtype=x_proj.dtype) + 0.0 * x_proj[:, 0, :hidden]
    (_, _), hs = jax.lax.scan(step, (h0, h0), jnp.swapaxes(x_proj, 0, 1))
    out = jnp.swapaxes(hs, 0, 1)
    if reverse:
        out = jnp.flip(out, axis=1)
    return out


def bilstm(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Bidirectional LSTM with concat merge: [B, T, D] -> [B, T, 2H]."""
    fwd = lstm(params["fwd"], x, reverse=False)
    bwd = lstm(params["bwd"], x, reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


def batch_norm(params: dict, x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Inference-mode BN over the last axis with Keras eps=1e-3."""
    inv = jax.lax.rsqrt(params["var"] + eps)
    return (x - params["mean"]) * inv * params["gamma"] + params["beta"]


def batch_norm_train(
    params: dict, x: jnp.ndarray, eps: float = 1e-3
) -> tuple[jnp.ndarray, dict]:
    """Training-mode BN: normalize by batch moments over all but the last axis;
    returns (y, batch_stats) so the caller can update moving statistics."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    var = jnp.var(x, axis=axes)
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv * params["gamma"] + params["beta"]
    return y, {"mean": mean, "var": var}


def conv1d_relu(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Conv1D(k, 'same', relu) over [N, L, Cin] -> [N, L, Cout].

    params: {"w": [k, Cin, Cout], "b": [Cout]}.

    Implemented as an im2col einsum rather than lax.conv: XLA's TPU lowering
    of 1-input-channel NWC convolutions measured ~30 ms on this model's
    shapes vs ~0.5 ms for the identical matmul formulation.
    """
    w = params["w"].astype(x.dtype)
    k = w.shape[0]
    pad = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    length = x.shape[1]
    cols = jnp.stack(
        [xp[:, i : i + length, :] for i in range(k)], axis=2
    )  # [N, L, k, Cin]
    out = jnp.einsum(
        "blki,kio->blo", cols, w, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return jax.nn.relu(out + params["b"])


def dense(params: dict, x: jnp.ndarray, activation=None) -> jnp.ndarray:
    out = (
        jnp.einsum(
            "...d,dh->...h", x, params["w"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
        + params["b"]
    )
    if activation is not None:
        out = activation(out)
    return out
