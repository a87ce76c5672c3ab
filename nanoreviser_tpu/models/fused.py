"""Inference-time model fusion: fold BatchNorms into LSTM input projections.

At inference every BatchNorm is an affine map y = x*s + t with
s = gamma/sqrt(var+eps), t = beta - mean*s. Each of the three BNs between
recurrent layers feeds a linear input projection, so they fold exactly into
the next layer's (wi, b):

    bn_r1 -> read_rnn2.wi            (all 32 input rows)
    bn_r2 -> total_rnn1.wi[:128]     (the read half of the concat input)
    bn_t1 -> total_rnn2.wi           (all 256 input rows)

This removes all elementwise BN work from the sequential LSTM stack and is
the weight layout consumed by the fused Pallas kernel (ops/reviser_kernel.py)
and its jnp reference (``lstm_stack_apply``). The conv signal branch keeps
its BNs (it is fully parallel; XLA fuses them) and is evaluated with the
standard path, producing the [B, T, 64] ``sig_out`` operand.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .layers import batch_norm, bilstm, dense
from .reviser import ReviserConfig, _signal_branch

BN_EPS = 1e-3


def _bn_affine(bn: dict) -> tuple[np.ndarray, np.ndarray]:
    # numpy on purpose: folding runs at load time, and every tiny jnp op here
    # would cost a (remote-)compiled kernel dispatch
    var = np.asarray(bn["var"], np.float64)
    s = np.asarray(bn["gamma"], np.float64) / np.sqrt(var + BN_EPS)
    t = np.asarray(bn["beta"], np.float64) - np.asarray(bn["mean"], np.float64) * s
    return s, t


def _fold_into(lstm_params: dict, s: np.ndarray, t: np.ndarray, rows: slice) -> dict:
    """Fold y = x*s + t (applied to input rows ``rows``) into (wi, b)."""
    out = {}
    for dirn in ("fwd", "bwd"):
        wi = np.asarray(lstm_params[dirn]["wi"], np.float64)
        b = np.asarray(lstm_params[dirn]["b"], np.float64)
        wi_rows = wi[rows]
        new_wi = wi.copy()
        new_wi[rows] = s[:, None] * wi_rows
        new_b = b + t @ wi_rows
        out[dirn] = {
            "wi": new_wi.astype(np.float32),
            "wh": np.asarray(lstm_params[dirn]["wh"], np.float32),
            "b": new_b.astype(np.float32),
        }
    return out


def fold_inference_params(params: dict) -> dict:
    """Params pytree with bn_r1/bn_r2/bn_t1 folded away (inference only)."""
    s1, t1 = _bn_affine(params["bn_r1"])
    s2, t2 = _bn_affine(params["bn_r2"])
    s3, t3 = _bn_affine(params["bn_t1"])
    fused = dict(params)
    fused["read_rnn2"] = _fold_into(params["read_rnn2"], s1, t1, slice(None))
    fused["total_rnn1"] = _fold_into(params["total_rnn1"], s2, t2, slice(0, 128))
    fused["total_rnn2"] = _fold_into(params["total_rnn2"], s3, t3, slice(None))
    for k in ("bn_r1", "bn_r2", "bn_t1"):
        fused.pop(k)
    return fused


def signal_branch_apply(params: dict, signal: jnp.ndarray, cfg: ReviserConfig):
    """[B,T,50(,1)] -> [B,T,64] via the conv residual branch (XLA path)."""
    if signal.ndim == 3:
        signal = signal[..., None]
    out, _ = _signal_branch(params, signal, train=False, dropout_rng=None, cfg=cfg)
    return out


def lstm_stack_apply(fused: dict, feats: jnp.ndarray, sig_out: jnp.ndarray):
    """jnp reference of the fused LSTM stack + heads (BNs pre-folded).

    feats: [B,T,6]; sig_out: [B,T,64]. Returns logits [B, n_classes] (pre-softmax).
    """
    r = bilstm(fused["read_rnn1"], feats)
    r = bilstm(fused["read_rnn2"], r)
    h = jnp.concatenate([r, sig_out], axis=-1)
    h = bilstm(fused["total_rnn1"], h)
    h = bilstm(fused["total_rnn2"], h)
    h = dense(fused["dense1"], h, jax.nn.relu)
    h = dense(fused["dense2"], h, jax.nn.relu)
    main = dense(fused["main_out"], h, jax.nn.relu)
    flat = main.reshape(main.shape[0], -1)
    feature = dense(fused["feature"], flat, jax.nn.relu)
    return dense(fused["final_out"], feature)


def fused_forward(fused: dict, signal: jnp.ndarray, feats: jnp.ndarray,
                  cfg: ReviserConfig):
    """Full inference forward on folded params; returns probs [B, C]."""
    sig_out = signal_branch_apply(fused, signal, cfg)
    logits = lstm_stack_apply(fused, feats, sig_out).astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)
