"""Fused Pallas TPU kernel: the entire 4-layer Bi-LSTM stack + dense heads.

Why: the reviser's sequential core is 8 directional LSTM passes of T=11
steps each — ~180 small matmuls per model. As separate XLA ops this is
dispatch/latency-bound (~90 ms per 8k windows measured). Fusing the whole
stack into ONE kernel keeps every activation in VMEM and makes the window
block the parallel grid dimension.

Layout strategy (the first, naive version was 10x SLOWER than XLA because of
unaligned lane slices): every gate and every hidden state is padded to a full
128-lane tile.

* recurrent pre-activations are [B, 4*128]; gate g is the aligned tile
  ``z[:, g*128:(g+1)*128]`` — no lane shuffles;
* hidden states are [B, 128] with only the first H lanes meaningful;
* weights are scattered into the padded layout at pack time
  (``pack_stack_weights``), with dead rows zero so dead lanes provably stay
  zero through the recurrence: z_dead = 0 -> i,f,o = hard_sigmoid(0) = 0.5,
  g = tanh(0) = 0, c_dead = 0.5*c_dead + 0 = 0 given c0 = 0;
* direction/branch concatenation is tile concatenation ([B,128] || [B,128]).

This costs ~2.7x padded FLOPs but runs at MXU-aligned shapes throughout.
All matmuls are bf16 with f32 accumulation; gates and cell states are f32.
T and the hidden sizes are compile-time constants — the recurrences unroll
into straight-line MXU code.

The embarrassingly-parallel conv signal branch stays in XLA (models/fused.py)
and feeds this kernel the per-timestep [T, B, 128]-padded ``sig_out`` plus
layer-1 input projections.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H1, H2, H3, H4 = 16, 64, 128, 64   # true hidden sizes
GP = 128                           # gate pitch: every gate padded to one tile
NB_MAX = 6                         # model1 class count; model2 padded to it


def _hs(x):
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _stack_tail(
    feats, sigs,
    wi1f_ref, b1f_ref, wh1f_ref, wi1b_ref, b1b_ref, wh1b_ref,
    wi2f_ref, wh2f_ref, b2f_ref, wi2b_ref, wh2b_ref, b2b_ref,
    wi3f_ref, wh3f_ref, b3f_ref, wi3b_ref, wh3b_ref, b3b_ref,
    wi4f_ref, wh4f_ref, b4f_ref, wi4b_ref, wh4b_ref, b4b_ref,
    d1w_ref, d1b_ref, d2w_ref, d2b_ref, mow_ref, mob_ref,
    fw_ref, fb_ref, fow_ref, fob_ref,
    logits_ref,
    *,
    t_len: int,
    block: int,
):
    """LSTM stack + heads on per-timestep input lists (shared kernel core).

    feats/sigs: lists of t_len [block, GP] arrays. Weight refs carry a
    leading model axis of block-size 1 (grid dim 0 selects the model).
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def run_direction(step_in, wh_ref, t_order):
        """Unrolled LSTM pass with 128-lane-padded gates/states."""
        wh = wh_ref[0]
        h = jnp.zeros((block, GP), bf16)
        c = jnp.zeros((block, GP), f32)
        outs = [None] * t_len
        for t in t_order:
            z = step_in(t) + _mm(h, wh)          # [B, 4*GP] f32
            i = _hs(z[:, 0 * GP : 1 * GP])
            f = _hs(z[:, 1 * GP : 2 * GP])
            g = jnp.tanh(z[:, 2 * GP : 3 * GP])
            o = _hs(z[:, 3 * GP : 4 * GP])
            c = f * c + i * g
            h = (o * jnp.tanh(c)).astype(bf16)
            outs[t] = h
        return outs

    fwd = list(range(t_len))
    bwd = list(range(t_len - 1, -1, -1))

    def proj(inputs, wi_ref, b_ref):
        wi = wi_ref[0]
        b = b_ref[0].astype(f32)
        return lambda t: _mm(inputs[t], wi) + b

    l1f = run_direction(proj(feats, wi1f_ref, b1f_ref), wh1f_ref, fwd)
    l1b = run_direction(proj(feats, wi1b_ref, b1b_ref), wh1b_ref, bwd)
    l1 = [jnp.concatenate([f, b], axis=1) for f, b in zip(l1f, l1b)]

    l2f = run_direction(proj(l1, wi2f_ref, b2f_ref), wh2f_ref, fwd)
    l2b = run_direction(proj(l1, wi2b_ref, b2b_ref), wh2b_ref, bwd)
    l2 = [
        jnp.concatenate([f, b, sigs[t]], axis=1)
        for t, (f, b) in enumerate(zip(l2f, l2b))
    ]

    l3f = run_direction(proj(l2, wi3f_ref, b3f_ref), wh3f_ref, fwd)
    l3b = run_direction(proj(l2, wi3b_ref, b3b_ref), wh3b_ref, bwd)
    l3 = [jnp.concatenate([f, b], axis=1) for f, b in zip(l3f, l3b)]

    l4f = run_direction(proj(l3, wi4f_ref, b4f_ref), wh4f_ref, fwd)
    l4b = run_direction(proj(l3, wi4b_ref, b4b_ref), wh4b_ref, bwd)

    d1w = d1w_ref[0]
    d1b = d1b_ref[0].astype(f32)
    d2w = d2w_ref[0]
    d2b = d2b_ref[0].astype(f32)
    mow = mow_ref[0]
    mob = mob_ref[0].astype(f32)
    feat_acc = jnp.zeros((block, GP), f32)
    for t in range(t_len):
        h = jnp.concatenate([l4f[t], l4b[t]], axis=1)                  # [B,256]
        h = jnp.maximum(_mm(h, d1w) + d1b, 0.0).astype(bf16)           # [B,128]
        h = jnp.maximum(_mm(h, d2w) + d2b, 0.0).astype(bf16)           # [B,128]
        m = jnp.maximum(_mm(h, mow) + mob, 0.0).astype(bf16)           # [B,128]
        feat_acc = feat_acc + _mm(m, fw_ref[0, t])
    feature = jnp.maximum(feat_acc + fb_ref[0].astype(f32), 0.0)
    logits = _mm(feature.astype(bf16), fow_ref[0]) + fob_ref[0].astype(f32)
    logits_ref[0] = logits


def _kernel(feats_ref, sig_ref, *refs, t_len: int, block: int):
    """v1 kernel: pre-gathered [1, T, block, GP] window inputs."""
    feats = [feats_ref[0, t] for t in range(t_len)]
    sigs = [sig_ref[0, t] for t in range(t_len)]
    _stack_tail(feats, sigs, *refs, t_len=t_len, block=block)


def _kernel_full(
    sig_hbm, feats_hbm,
    cw1_ref, cb1_ref, cw2_ref, cb2_ref, cc_ref, ce_ref, cbias_ref,
    *refs,
    t_len: int,
    block: int,
):
    """v2 kernel: whole per-BASE arrays stay in HBM; each program DMAs its
    contiguous [block + T, GP] slice and computes the conv branch in-kernel.

    Window w's timestep t is base w + t, so a block of windows [w0, w0+block)
    needs base rows [w0, w0+block+T) — one DMA, then T static [block, GP]
    slices of the scratch. This replaces the XLA-side window gather
    ([W, T, 50] materialization, ~27 MB/read) and the separate conv-branch
    jit — both measured slower than the whole fused kernel.

    The conv residual block + per-step dense are applied in dense form
    (see conv_dense_form): sig64 = relu(relu(x@W1+c1)@W2+c2)@C + x@E + c.
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    # program_id must be read outside run_scoped (interpret mode has no grid
    # context inside the scoped body)
    w0 = pl.program_id(1) * block

    def body(sig_scr, feat_scr, sems):
        rows = block + t_len
        d1 = pltpu.make_async_copy(
            sig_hbm.at[pl.ds(w0, rows), :], sig_scr, sems.at[0]
        )
        d2 = pltpu.make_async_copy(
            feats_hbm.at[pl.ds(w0, rows), :], feat_scr, sems.at[1]
        )
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()

        cw1 = cw1_ref[0]
        cb1 = cb1_ref[0].astype(f32)
        cw2 = cw2_ref[0]
        cb2 = cb2_ref[0].astype(f32)
        cc = cc_ref[0]
        ce = ce_ref[0]
        cbias = cbias_ref[0].astype(f32)

        feats = []
        sigs = []
        for t in range(t_len):
            xs = sig_scr[pl.ds(t, block), :]                     # [block, GP]
            z1 = jnp.maximum(_mm(xs, cw1) + cb1, 0.0).astype(bf16)
            z2 = jnp.maximum(_mm(z1, cw2) + cb2, 0.0).astype(bf16)
            s64 = _mm(z2, cc) + _mm(xs, ce) + cbias
            sigs.append(s64.astype(bf16))
            feats.append(feat_scr[pl.ds(t, block), :])

        _stack_tail(feats, sigs, *refs, t_len=t_len, block=block)

    pl.run_scoped(
        body,
        pltpu.VMEM((block + t_len, GP), jnp.bfloat16),
        pltpu.VMEM((block + t_len, GP), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2,)),
    )


# --------------------------------------------------------------- weight prep


def conv_dense_form(params: dict) -> dict:
    """Fold the conv residual block + per-step dense into 3 dense matmuls.

    The signal branch (models/reviser.py _signal_branch; reference
    nanorevcnn.py:17-38) per timestep maps x[50] ->
      h1 = bn1(relu(conv1(x)));  h2 = bn2(relu(conv2(h1)));
      res = h2 + x[:, None];     out64 = flatten(res) @ D + bd.
    Conv1D('same', k=3) is a banded linear map, so with BN affines
    (s, t) folded this is exactly
      out64 = relu(relu(x@W1 + c1) @ W2 + c2) @ C + x@E + cb
    with W1 [50, 400], W2 [400, 400], C [400, 64], E [50, 64].
    Dense-form costs ~2.7x the conv FLOPs but is pure aligned MXU work.
    """
    from ..models.fused import _bn_affine

    w1 = np.asarray(params["conv1"]["w"], np.float64)   # [3, 1, F]
    b1 = np.asarray(params["conv1"]["b"], np.float64)
    w2 = np.asarray(params["conv2"]["w"], np.float64)   # [3, F, F]
    b2 = np.asarray(params["conv2"]["b"], np.float64)
    d = np.asarray(params["sig_dense"]["w"], np.float64)   # [S*F, 64]
    bd = np.asarray(params["sig_dense"]["b"], np.float64)
    s1, t1 = _bn_affine(params["bn_c1"])
    s2, t2 = _bn_affine(params["bn_c2"])
    kk, _, f = w1.shape
    s = d.shape[0] // f
    half = kk // 2

    # W1[j, p*F + c] = w1[j - p + half, 0, c] for |j - p| <= half
    w1_dense = np.zeros((s, s * f), np.float64)
    w2_dense = np.zeros((s * f, s * f), np.float64)
    for p in range(s):
        for dk in range(-half, half + 1):
            j = p + dk
            if 0 <= j < s:
                w1_dense[j, p * f : (p + 1) * f] = w1[dk + half, 0]
                w2_dense[j * f : (j + 1) * f, p * f : (p + 1) * f] = w2[dk + half]
    c1 = np.tile(b1, s)
    s1r, t1r = np.tile(s1, s), np.tile(t1, s)
    s2r, t2r = np.tile(s2, s), np.tile(t2, s)

    w2f = s1r[:, None] * w2_dense
    c2 = t1r @ w2_dense + np.tile(b2, s)
    c_mat = s2r[:, None] * d
    e_mat = d.reshape(s, f, -1).sum(axis=1)            # residual x broadcast
    cb = t2r @ d + bd
    return {
        "W1": w1_dense.astype(np.float32), "c1": c1.astype(np.float32),
        "W2": w2f.astype(np.float32), "c2": c2.astype(np.float32),
        "C": c_mat.astype(np.float32), "E": e_mat.astype(np.float32),
        "cb": cb.astype(np.float32),
    }


def conv_dense_apply(cd: dict, x: jnp.ndarray) -> jnp.ndarray:
    """jnp reference of the dense-form signal branch: [.., 50] -> [.., 64]."""
    z1 = jax.nn.relu(x @ cd["W1"] + cd["c1"])
    z2 = jax.nn.relu(z1 @ cd["W2"] + cd["c2"])
    return z2 @ cd["C"] + x @ cd["E"] + cd["cb"]


def _pad2(arr, rows, cols, row_idx=None):
    """Scatter ``arr`` into a zeros([rows, cols]) at given row positions."""
    arr = np.asarray(arr, np.float32)
    out = np.zeros((rows, cols), np.float32)
    if row_idx is None:
        row_idx = np.arange(arr.shape[0])
    out[row_idx, : arr.shape[1]] = arr
    return out


def _pad_gates_cols(arr, rows, row_idx=None):
    """[*, 4H] -> [rows, 4*GP] placing gate g at columns [g*GP, g*GP+H)."""
    arr = np.asarray(arr, np.float32)
    hidden = arr.shape[1] // 4
    out = np.zeros((rows, 4 * GP), np.float32)
    if row_idx is None:
        row_idx = np.arange(arr.shape[0])
    for g in range(4):
        out[np.asarray(row_idx)[:, None], g * GP + np.arange(hidden)[None, :]] = arr[
            :, g * hidden : (g + 1) * hidden
        ]
    return out


def _pad_gates_bias(b):
    b = np.asarray(b, np.float32)
    hidden = b.shape[0] // 4
    out = np.zeros((1, 4 * GP), np.float32)
    for g in range(4):
        out[0, g * GP : g * GP + hidden] = b[g * hidden : (g + 1) * hidden]
    return out


def pack_stack_weights(fused: dict, t_len: int, dtype=jnp.bfloat16) -> dict:
    """Kernel-ready padded weights from BN-folded params (models.fused).

    Padded input-row layouts (matching the kernel's tile concatenations):
      layer2 in  [2*GP]:      fwd H1 at 0,   bwd H1 at GP
      layer3 in  [3*GP]:      fwd H2 at 0,   bwd H2 at GP,  sig 64 at 2*GP
      layer4 in  [2*GP]:      fwd H3 at 0,   bwd H3 at GP
      heads  in  [2*GP]:      fwd H4 at 0,   bwd H4 at GP
    """
    import ml_dtypes  # numpy bfloat16 without device dispatches

    np_dtype = np.dtype(ml_dtypes.bfloat16) if dtype == jnp.bfloat16 else np.dtype(dtype)
    cvt = lambda x: np.asarray(x, np_dtype)
    w: dict = {}

    r1 = fused["read_rnn1"]
    w["wi1f"] = cvt(_pad_gates_cols(r1["fwd"]["wi"], GP))   # rows 0-5 real
    w["wi1b"] = cvt(_pad_gates_cols(r1["bwd"]["wi"], GP))
    w["b1f"] = np.asarray(_pad_gates_bias(r1["fwd"]["b"]), np.float32)
    w["b1b"] = np.asarray(_pad_gates_bias(r1["bwd"]["b"]), np.float32)
    w["wh1f"] = cvt(_pad_gates_cols(r1["fwd"]["wh"], GP))
    w["wh1b"] = cvt(_pad_gates_cols(r1["bwd"]["wh"], GP))

    def rows_concat2(h):
        return np.concatenate([np.arange(h), GP + np.arange(h)])

    r2 = fused["read_rnn2"]
    idx2 = rows_concat2(H1)                       # layer-1 concat layout
    for d in ("fwd", "bwd"):
        tag = "2" + d[0]
        w["wi" + tag] = cvt(_pad_gates_cols(r2[d]["wi"], 2 * GP, idx2))
        w["wh" + tag] = cvt(_pad_gates_cols(r2[d]["wh"], GP))
        w["b" + tag] = np.asarray(_pad_gates_bias(r2[d]["b"]))

    t1 = fused["total_rnn1"]
    idx3 = np.concatenate(
        [np.arange(H2), GP + np.arange(H2), 2 * GP + np.arange(64)]
    )                                             # [fwd2, bwd2, sig]
    for d in ("fwd", "bwd"):
        tag = "3" + d[0]
        w["wi" + tag] = cvt(_pad_gates_cols(t1[d]["wi"], 3 * GP, idx3))
        w["wh" + tag] = cvt(_pad_gates_cols(t1[d]["wh"], GP))
        w["b" + tag] = np.asarray(_pad_gates_bias(t1[d]["b"]))

    t2 = fused["total_rnn2"]
    idx4 = rows_concat2(H3)
    for d in ("fwd", "bwd"):
        tag = "4" + d[0]
        w["wi" + tag] = cvt(_pad_gates_cols(t2[d]["wi"], 2 * GP, idx4))
        w["wh" + tag] = cvt(_pad_gates_cols(t2[d]["wh"], GP))
        w["b" + tag] = np.asarray(_pad_gates_bias(t2[d]["b"]))

    idx_h = rows_concat2(H4)
    w["d1w"] = cvt(_pad2(fused["dense1"]["w"], 2 * GP, GP, idx_h))     # ->128
    w["d1b"] = np.asarray(_pad2(fused["dense1"]["b"][None, :], 1, GP))
    w["d2w"] = cvt(_pad2(fused["dense2"]["w"], GP, GP))                # ->32
    w["d2b"] = np.asarray(_pad2(fused["dense2"]["b"][None, :], 1, GP))
    w["mow"] = cvt(_pad2(fused["main_out"]["w"], GP, GP))              # ->6
    w["mob"] = np.asarray(_pad2(fused["main_out"]["b"][None, :], 1, GP))

    fw = np.asarray(fused["feature"]["w"], np.float32).reshape(t_len, 6, 16)
    fw_p = np.zeros((t_len, GP, GP), np.float32)
    fw_p[:, :6, :16] = fw
    w["fw"] = cvt(fw_p)
    w["fb"] = np.asarray(_pad2(fused["feature"]["b"][None, :], 1, GP))

    fow = np.asarray(fused["final_out"]["w"], np.float32)              # [16, C]
    fow_p = np.zeros((GP, GP), np.float32)
    fow_p[:16, : fow.shape[1]] = fow
    w["fow"] = cvt(fow_p)
    fob = np.full((1, GP), -1e9, np.float32)     # padded classes never win
    fob[0, : fow.shape[1]] = np.asarray(fused["final_out"]["b"], np.float32)
    w["fob"] = fob

    # dense-form conv branch (v2 full kernel); 400 -> 512 lanes, 50 -> GP rows
    cd = conv_dense_form(fused)
    sf = cd["W1"].shape[1]                       # true S*F (400)
    w["cw1"] = cvt(_pad2(cd["W1"], GP, 4 * GP))
    w["cb1"] = np.asarray(_pad2(cd["c1"][None, :], 1, 4 * GP))
    w["cw2"] = cvt(_pad2(cd["W2"], 4 * GP, 4 * GP))
    w["cb2"] = np.asarray(_pad2(cd["c2"][None, :], 1, 4 * GP))
    w["cc"] = cvt(_pad2(cd["C"], 4 * GP, GP))
    w["ce"] = cvt(_pad2(cd["E"], GP, GP))
    w["cbias"] = np.asarray(_pad2(cd["cb"][None, :], 1, GP))
    assert sf <= 4 * GP

    return w


WEIGHT_ORDER = [
    "wi1f", "b1f", "wh1f", "wi1b", "b1b", "wh1b",
    "wi2f", "wh2f", "b2f", "wi2b", "wh2b", "b2b",
    "wi3f", "wh3f", "b3f", "wi3b", "wh3b", "b3b",
    "wi4f", "wh4f", "b4f", "wi4b", "wh4b", "b4b",
    "d1w", "d1b", "d2w", "d2b", "mow", "mob",
    "fw", "fb", "fow", "fob",
]

CONV_ORDER = ["cw1", "cb1", "cw2", "cb2", "cc", "ce", "cbias"]


def stack_weight_dicts(per_model: list[dict]) -> dict:
    """Stack per-model packed weights on a leading model axis."""
    keys = per_model[0].keys()
    return {k: np.stack([np.asarray(w[k]) for w in per_model], axis=0) for k in keys}


def stack_logits_multi(
    ws: dict,               # stacked weights, leading model axis M
    feats: jnp.ndarray,     # [B, T, 6] float32 (shared across models)
    sig_outs: jnp.ndarray,  # [M, B, T, 64] per-model conv-branch output
    *,
    t_len: int,
    block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Logits [M, B, NB_MAX]: both models in ONE kernel launch (grid dim 0)."""
    n_models = sig_outs.shape[0]
    b_total = feats.shape[0]
    assert b_total % block == 0, (b_total, block)
    n_blocks = b_total // block

    feats_tbh = jnp.broadcast_to(
        jnp.swapaxes(
            jnp.pad(feats, ((0, 0), (0, 0), (0, GP - feats.shape[-1]))), 0, 1
        ).astype(jnp.bfloat16)[None],
        (n_models, feats.shape[1], b_total, GP),
    )                                            # [M, T, B, GP] (shared input)
    sig_tbh = jnp.swapaxes(
        jnp.pad(sig_outs, ((0, 0), (0, 0), (0, 0), (0, GP - sig_outs.shape[-1]))),
        1, 2,
    ).astype(jnp.bfloat16)                       # [M, T, B, GP]

    def aspec(lanes):
        return pl.BlockSpec(
            (1, t_len, block, lanes),
            lambda m, i: (m, 0, i, 0),
            memory_space=pltpu.VMEM,
        )

    def wspec(arr):
        return pl.BlockSpec(
            (1,) + arr.shape[1:],
            lambda m, i, _n=arr.ndim - 1: (m,) + (0,) * _n,
            memory_space=pltpu.VMEM,
        )

    weights = [ws[k] for k in WEIGHT_ORDER]
    out = pl.pallas_call(
        functools.partial(_kernel, t_len=t_len, block=block),
        grid=(n_models, n_blocks),
        in_specs=[aspec(GP), aspec(GP)]
        + [wspec(x) for x in weights],
        out_specs=pl.BlockSpec(
            (1, block, GP), lambda m, i: (m, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_models, b_total, GP), jnp.float32),
        # NOTE: PARALLEL dimension_semantics measured 30% SLOWER here (no
        # megacore split on this chip; it inhibits sequential-grid
        # prefetch pipelining), so the grid stays ARBITRARY.
        interpret=interpret,
    )(feats_tbh, sig_tbh, *weights)
    return out[:, :, :NB_MAX]


def stack_logits_full(
    ws: dict,               # stacked packed weights incl. CONV_ORDER keys
    sig_nb: jnp.ndarray,    # [N, GP] bf16 per-base normalized signal windows
    feats_nb: jnp.ndarray,  # [N, GP] bf16 per-base features (lanes 6: zero)
    *,
    t_len: int,
    block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Logits [M, W, NB_MAX] for W = N - t_len windows, both models fused.

    Unlike stack_logits_multi, inputs are per-BASE arrays living in HBM; the
    kernel DMAs each block's contiguous slice and runs the conv branch
    itself, so no [W, T, 50] gather is ever materialized.
    """
    n = sig_nb.shape[0]
    n_windows = n - t_len
    assert n_windows % block == 0, (n, t_len, block)
    n_blocks = n_windows // block
    n_models = ws["cw1"].shape[0]

    def wspec(arr):
        return pl.BlockSpec(
            (1,) + arr.shape[1:],
            lambda m, i, _n=arr.ndim - 1: (m,) + (0,) * _n,
            memory_space=pltpu.VMEM,
        )

    weights = [ws[k] for k in CONV_ORDER + WEIGHT_ORDER]
    out = pl.pallas_call(
        functools.partial(_kernel_full, t_len=t_len, block=block),
        grid=(n_models, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2
        + [wspec(x) for x in weights],
        out_specs=pl.BlockSpec(
            (1, block, GP), lambda m, i: (m, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_models, n_windows, GP), jnp.float32),
        interpret=interpret,
    )(sig_nb, feats_nb, *weights)
    return out[:, :, :NB_MAX]


@functools.partial(jax.jit, static_argnames=("t_len", "block", "interpret"))
def stack_logits_pallas(
    w: dict,
    feats: jnp.ndarray,     # [B, T, 6] float32
    sig_out: jnp.ndarray,   # [B, T, 64]
    *,
    t_len: int,
    block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-model convenience wrapper: logits [B, NB_MAX]."""
    # runs under jit: add the model axis with jnp (w may hold tracers)
    ws = {k: jnp.asarray(v)[None] for k, v in w.items()}
    out = stack_logits_multi(
        ws, feats, sig_out[None], t_len=t_len, block=block, interpret=interpret
    )
    return out[0]


def stack_logits_reference(fused: dict, feats, sig_out):
    """jnp reference for kernel testing (delegates to models.fused)."""
    from ..models.fused import lstm_stack_apply

    return lstm_stack_apply(fused, feats, sig_out)
