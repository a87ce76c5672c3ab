"""Fused Pallas TPU kernel: the entire 4-layer Bi-LSTM stack + dense heads.

Why: the reviser's sequential core is 8 directional LSTM passes of T=11
steps each — ~180 small matmuls per model (reference lstmmodel.py:32-133).
As separate XLA ops this is dispatch/latency-bound; fusing the whole stack
into ONE kernel keeps every activation in VMEM and makes the window block
the parallel grid dimension.

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

This costs padded FLOPs but runs at MXU-aligned shapes throughout.
All matmuls are bf16 with f32 accumulation; gates and cell states are f32.
T and the hidden sizes are compile-time constants — the recurrences unroll
into straight-line MXU code.

Per-base hoisting (the big FLOP cut): window w's timestep t is base row
w + t, so anything that depends only on the base row — the conv signal
branch, the layer-1 input projections, and the signal contribution to the
layer-3 input projection — is computed ONCE per base row instead of once per
(window, t). At T=11 that is an ~11x saving on those matmuls (~30% of total
padded FLOPs). Per-t window inputs are then unaligned-row *value* slices
(``lax.slice``) of the per-base buffers, which Mosaic supports (unlike
unaligned *ref* slices, which require 8-row alignment — the round-1 failure
mode: "Slice shape along dimension 0 must be aligned to tiling (8)").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H1, H2, H3, H4 = 16, 64, 128, 64   # true hidden sizes
GP = 128                           # lane tile width
P1, P2, P4 = 32, 64, 64            # per-layer gate pitches (v4 packing)
NB_MAX = 6                         # model1 class count; model2 padded to it


def _hs(x):
    """Keras 2.2.4 hard_sigmoid — the LSTMs' recurrent activation."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _roll(x, shift: int):
    """Circular lane shift (lane l -> (l + shift) % lanes)."""
    return pltpu.roll(x, shift, axis=1)


def _pack_pair(f, b, h: int):
    """One-tile direction pack: fwd lanes [0,h) + bwd rolled to [h,2h).

    Mosaic's rotate only supports 32-bit data, so the bf16 hidden states
    round-trip through f32 (exact) for the roll.
    """
    return (
        f.astype(jnp.float32) + _roll(b.astype(jnp.float32), h)
    ).astype(jnp.bfloat16)


def _mask_lanes(x, n: int):
    """Zero lanes >= n."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(lane < n, x, 0)


def _scratch_rows(block: int, t_len: int) -> int:
    """Per-block scratch row count: block + t_len rounded up to bf16 tiling."""
    return -(-(block + t_len) // 16) * 16


def _stack_core(
    p1f, p1b, p3f, p3b, l2_extra,
    wh1f_ref, wh1b_ref,
    wi2f_ref, wh2f_ref, b2f_ref, wi2b_ref, wh2b_ref, b2b_ref,
    wi3f_ref, wh3f_ref, b3f_ref, wi3b_ref, wh3b_ref, b3b_ref,
    wi4f_ref, wh4f_ref, b4f_ref, wi4b_ref, wh4b_ref, b4b_ref,
    d1w_ref, d1b_ref, d2w_ref, d2b_ref, mow_ref, mob_ref,
    fw_ref, fb_ref, fow_ref, fob_ref,
    logits_ref,
    probs_ref,
    *,
    t_len: int,
    block: int,
):
    """LSTM stack + heads from pre-projected layer-1/layer-3 inputs.

    v4 packing: each layer's gates live at a per-layer pitch (P1=32, P2=64,
    GP, P4=64) instead of one 128-lane tile per gate, cutting padded matmul
    FLOPs ~1.9x. Gate extraction is masked whole-tile activations plus
    static lane rolls (pltpu.roll — single VPU ops), never unaligned lane
    slices. Direction pairs pack into ONE tile (fwd at lanes [0,H), bwd
    rolled to [H,2H)) so the next layer's input projection reads a single
    tile. Dead-lane algebra (zero weight rows/biases -> tanh(0)=0 carries
    zeros through the recurrence) plus an explicit post-step mask keep
    packed lanes clean.

    p1f/p1b: per-t [block, GP] f32 layer-1 pre-activations (pitch P1).
    p3f/p3b: per-t [block, 4*GP] f32 signal contributions to layer 3.
    l2_extra: None (sig folded into p3) — kept for shape clarity.
    Weight refs carry a leading model axis of block-size 1 (grid dim 0
    selects the model). Writes logits and, when probs_ref is not None, the
    per-window max softmax probability (for fastq qualities).
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    del l2_extra

    def run_direction(step_in, wh_ref, t_order):
        """Pitch-GP pass (layer 3): aligned [B, GP] tile slices per gate."""
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

    def run_dir_p64(step_in, wh_ref, t_order):
        """Pitch-64 pass (layers 2/4, H=64): z is [B, 2*GP] — tile0 holds
        [i|f], tile1 holds [g|o]. i/g align lane-for-lane; f and o roll by
        64 to meet the cell lanes [0, 64)."""
        wh = wh_ref[0]                           # [GP, 2*GP], rows [0,64) real
        h = jnp.zeros((block, GP), bf16)
        c = jnp.zeros((block, GP), f32)
        outs = [None] * t_len
        for t in t_order:
            z = step_in(t) + _mm(h, wh)          # [B, 2*GP] f32
            t0 = z[:, :GP]
            t1 = z[:, GP:]
            a = _hs(t0)                          # [i | f]
            gt = jnp.tanh(t1)                    # g valid on lanes [0,64)
            ot = _hs(t1)                         # o valid on lanes [64,128)
            c = _roll(a, 64) * c + a * gt        # f*c + i*g on lanes [0,64)
            h = _mask_lanes(_roll(ot, 64) * jnp.tanh(c), 64).astype(bf16)
            outs[t] = h
        return outs

    def run_dir_p32(step_in, wh_ref, t_order):
        """Pitch-32 pass (layer 1, H=16): z is one [B, GP] tile holding
        [i|f|g|o] at 32-lane slots; rolls bring f/g/o to the cell lanes."""
        wh = wh_ref[0]                           # [GP, GP], rows [0,16) real
        h = jnp.zeros((block, GP), bf16)
        c = jnp.zeros((block, GP), f32)
        outs = [None] * t_len
        for t in t_order:
            z = step_in(t) + _mm(h, wh)          # [B, GP] f32
            a = _hs(z)                           # i@[0,32) f@[32,64) o@[96,128)
            gt = jnp.tanh(z)                     # g@[64,96)
            c = _roll(a, 96) * c + a * _roll(gt, 64)
            h = _mask_lanes(_roll(a, 32) * jnp.tanh(c), 32).astype(bf16)
            outs[t] = h
        return outs

    fwd = list(range(t_len))
    bwd = list(range(t_len - 1, -1, -1))

    def proj(inputs, wi_ref, b_ref):
        wi = wi_ref[0]
        b = b_ref[0].astype(f32)
        return lambda t: _mm(inputs[t], wi) + b

    l1f = run_dir_p32(lambda t: p1f[t], wh1f_ref, fwd)
    l1b = run_dir_p32(lambda t: p1b[t], wh1b_ref, bwd)
    # direction pair packed into one tile: fwd H1 at lanes [0,16), bwd
    # rolled to [16,32) (packed lanes beyond 2*H are zero by the masks)
    l1 = [_pack_pair(f, b, H1) for f, b in zip(l1f, l1b)]

    l2f = run_dir_p64(proj(l1, wi2f_ref, b2f_ref), wh2f_ref, fwd)
    l2b = run_dir_p64(proj(l1, wi2b_ref, b2b_ref), wh2b_ref, bwd)
    l2 = [_pack_pair(f, b, H2) for f, b in zip(l2f, l2b)]

    p3m_f = proj(l2, wi3f_ref, b3f_ref)
    p3m_b = proj(l2, wi3b_ref, b3b_ref)
    l3f = run_direction(lambda t: p3m_f(t) + p3f[t], wh3f_ref, fwd)
    l3b = run_direction(lambda t: p3m_b(t) + p3b[t], wh3b_ref, bwd)
    l3 = [jnp.concatenate([f, b], axis=1) for f, b in zip(l3f, l3b)]

    l4f = run_dir_p64(proj(l3, wi4f_ref, b4f_ref), wh4f_ref, fwd)
    l4b = run_dir_p64(proj(l3, wi4b_ref, b4b_ref), wh4b_ref, bwd)
    l4 = [_pack_pair(f, b, H4) for f, b in zip(l4f, l4b)]

    d1w = d1w_ref[0]
    d1b = d1b_ref[0].astype(f32)
    d2w = d2w_ref[0]
    d2b = d2b_ref[0].astype(f32)
    mow = mow_ref[0]
    mob = mob_ref[0].astype(f32)
    feat_acc = jnp.zeros((block, GP), f32)
    for t in range(t_len):
        h = l4[t]                                                      # [B,128]
        h = jnp.maximum(_mm(h, d1w) + d1b, 0.0).astype(bf16)           # [B,128]
        h = jnp.maximum(_mm(h, d2w) + d2b, 0.0).astype(bf16)           # [B,128]
        m = jnp.maximum(_mm(h, mow) + mob, 0.0).astype(bf16)           # [B,128]
        feat_acc = feat_acc + _mm(m, fw_ref[0, t])
    feature = jnp.maximum(feat_acc + fb_ref[0].astype(f32), 0.0)
    logits = _mm(feature.astype(bf16), fow_ref[0]) + fob_ref[0].astype(f32)
    logits_ref[0] = logits
    if probs_ref is not None:
        # max softmax prob per window (padded classes carry -1e9 bias)
        mx = jnp.max(logits, axis=1, keepdims=True)
        denom = jnp.sum(jnp.exp(logits - mx), axis=1, keepdims=True)
        probs_ref[0] = jnp.broadcast_to(1.0 / denom, (block, GP))


def _project_l1_l3(feat_all, s64_all, wi1f, b1f, wi1b, b1b, wi3fs, wi3bs):
    """Per-base-row hoisted projections (f32)."""
    f32 = jnp.float32
    p1f_all = _mm(feat_all, wi1f[0]) + b1f[0].astype(f32)
    p1b_all = _mm(feat_all, wi1b[0]) + b1b[0].astype(f32)
    p3f_all = _mm(s64_all, wi3fs[0])
    p3b_all = _mm(s64_all, wi3bs[0])
    return p1f_all, p1b_all, p3f_all, p3b_all


def _tslices(arr, t_len: int, block: int):
    """Per-t [block, lanes] value slices at (unaligned) static row offsets."""
    lanes = arr.shape[1]
    return [
        jax.lax.slice(arr, (t, 0), (t + block, lanes)) for t in range(t_len)
    ]


def _kernel(
    feats_ref, sig_ref,
    wi1f_ref, b1f_ref, wh1f_ref, wi1b_ref, b1b_ref, wh1b_ref,
    wi3fs_ref, wi3bs_ref,
    *refs,
    t_len: int,
    block: int,
    want_probs: bool,
):
    """v1 kernel: pre-gathered [1, T, block, GP] window inputs."""
    if want_probs:
        refs, outs = refs[:-2], refs[-2:]
    else:
        refs, outs = refs[:-1], (refs[-1], None)
    f32 = jnp.float32
    p1f, p1b, p3f, p3b = [], [], [], []
    b1f = b1f_ref[0].astype(f32)
    b1b = b1b_ref[0].astype(f32)
    for t in range(t_len):
        ft = feats_ref[0, t]
        st = sig_ref[0, t]
        p1f.append(_mm(ft, wi1f_ref[0]) + b1f)
        p1b.append(_mm(ft, wi1b_ref[0]) + b1b)
        p3f.append(_mm(st, wi3fs_ref[0]))
        p3b.append(_mm(st, wi3bs_ref[0]))
    _stack_core(
        p1f, p1b, p3f, p3b, None, wh1f_ref, wh1b_ref, *refs,
        outs[0], outs[1],
        t_len=t_len, block=block,
    )


def _kernel_full(
    *all_refs,
    t_len: int,
    block: int,
    want_probs: bool,
    has_wv: bool,
):
    """v3 kernel: whole per-BASE arrays stay in HBM; each program DMAs its
    row-aligned [R, GP] slice (R = block + T rounded up to the bf16 tiling),
    computes the conv branch and the hoisted projections ONCE PER BASE ROW,
    and extracts per-t window inputs as unaligned value slices.

    This replaces the XLA-side window gather ([W, T, 50] materialization,
    ~27 MB/read) and cuts the conv + layer-1 + layer-3-signal matmul work
    ~11x vs computing them per (window, t).

    With has_wv, the first ref is a [1,1] SMEM scalar: the number of valid
    windows. Grid programs whose block starts at/past it skip all work (their
    output rows are garbage the host never reads) — one compiled program
    serves every batch fill level.
    """
    if has_wv:
        wv_ref, all_refs = all_refs[0], all_refs[1:]
    (
        sig_hbm, feats_hbm,
        cw1_ref, cb1_ref, cw2_ref, cb2_ref, cc_ref, ce_ref, cbias_ref,
        wi1f_ref, b1f_ref, wh1f_ref, wi1b_ref, b1b_ref, wh1b_ref,
        wi3fs_ref, wi3bs_ref, *refs,
    ) = all_refs
    if want_probs:
        refs, outs = refs[:-2], refs[-2:]
    else:
        refs, outs = refs[:-1], (refs[-1], None)
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    # program_id must be read outside run_scoped (interpret mode has no grid
    # context inside the scoped body)
    w0 = pl.program_id(1) * block
    rows = _scratch_rows(block, t_len)

    def body(sig_scr, feat_scr, sems):
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

        sig_all = sig_scr[:]                    # [R, GP] bf16
        feat_all = feat_scr[:]

        # conv residual branch, dense form, once per base row
        z1 = jnp.maximum(
            _mm(sig_all, cw1_ref[0]) + cb1_ref[0].astype(f32), 0.0
        ).astype(bf16)
        z2 = jnp.maximum(
            _mm(z1, cw2_ref[0]) + cb2_ref[0].astype(f32), 0.0
        ).astype(bf16)
        s64_all = (
            _mm(z2, cc_ref[0]) + _mm(sig_all, ce_ref[0])
            + cbias_ref[0].astype(f32)
        ).astype(bf16)                          # [R, GP]

        p1f_all, p1b_all, p3f_all, p3b_all = _project_l1_l3(
            feat_all, s64_all,
            wi1f_ref, b1f_ref, wi1b_ref, b1b_ref, wi3fs_ref, wi3bs_ref,
        )
        _stack_core(
            _tslices(p1f_all, t_len, block),
            _tslices(p1b_all, t_len, block),
            _tslices(p3f_all, t_len, block),
            _tslices(p3b_all, t_len, block),
            None,
            wh1f_ref, wh1b_ref, *refs,
            outs[0], outs[1],
            t_len=t_len, block=block,
        )

    def scoped():
        pl.run_scoped(
            body,
            pltpu.VMEM((rows, GP), jnp.bfloat16),
            pltpu.VMEM((rows, GP), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        )

    if has_wv:
        @pl.when(w0 < wv_ref[0, 0])
        def _():
            scoped()
    else:
        scoped()


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
    Dense-form costs ~2.7x the conv FLOPs but is pure aligned MXU work —
    and it runs once per base row, not per (window, t).
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


def _pad_gates_cols(arr, rows, row_idx=None, pitch=GP):
    """[*, 4H] -> [rows, 4*pitch] placing gate g at cols [g*pitch, g*pitch+H)."""
    arr = np.asarray(arr, np.float32)
    hidden = arr.shape[1] // 4
    assert hidden <= pitch
    out = np.zeros((rows, 4 * pitch), np.float32)
    if row_idx is None:
        row_idx = np.arange(arr.shape[0])
    for g in range(4):
        out[
            np.asarray(row_idx)[:, None], g * pitch + np.arange(hidden)[None, :]
        ] = arr[:, g * hidden : (g + 1) * hidden]
    return out


def _pad_gates_bias(b, pitch=GP):
    b = np.asarray(b, np.float32)
    hidden = b.shape[0] // 4
    out = np.zeros((1, 4 * pitch), np.float32)
    for g in range(4):
        out[0, g * pitch : g * pitch + hidden] = b[g * hidden : (g + 1) * hidden]
    return out


def pack_stack_weights(fused: dict, t_len: int, dtype=jnp.bfloat16) -> dict:
    """Kernel-ready padded weights from BN-folded params (models.fused).

    v4 layout: per-layer gate pitches (P1=32, P2=64, GP for layer 3, P4=64)
    and single-tile direction packing:
      layer2 in  [GP]:   fwd H1 at lanes 0,  bwd H1 at lanes H1
      layer3 in  [GP]:   fwd H2 at lanes 0,  bwd H2 at lanes H2
        (the 64 signal rows of the reference's 192-row layer-3 input are
         split out as wi3fs/wi3bs [GP, 4*GP], applied per base row)
      layer4 in  [2*GP]: fwd H3 tile 0, bwd H3 tile 1 (tile concatenation)
      heads  in  [GP]:   fwd H4 at lanes 0,  bwd H4 at lanes H4
    Zero rows/biases everywhere keep dead lanes provably zero through the
    recurrences (see _stack_core).
    """
    import ml_dtypes  # numpy bfloat16 without device dispatches

    np_dtype = np.dtype(ml_dtypes.bfloat16) if dtype == jnp.bfloat16 else np.dtype(dtype)
    cvt = lambda x: np.asarray(x, np_dtype)
    w: dict = {}

    r1 = fused["read_rnn1"]
    w["wi1f"] = cvt(_pad_gates_cols(r1["fwd"]["wi"], GP, pitch=P1))  # rows 0-5
    w["wi1b"] = cvt(_pad_gates_cols(r1["bwd"]["wi"], GP, pitch=P1))
    w["b1f"] = np.asarray(_pad_gates_bias(r1["fwd"]["b"], P1), np.float32)
    w["b1b"] = np.asarray(_pad_gates_bias(r1["bwd"]["b"], P1), np.float32)
    w["wh1f"] = cvt(_pad_gates_cols(r1["fwd"]["wh"], GP, pitch=P1))
    w["wh1b"] = cvt(_pad_gates_cols(r1["bwd"]["wh"], GP, pitch=P1))

    r2 = fused["read_rnn2"]
    # layer-1 pair packed into one tile: input rows 0..2*H1 map to lanes
    for d in ("fwd", "bwd"):
        tag = "2" + d[0]
        w["wi" + tag] = cvt(_pad_gates_cols(r2[d]["wi"], GP, pitch=P2))
        w["wh" + tag] = cvt(_pad_gates_cols(r2[d]["wh"], GP, pitch=P2))
        w["b" + tag] = np.asarray(_pad_gates_bias(r2[d]["b"], P2))

    t1 = fused["total_rnn1"]
    sig_rows = 2 * H2                             # reference rows 128:192 = sig
    for d in ("fwd", "bwd"):
        tag = "3" + d[0]
        wi = np.asarray(t1[d]["wi"], np.float32)
        # layer-2 pair packed into one tile: rows 0..2*H2 map to lanes
        w["wi" + tag] = cvt(_pad_gates_cols(wi[:sig_rows], GP))
        w["wi" + tag + "s"] = cvt(_pad_gates_cols(wi[sig_rows:], GP))
        w["wh" + tag] = cvt(_pad_gates_cols(t1[d]["wh"], GP))
        w["b" + tag] = np.asarray(_pad_gates_bias(t1[d]["b"]))

    t2 = fused["total_rnn2"]
    for d in ("fwd", "bwd"):
        tag = "4" + d[0]
        # layer-3 input is a genuine 2-tile concat (H3 = GP fills a tile)
        w["wi" + tag] = cvt(_pad_gates_cols(t2[d]["wi"], 2 * GP, pitch=P4))
        w["wh" + tag] = cvt(_pad_gates_cols(t2[d]["wh"], GP, pitch=P4))
        w["b" + tag] = np.asarray(_pad_gates_bias(t2[d]["b"], P4))

    # layer-4 pair packed into one tile: dense1 rows 0..2*H4 map to lanes
    w["d1w"] = cvt(_pad2(fused["dense1"]["w"], GP, GP))                # ->128
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

    # dense-form conv branch (v3 full kernel); 400 -> 512 lanes, 50 -> GP rows
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


# layer-1 / layer-3-signal weights, consumed before the shared stack core
PRE_ORDER = [
    "wi1f", "b1f", "wh1f", "wi1b", "b1b", "wh1b",
    "wi3fs", "wi3bs",
]

# the shared _stack_core argument order (wh1 refs first)
CORE_ORDER = [
    "wi2f", "wh2f", "b2f", "wi2b", "wh2b", "b2b",
    "wi3f", "wh3f", "b3f", "wi3b", "wh3b", "b3b",
    "wi4f", "wh4f", "b4f", "wi4b", "wh4b", "b4b",
    "d1w", "d1b", "d2w", "d2b", "mow", "mob",
    "fw", "fb", "fow", "fob",
]

WEIGHT_ORDER = PRE_ORDER + CORE_ORDER

CONV_ORDER = ["cw1", "cb1", "cw2", "cb2", "cc", "ce", "cbias"]


def stack_weight_dicts(per_model: list[dict]) -> dict:
    """Stack per-model packed weights on a leading model axis."""
    keys = per_model[0].keys()
    return {k: np.stack([np.asarray(w[k]) for w in per_model], axis=0) for k in keys}


def _wspec(arr):
    return pl.BlockSpec(
        (1,) + arr.shape[1:],
        lambda m, i, _n=arr.ndim - 1: (m,) + (0,) * _n,
        memory_space=pltpu.VMEM,
    )


def _weight_list(ws: dict, keys: list[str]):
    # dedupe (wh1f/wh1b appear in both PRE and the core position list):
    # pallas inputs must be positional, so pass each occurrence
    return [ws[k] for k in keys]


def stack_logits_multi(
    ws: dict,               # stacked weights, leading model axis M
    feats: jnp.ndarray,     # [B, T, 6] float32 (shared across models)
    sig_outs: jnp.ndarray,  # [M, B, T, 64] per-model conv-branch output
    *,
    t_len: int,
    block: int = 256,
    interpret: bool = False,
    want_probs: bool = False,
):
    """Logits [M, B, NB_MAX]: both models in ONE kernel launch (grid dim 0).

    v1 path: takes pre-gathered per-window inputs. Used by tests and by
    backends where the HBM-DMA v3 kernel is unavailable.
    """
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

    weights = _weight_list(ws, WEIGHT_ORDER)
    out_shape = [jax.ShapeDtypeStruct((n_models, b_total, GP), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, block, GP), lambda m, i: (m, i, 0),
                     memory_space=pltpu.VMEM)
    ]
    if want_probs:
        out_shape.append(
            jax.ShapeDtypeStruct((n_models, b_total, GP), jnp.float32)
        )
        out_specs.append(out_specs[0])
    out = pl.pallas_call(
        functools.partial(
            _kernel, t_len=t_len, block=block, want_probs=want_probs
        ),
        grid=(n_models, n_blocks),
        in_specs=[aspec(GP), aspec(GP)] + [_wspec(x) for x in weights],
        out_specs=out_specs,
        out_shape=out_shape,
        # NOTE: PARALLEL dimension_semantics measured 30% SLOWER here (no
        # megacore split on this chip; it inhibits sequential-grid
        # prefetch pipelining), so the grid stays ARBITRARY.
        interpret=interpret,
    )(feats_tbh, sig_tbh, *weights)
    if want_probs:
        return out[0][:, :, :NB_MAX], out[1][:, :, 0]
    return out[0][:, :, :NB_MAX]


def stack_logits_full(
    ws: dict,               # stacked packed weights incl. CONV_ORDER keys
    sig_nb: jnp.ndarray,    # [N, GP] bf16 per-base normalized signal windows
    feats_nb: jnp.ndarray,  # [N, GP] bf16 per-base features (lanes 6: zero)
    *,
    t_len: int,
    block: int = 256,
    interpret: bool = False,
    want_probs: bool = False,
    w_valid: jnp.ndarray | None = None,
):
    """Logits [M, W, NB_MAX] for W = N - t_len windows, both models fused.

    Unlike stack_logits_multi, inputs are per-BASE arrays living in HBM; the
    kernel DMAs each block's row-aligned slice and runs the conv branch +
    hoisted projections itself, so no [W, T, 50] gather is ever materialized.
    With want_probs=True additionally returns the max softmax probability
    per window [M, W] (for fastq quality strings). w_valid (scalar-like
    int32) skips whole blocks past the valid-window count, so one compiled
    program serves every fill level of a fixed-shape batch.
    """
    n = sig_nb.shape[0]
    n_windows = n - t_len
    assert n_windows % block == 0, (n, t_len, block)
    n_blocks = n_windows // block
    n_models = ws["cw1"].shape[0]

    # the last block's DMA reads rows [n_windows - block, n_windows - block
    # + R); pad the per-base arrays up to that (R - block - t_len extra rows)
    need = n_windows - block + _scratch_rows(block, t_len)
    if need > n:
        sig_nb = jnp.pad(sig_nb, ((0, need - n), (0, 0)))
        feats_nb = jnp.pad(feats_nb, ((0, need - n), (0, 0)))

    weights = _weight_list(ws, CONV_ORDER + WEIGHT_ORDER)
    out_shape = [jax.ShapeDtypeStruct((n_models, n_windows, GP), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, block, GP), lambda m, i: (m, i, 0),
                     memory_space=pltpu.VMEM)
    ]
    if want_probs:
        out_shape.append(
            jax.ShapeDtypeStruct((n_models, n_windows, GP), jnp.float32)
        )
        out_specs.append(out_specs[0])
    has_wv = w_valid is not None
    wv_args, wv_specs = (), []
    if has_wv:
        wv_args = (jnp.asarray(w_valid, jnp.int32).reshape(1, 1),)
        wv_specs = [
            pl.BlockSpec((1, 1), lambda m, i: (0, 0), memory_space=pltpu.SMEM)
        ]
    out = pl.pallas_call(
        functools.partial(
            _kernel_full, t_len=t_len, block=block, want_probs=want_probs,
            has_wv=has_wv,
        ),
        grid=(n_models, n_blocks),
        in_specs=wv_specs
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 2
        + [_wspec(x) for x in weights],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*wv_args, sig_nb, feats_nb, *weights)
    if want_probs:
        return out[0][:, :, :NB_MAX], out[1][:, :, 0]
    return out[0][:, :, :NB_MAX]


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


def executed_mac_counts(t_len: int) -> dict:
    """Algorithmic MAC counts per model for the fused stack, derived from the
    architecture dims (reference lstmmodel.py:32-81) — the single source for
    bench MFU math (round-4 verdict: the window length and the constants must
    come from here, not be hand-copied).

    "Executed" counts the hoisting-aware unpadded math the kernel's schedule
    performs: per-base terms run once per base row; window-dependent terms run
    once per (window, t). The kernel's padded-lane silicon count is higher,
    so MFU on this basis is conservative. "Naive" recomputes the hoisted
    terms every (window, t) — the math-equivalent cost of the un-fused graph.
    """
    q = 50                                   # window samples (conv length)
    # hoisted, once per base row: conv branch + projections of row-only inputs
    conv = 1 * 8 * 3 * q + 8 * 8 * 3 * q + 8 * q * 64   # conv1, conv2, sig_dense
    l1_proj = 2 * 6 * (4 * H1)                          # feats -> L1 gates
    l3_sig = 2 * H4 * (4 * H3)                          # sig_dense -> L3 gates
    per_base = conv + l1_proj + l3_sig
    # once per (window, t): recurrent matmuls ...
    rec = 2 * (H1 * 4 * H1 + H2 * 4 * H2 + H3 * 4 * H3 + H4 * 4 * H4)
    # ... window-dependent input projections ...
    proj_t = 2 * (2 * H1 * 4 * H2      # L1 out (2 dirs) -> L2 gates
                  + 2 * H2 * 4 * H3    # L2 out -> L3 gates (read part)
                  + 2 * H3 * 4 * H4)   # L3 out -> L4 gates
    # ... and the per-t heads (dense1/dense2/main_out/feature accumulation)
    heads_t = 2 * H4 * 128 + 128 * 32 + 32 * NB_MAX + NB_MAX * 16
    per_window_per_t = rec + proj_t + heads_t
    final = 16 * NB_MAX                       # final_out, once per window
    return {
        "per_base": per_base,
        "per_window": per_window_per_t * t_len + final,
        "naive_per_window": (per_window_per_t + per_base) * t_len + final,
    }
