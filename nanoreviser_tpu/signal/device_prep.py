"""On-device preprocessing: raw int16 signal -> windows + features (jnp).

Motivation: the tunnel to the TPU uploads at ~200 MB/s but the 2-core host
takes ~67 ms/read to window signals, and host-materialized windows are ~1.8 MB
per read. Moving windowing/normalization onto the device cuts the upload to
~200 KB/read (raw int16 signal + small per-base arrays) and offloads the
host almost entirely — decode + merge are all that remain host-side.

Many reads are processed per device call: they live concatenated in one
fixed-shape buffer, and every per-read quantity (window clamping at the
read's signal end, the last-base 3/5 duration rule, shift/scale
normalization) respects the per-read segment bounds.

The per-read MAD normalizers (shift = median, scale = median(|x - shift|))
are computed on the HOST via exact int16 histogram medians
(signal.segmentation.mad_normalizers_int16, ~0.5 ms/read) and shipped in the
batch buffer: a measured 66-round on-device bitwise median search cost
~200 ms/batch — 10x the fused model kernel itself.

Performance notes (measured on the v5e chip, 128k-base batch):
* event moments via a [N, 128] sample gather cost 125 ms — replaced by
  (a) reusing the 50-sample window gather for events it fully covers
  (the vast majority; mean event length ~9 samples) and (b) BLOCK-LOCAL
  f32 prefix sums for the rest: within 1024-sample blocks the running
  sums stay small, so f32 keeps ~6 digits where a whole-batch cumsum of
  x^2 loses the variance entirely; events spanning >1 block boundary
  (>1024 samples, vanishingly rare) fall back to a block-total prefix.
* jnp.searchsorted segment ids cost ~26 ms — replaced by broadcast
  compare-sums against the <=48 segment bounds.

Semantics mirror signal.segmentation / signal.features (same window
clamping, quirky symmetric padding, event moments, feature scaling) on
padded fixed-shape arrays; parity is asserted against the exact host path
in tests/test_device_prep.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MOMENT_BLOCK = 1024     # block-local prefix-sum width (must be >= 2 * 128)


def _segment_ids(bounds: jnp.ndarray, size: int) -> jnp.ndarray:
    """[size] segment id per position from monotone bounds [R+1].

    Broadcast compare-sum: O(size * R) VPU ops beat a searchsorted lowering
    by ~25 ms at size=2M, R=48.
    """
    idx = jnp.arange(size, dtype=jnp.int32)
    return (idx[:, None] >= bounds[None, 1:-1]).sum(
        axis=1, dtype=jnp.int32
    )


def _block_local_sums(vals: jnp.ndarray, st: jnp.ndarray, en: jnp.ndarray):
    """Sum of ``vals[st:en]`` per event via block-local f32 prefix sums.

    vals: [S] f32 (S a multiple of MOMENT_BLOCK); st/en: [N] int32 with
    0 <= st <= en <= S. Exact-ish for events inside <= 2 blocks; events
    spanning more use a block-total prefix for the middle (f32 error there
    amortizes over >= MOMENT_BLOCK samples).
    """
    B = MOMENT_BLOCK
    s = vals.shape[0]
    nb = s // B
    blocks = vals.reshape(nb, B)
    # exclusive in-block prefix: cse[i] = sum vals[B*blk(i) : i)
    incl = jnp.cumsum(blocks, axis=1)
    cse = jnp.concatenate(
        [jnp.zeros((nb, 1), vals.dtype), incl[:, :-1]], axis=1
    ).reshape(s)
    tot = incl[:, -1]                                   # [nb] block totals
    tp = jnp.concatenate([jnp.zeros(1, vals.dtype), jnp.cumsum(tot)])

    b0 = st // B
    b1 = jnp.maximum(en - 1, st) // B
    cse_st = cse[jnp.clip(st, 0, s - 1)]
    # sum over [B*b1, en): cse[en] unless en is exactly a block boundary
    en_cl = jnp.clip(en, 0, s - 1)
    tail = jnp.where((en % B) != 0, cse[en_cl], tot[jnp.clip(b1, 0, nb - 1)])
    head = tot[jnp.clip(b0, 0, nb - 1)] - cse_st
    middle = tp[jnp.clip(b1, 0, nb)] - tp[jnp.clip(b0 + 1, 0, nb)]
    same = b0 == b1
    out = jnp.where(same, tail - cse_st, head + middle + tail)
    return jnp.where(en > st, out, 0.0)


def device_preprocess_batch(
    signal: jnp.ndarray,       # [S_pad] int16: concatenated read signal tails
    starts: jnp.ndarray,       # [N_pad] int32 base starts rel. to each read's tail
    ab_mean: jnp.ndarray,      # [N_pad] f32/f16 event means
    ab_std: jnp.ndarray,       # [N_pad] f32/f16 event stdvs
    colors: jnp.ndarray,       # [N_pad] f32 base colors (A=250 G=180 T=100 C=30)
    sig_bounds: jnp.ndarray,   # [R+1] int32: read r's tail is sig[sb[r]:sb[r+1]]
    base_bounds: jnp.ndarray,  # [R+1] int32: read r's bases are rows [bb[r]:bb[r+1])
    shift_r: jnp.ndarray,      # [R] f32 per-read median (pad entries: 1.0)
    scale_r: jnp.ndarray,      # [R] f32 per-read MAD (pad entries: 1.0)
    query_len: int = 50,
):
    """Segmented signal windows + features for a multi-read batch.

    Rows beyond ``base_bounds[-1]`` produce garbage windows that the host
    discards. Returns (windows [N_pad, query_len] f32, feats [N_pad, 6] f32).
    """
    s_pad = signal.shape[0]
    n_pad = starts.shape[0]
    assert s_pad % MOMENT_BLOCK == 0, s_pad
    x = signal.astype(jnp.float32)
    sidx = jnp.arange(s_pad, dtype=jnp.int32)
    nidx = jnp.arange(n_pad, dtype=jnp.int32)
    s_valid = sig_bounds[-1]
    smask = sidx < s_valid
    rid_s = _segment_ids(sig_bounds, s_pad)
    rid_b = _segment_ids(base_bounds, n_pad)
    sig_len = sig_bounds[1:] - sig_bounds[:-1]          # [R]

    shift_b = shift_r[rid_b]                            # [N_pad] per-base
    scale_b = scale_r[rid_b]
    sig_len_b = sig_len[rid_b]
    sig_off_b = sig_bounds[:-1][rid_b]

    # durations: next start within the read; the read's last base gets the
    # reference's 3/5 rule (reference nanorev_fast5_handeler.py:120-129)
    nxt = jnp.concatenate([starts[1:], starts[-1:]])
    prev = jnp.concatenate([starts[:1], starts[:-1]])
    is_last = nidx == (base_bounds[1:][rid_b] - 1)
    last_dur = jnp.where(starts - prev < 5, 3, 5).astype(starts.dtype)
    ends = jnp.where(is_last, starts + last_dur, nxt)
    durations = (ends - starts).astype(jnp.float32)

    # 50-sample windows with the reference's clamp + symmetric-pad quirk,
    # clamped at each READ's signal end (not the buffer's). Expressed as
    # vmapped 50-wide dynamic slices (XLA lowers to a slice-gather, ~10x
    # faster than a [N, 50] elementwise gather on TPU); the front pad keeps
    # slice starts in range when the symmetric pad shifts them negative.
    ahead = query_len // 2
    win_st = jnp.maximum(starts - ahead, 0)
    win_en = jnp.minimum(starts + (query_len - ahead), sig_len_b)
    win_len = win_en - win_st
    left = (query_len - win_len + 1) // 2
    cols = jnp.arange(query_len, dtype=jnp.int32)
    valid = (cols[None, :] >= left[:, None]) & (
        cols[None, :] < (left + win_len)[:, None]
    )
    pad_front = query_len
    x_pad = jnp.concatenate(
        [jnp.zeros(pad_front, x.dtype), x, jnp.zeros(query_len, x.dtype)]
    )
    slice_start = win_st + sig_off_b - left + pad_front
    gathered = jax.vmap(
        lambda p: jax.lax.dynamic_slice(x_pad, (p,), (query_len,))
    )(slice_start)                                      # raw DAC values
    windows = jnp.where(
        valid, (gathered - shift_b[:, None]) / scale_b[:, None], 0.0
    )

    # event moments via BLOCK-LOCAL prefix sums (f32 precision holds: in a
    # 1024-sample block the running sums stay ~6 significant digits; parity
    # vs the exact f64 host path is ~1e-7/2e-5 on real reads, 1000x under
    # the model's bf16 input quantization)
    st_g = jnp.clip(starts + sig_off_b, 0, s_pad)
    en_g = jnp.clip(ends + sig_off_b, 0, s_pad)
    n_int = en_g - st_g
    n_samp = jnp.maximum(n_int.astype(jnp.float32), 1.0)
    xc = jnp.where(smask, x - shift_r[rid_s], 0.0)
    s1_p = _block_local_sums(xc, st_g, en_g)
    s2_p = _block_local_sums(xc * xc, st_g, en_g)
    mean_c = s1_p / n_samp
    var = jnp.maximum(s2_p / n_samp - mean_c * mean_c, 0.0)
    ev_mean = mean_c + shift_b
    ev_std = jnp.sqrt(var)

    feats = jnp.stack(
        [
            colors.astype(jnp.float32) * (1.0 / 300.0),
            ev_mean / shift_b,
            ev_std / scale_b,
            durations * 0.1,
            ab_mean.astype(jnp.float32),
            ab_std.astype(jnp.float32),
        ],
        axis=1,
    )
    return windows, feats
