"""Segmented batch device preprocessing vs the exact host path (CPU jax)."""

import jax.numpy as jnp
import numpy as np

from nanoreviser_tpu.io import get_read_data
from nanoreviser_tpu.signal import assemble_features, base_colors, segment_signal
from nanoreviser_tpu.signal.device_prep import device_preprocess_batch
from nanoreviser_tpu.signal.segmentation import mad_normalizers_int16


def test_batch_prep_matches_host_per_read(unitest_fast5_files):
    """Two real reads concatenated into one padded buffer: every read's
    windows/features must equal the exact single-read host path."""
    reads = [get_read_data(str(p)) for p in unitest_fast5_files[:2]]
    tails = [rd.signal[rd.read_start_rel_to_raw :] for rd in reads]

    r_max = 4
    s_pad = 1 << int(np.ceil(np.log2(sum(len(t) for t in tails) + 64)))
    n_pad = sum(rd.n_bases for rd in reads) + 53

    sig = np.zeros(s_pad, np.int16)
    starts = np.zeros(n_pad, np.int32)
    abm = np.zeros(n_pad, np.float32)
    abs_ = np.zeros(n_pad, np.float32)
    col = np.zeros(n_pad, np.float32)
    sb = np.zeros(r_max + 1, np.int32)
    bb = np.zeros(r_max + 1, np.int32)
    shift_r = np.ones(r_max, np.float32)
    scale_r = np.ones(r_max, np.float32)

    s_off = n_off = 0
    for k, (rd, tail) in enumerate(zip(reads, tails)):
        sig[s_off : s_off + len(tail)] = tail
        n = rd.n_bases
        starts[n_off : n_off + n] = rd.starts
        abm[n_off : n_off + n] = rd.ab_mean
        abs_[n_off : n_off + n] = rd.ab_std
        col[n_off : n_off + n] = base_colors(rd.bases)
        sb[k], bb[k] = s_off, n_off
        shift_r[k], scale_r[k] = mad_normalizers_int16(tail)
        s_off += len(tail)
        n_off += n
    sb[len(reads) :] = s_off
    bb[len(reads) :] = n_off
    starts[n_off:] = starts[n_off - 1]

    windows, feats = device_preprocess_batch(
        jnp.asarray(sig), jnp.asarray(starts), jnp.asarray(abm),
        jnp.asarray(abs_), jnp.asarray(col),
        jnp.asarray(sb), jnp.asarray(bb),
        jnp.asarray(shift_r), jnp.asarray(scale_r),
    )
    windows = np.asarray(windows)
    feats = np.asarray(feats)

    n_off = 0
    for rd, tail in zip(reads, tails):
        n = rd.n_bases
        seg = segment_signal(tail, rd.starts, int(rd.lengths[-1]))
        host_feats = assemble_features(
            rd.bases, seg.event_mean, seg.event_std, rd.lengths,
            rd.ab_mean, rd.ab_std, seg.shift, seg.scale,
        )
        w = windows[n_off : n_off + n]
        f = feats[n_off : n_off + n]
        np.testing.assert_allclose(w, seg.windows, atol=2e-5)
        # colors, durations exact; mean/std via f32 prefix sums ~1e-3 DAC
        np.testing.assert_allclose(f[:, 0], host_feats[:, 0], atol=1e-6)
        np.testing.assert_allclose(f[:, 1], host_feats[:, 1], atol=1e-4)
        np.testing.assert_allclose(f[:, 2], host_feats[:, 2], atol=5e-3)
        np.testing.assert_allclose(f[:, 3], host_feats[:, 3], atol=1e-6)
        np.testing.assert_allclose(f[:, 4], host_feats[:, 4], atol=1e-6)
        np.testing.assert_allclose(f[:, 5], host_feats[:, 5], atol=1e-6)
        n_off += n


def test_hist_median_matches_numpy(unitest_fast5_files):
    rd = get_read_data(str(unitest_fast5_files[0]))
    tail = rd.signal[rd.read_start_rel_to_raw :]
    shift_h, scale_h = mad_normalizers_int16(tail)
    x = tail.astype(np.float64)
    shift = float(np.median(x))
    scale = float(np.median(np.abs(x - shift)))
    assert shift_h == shift
    assert scale_h == scale
    # odd-length slice exercises the other rank branch
    shift_h2, scale_h2 = mad_normalizers_int16(tail[:-1] if len(tail) % 2 == 0
                                               else tail)
    y = (tail[:-1] if len(tail) % 2 == 0 else tail).astype(np.float64)
    assert shift_h2 == float(np.median(y))