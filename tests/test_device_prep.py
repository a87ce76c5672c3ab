"""Device preprocessing vs the exact host path (CPU jax)."""

import numpy as np
import jax.numpy as jnp

from nanoreviser_tpu.io import get_read_data
from nanoreviser_tpu.signal import segment_signal, assemble_features, base_colors
from nanoreviser_tpu.signal.device_prep import device_preprocess


def test_device_prep_matches_host(unitest_fast5_files):
    rd = get_read_data(str(unitest_fast5_files[0]))
    tail = rd.signal[rd.read_start_rel_to_raw :]
    seg = segment_signal(tail, rd.starts, int(rd.lengths[-1]))
    host_feats = assemble_features(
        rd.bases, seg.event_mean, seg.event_std, rd.lengths,
        rd.ab_mean, rd.ab_std, seg.shift, seg.scale,
    )

    s_pad = 1 << int(np.ceil(np.log2(len(tail))))
    n_pad = rd.n_bases + 37
    sig_p = np.zeros(s_pad, np.int16)
    sig_p[: len(tail)] = tail
    st_p = np.full(n_pad, rd.starts[-1], np.int32)
    st_p[: rd.n_bases] = rd.starts
    abm = np.zeros(n_pad, np.float32)
    abm[: rd.n_bases] = rd.ab_mean
    abs_ = np.zeros(n_pad, np.float32)
    abs_[: rd.n_bases] = rd.ab_std
    col = np.zeros(n_pad, np.float32)
    col[: rd.n_bases] = base_colors(rd.bases)

    windows, feats = device_preprocess(
        jnp.asarray(sig_p), jnp.asarray(st_p), jnp.asarray(abm),
        jnp.asarray(abs_), jnp.asarray(col),
        jnp.int32(len(tail)), jnp.int32(rd.n_bases),
    )
    windows = np.asarray(windows)[: rd.n_bases]
    feats = np.asarray(feats)[: rd.n_bases]

    np.testing.assert_allclose(windows, seg.windows, atol=2e-5)
    # colors, durations exact; mean/std via f32 prefix sums ~1e-3 DAC units
    np.testing.assert_allclose(feats[:, 0], host_feats[:, 0], atol=1e-6)
    np.testing.assert_allclose(feats[:, 1], host_feats[:, 1], atol=1e-4)
    np.testing.assert_allclose(feats[:, 2], host_feats[:, 2], atol=5e-3)
    np.testing.assert_allclose(feats[:, 3], host_feats[:, 3], atol=1e-6)
    np.testing.assert_allclose(feats[:, 4], host_feats[:, 4], atol=1e-6)
    np.testing.assert_allclose(feats[:, 5], host_feats[:, 5], atol=1e-6)
