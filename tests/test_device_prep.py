"""Host prep + device elementwise finishing vs the exact host path (CPU jax)."""

import jax.numpy as jnp
import numpy as np

from nanoreviser_tpu.io import get_read_data
from nanoreviser_tpu.signal import assemble_features, segment_signal
from nanoreviser_tpu.signal.device_prep import device_preprocess_batch
from nanoreviser_tpu.signal.host_prep import prep_read
from nanoreviser_tpu.signal.segmentation import mad_normalizers_int16


def test_batch_prep_matches_host_per_read(unitest_fast5_files):
    """Two real reads prepped + concatenated into one padded buffer: every
    read's windows/features must equal the exact single-read host path."""
    reads = [get_read_data(str(p)) for p in unitest_fast5_files[:2]]
    prepped = [prep_read(rd) for rd in reads]

    n_pad = sum(p.n_bases for p in prepped) + 53
    win = np.zeros((n_pad, 50), np.int16)
    vlen = np.zeros(n_pad, np.uint8)
    feats_in = np.zeros((n_pad, 6), np.float16)
    shift_b = np.zeros(n_pad, np.float32)
    scale_b = np.ones(n_pad, np.float32)

    n_off = 0
    for p in prepped:
        n = p.n_bases
        win[n_off : n_off + n] = p.win
        vlen[n_off : n_off + n] = p.vlen
        feats_in[n_off : n_off + n] = p.feats
        shift_b[n_off : n_off + n] = p.shift
        scale_b[n_off : n_off + n] = p.scale
        n_off += n

    windows, feats = device_preprocess_batch(
        jnp.asarray(win), jnp.asarray(vlen), jnp.asarray(feats_in),
        jnp.asarray(shift_b), jnp.asarray(scale_b),
    )
    windows = np.asarray(windows)
    feats = np.asarray(feats)

    n_off = 0
    for rd in reads:
        n = rd.n_bases
        tail = rd.signal[rd.read_start_rel_to_raw :]
        seg = segment_signal(tail, rd.starts, int(rd.lengths[-1]))
        host_feats = assemble_features(
            rd.bases, seg.event_mean, seg.event_std, rd.lengths,
            rd.ab_mean, rd.ab_std, seg.shift, seg.scale,
        )
        w = windows[n_off : n_off + n]
        f = feats[n_off : n_off + n]
        np.testing.assert_allclose(w, seg.windows, atol=2e-5)
        # features round once through f16 (model input is coarser bf16);
        # f16 eps ~ 1e-3 relative
        np.testing.assert_allclose(f, host_feats, rtol=1e-3, atol=2e-3)
        n_off += n

    # pad rows: fully masked windows (vlen 0), finite values throughout
    assert np.all(windows[n_off:] == 0.0)
    assert np.all(np.isfinite(windows))


def test_prep_read_edge_windows(unitest_fast5_files):
    """First/last bases have clamped windows: vlen < 50 and the device mask
    reproduces the reference's symmetric zero pad exactly."""
    rd = get_read_data(str(unitest_fast5_files[0]))
    p = prep_read(rd)
    assert p.vlen[0] < 50          # first base clamps at the tail start
    assert np.all(p.vlen[1:-1][rd.starts[1:-1] >= 25] >= 1)
    tail = rd.signal[rd.read_start_rel_to_raw :]
    seg = segment_signal(tail, rd.starts, int(rd.lengths[-1]))
    windows, _ = device_preprocess_batch(
        jnp.asarray(p.win), jnp.asarray(p.vlen), jnp.asarray(p.feats),
        jnp.full(p.n_bases, p.shift, np.float32),
        jnp.full(p.n_bases, p.scale, np.float32),
    )
    np.testing.assert_allclose(np.asarray(windows), seg.windows, atol=2e-5)


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
