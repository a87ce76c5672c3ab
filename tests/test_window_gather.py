"""ops.window_gather: host packing, XLA-fallback parity vs the host
reference, compaction edge cases, and the batch-level degradation net.

The Pallas path itself is chip-only (bit-exactness vs these same references
is asserted on hardware by benchmarks/probe_pallas_gather.py and pinned by
unitest/goldens via bench.py); this file keeps the shared packing math and
the CPU-visible halves honest."""

import numpy as np
import pytest

from nanoreviser_tpu.ops.window_gather import (
    BLK,
    CHUNK,
    Q,
    pack_block_meta,
    pack_read_tables,
    window_gather_xla_f32,
)
from nanoreviser_tpu.signal.host_prep import compact_read_numpy


def _pack(sig, pos0, shift, scale, vlen, read_id, s_cap):
    csr, rr, meta = pack_block_meta(pos0, vlen, read_id, s_cap)
    tabs = pack_read_tables(shift, scale)
    return sig[::-1].copy(), csr, rr, meta, tabs


def test_xla_gather_matches_reference_math():
    rng = np.random.default_rng(0)
    n_rows = 4 * BLK
    s_cap = 1024 * 32
    sig = rng.integers(-1500, 1500, s_cap, dtype=np.int16)
    gaps = rng.integers(1, 46, n_rows)
    pos0 = (64 + np.cumsum(gaps)).astype(np.int32)
    vlen = rng.integers(1, Q + 1, n_rows).astype(np.uint8)
    read_id = (np.arange(n_rows) // (n_rows // 3)).clip(0, 2).astype(np.uint8)
    shifts = np.array([455.1234, 462.875, 440.0317], np.float32)
    scales = np.array([31.25, 29.111, 33.0333], np.float32)

    sigr, csr, rr, meta, tabs = _pack(
        sig, pos0, shifts, scales, vlen, read_id, s_cap)
    import jax.numpy as jnp

    got = np.asarray(window_gather_xla_f32(
        jnp.asarray(sigr), jnp.asarray(csr), jnp.asarray(rr),
        jnp.asarray(np.array([n_rows // BLK], np.int32)),
        jnp.asarray(meta), jnp.asarray(tabs), n_rows=n_rows))

    # independent reference: padded host gather + f32 normalize + pad mask
    shift_r = shifts[read_id].astype(np.float32)
    scale_r = scales[read_id].astype(np.float32)
    idx = np.clip(pos0[:, None] + np.arange(Q)[None, :], 0, s_cap - 1)
    w = sig[idx].astype(np.float32)
    norm = (w - shift_r[:, None]) / scale_r[:, None]
    left = (Q - vlen.astype(np.int32) + 1) // 2
    cols = np.arange(Q)[None, :]
    valid = (cols >= left[:, None]) & (cols < (left + vlen)[:, None])
    want = np.where(valid, norm, 0.0).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_read_tables_reconstruct_f32_exactly():
    rng = np.random.default_rng(1)
    shifts = rng.uniform(100, 900, 144).astype(np.float32)
    scales = rng.uniform(5, 80, 144).astype(np.float32)
    tabs = pack_read_tables(shifts, scales)
    t32 = tabs.astype(np.float32)
    np.testing.assert_array_equal(t32[0] + t32[1] + t32[2],
                                  np.pad(shifts, (0, 256 - 144)))
    got_scale = (t32[3] + t32[4] + t32[5])[:144]
    np.testing.assert_array_equal(got_scale, scales)
    # unused lanes must normalize safely (shift 0 / scale 1)
    assert (t32[3] + t32[4] + t32[5])[144:].min() == 1.0


def test_pack_block_meta_rejects_pathological_span():
    n_rows = BLK
    pos0 = np.zeros(n_rows, np.int32)
    pos0[-1] = CHUNK  # span exceeds the one-hot budget
    vlen = np.full(n_rows, Q, np.uint8)
    rid = np.zeros(n_rows, np.uint8)
    with pytest.raises(ValueError, match="span"):
        pack_block_meta(pos0, vlen, rid, 1024 * 64)


def test_compaction_bounds_block_span(unitest_fast5_files):
    """After compaction, consecutive gather starts differ by <= Q + 25 and
    any 128-row window's span stays far inside the kernel's CHUNK budget —
    the invariant the on-device gather depends on."""
    from nanoreviser_tpu.io import get_read_data

    for p in unitest_fast5_files[:3]:
        c = compact_read_numpy(get_read_data(str(p)))
        d = np.diff(c.pos0.astype(np.int64))
        assert d.max() <= Q + 25
        n = len(c.pos0)
        if n > BLK:
            span = (c.pos0[BLK:].astype(np.int64)
                    - c.pos0[:-BLK].astype(np.int64)).max()
            assert span <= BLK * Q + Q
        # window contents come from a contiguous region of csig
        assert c.pos0.min() >= -(Q // 2)
        assert int(c.pos0.max()) + Q <= c.n_samples + Q // 2 + 1


def test_engine_degrades_loudly_on_bad_span(ecoli_model_paths):
    """A CompactRead violating the span budget must degrade (errors
    recorded, original bases returned), not crash or silently corrupt."""
    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.signal.host_prep import CompactRead

    m1, m2 = ecoli_model_paths
    eng = StreamingReviser(str(m1), str(m2), batch_windows=1024)
    n = 600
    bad = CompactRead(
        bases="A" * n,
        csig=np.zeros(32, np.int16),
        pos0=(np.arange(n, dtype=np.int32) * 200),  # gap 200 >> Q: invalid
        vlen=np.full(n, Q, np.uint8),
        feats=np.zeros((n, 6), np.float16),
        shift=450.0, scale=30.0,
    )
    errors: list = []
    out = list(eng.revise_stream([("bad", bad)], errors=errors))
    assert len(out) == 1
    assert out[0][2] == bad.bases          # degraded to original
    assert errors and "span" in str(errors[0][1])


def test_calibrate_center_offset():
    from nanoreviser_tpu.infer.merge import calibrate_center_offset

    rng = np.random.default_rng(2)
    bases = "".join(rng.choice(list("ACGT"), 2000))
    # construct labels that encode base i+5 with 5% noise
    label_of = {"D": 0, "-": 1, "C": 2, "T": 3, "G": 4, "A": 5}
    y1 = np.array([label_of[b] for b in bases[5:]], np.int32)
    noise = rng.random(len(y1)) < 0.05
    y1[noise] = rng.integers(2, 6, noise.sum())
    off, agree = calibrate_center_offset(bases, y1, window=13)
    assert off == 5 and agree > 0.9
    # degenerate labels fall back to the default center
    y_bad = np.full(1000, 2, np.int32)
    off, agree = calibrate_center_offset(bases, y_bad, window=13)
    assert off == 6 and agree < 0.5
