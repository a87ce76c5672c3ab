"""Wire format v2 (infer.wire): encode/decode exactness.

The upload encoding must be bit-exact: every array reconstructed on device
(signal, pos0, vlen, features) must equal the CompactRead it encodes.
Engine-level parity with the host oracle is covered by test_streaming; these
tests pin the encoding itself, including every escape path, against real
reads and synthetic pathological ones.
"""

import dataclasses
import os

import numpy as np
import pytest

from nanoreviser_tpu.infer.wire import (
    COLOR_TABLE_F16,
    DUR_TABLE_F16,
    ESC,
    WireEncodeError,
    encode_read,
    pack_codes2,
)
from nanoreviser_tpu.io import get_read_data
from nanoreviser_tpu.signal.host_prep import CompactRead, compact_read_numpy


def _np_decode(w, prev_last=0, g=0, pos_prev=0):
    """Numpy reference decode of one WireRead (mirrors infer.wire.decode_wire
    + the batch-assembly chaining, independent implementation). ``prev_last``:
    previous read's last signal value; ``g``: this read's signal offset in the
    batch; ``pos_prev``: absolute pos0 of the previous row."""
    z = w.sig8.astype(np.int32)
    d = (z >> 1) ^ -(z & 1)
    d[z == ESC] = 0
    d[w.sig_esc_idx] = w.sig_esc_delta.astype(np.int32)
    d[0] = w.first_val - prev_last
    csig = (np.cumsum(d) + prev_last).astype(np.int16)

    pd = w.posd.astype(np.int64).copy()
    pd[0] = (g + w.pos0_first) - pos_prev
    pos0 = np.cumsum(pd) + pos_prev - g

    vlen = np.full(w.n_bases, 50, np.int64)
    vlen[w.vlen_esc_idx] = w.vlen_esc_val

    color = COLOR_TABLE_F16[w.codes].astype(np.float32)
    color[w.col_esc_idx] = 0.0
    dnext = np.clip(np.diff(np.concatenate([pos0, pos0[-1:]])), 0, 255)
    dur = DUR_TABLE_F16[dnext].astype(np.float32)
    dur[w.dur_esc_idx] = w.dur_esc_f32
    feats = np.stack(
        [color, w.evf[:, 0].astype(np.float32), w.evf[:, 1].astype(np.float32),
         dur, w.evf[:, 2].astype(np.float32), w.evf[:, 3].astype(np.float32)],
        axis=1)
    return csig, pos0, vlen, feats


def _assert_roundtrip(c: CompactRead):
    w = encode_read(c)
    csig, pos0, vlen, feats = _np_decode(w)
    np.testing.assert_array_equal(csig, c.csig)
    np.testing.assert_array_equal(pos0, c.pos0.astype(np.int64))
    np.testing.assert_array_equal(vlen, c.vlen.astype(np.int64))
    np.testing.assert_array_equal(feats, c.feats.astype(np.float32))
    return w


def test_roundtrip_real_reads(unitest_fast5_files):
    for p in unitest_fast5_files[:3]:
        c = compact_read_numpy(get_read_data(str(p)))
        w = _assert_roundtrip(c)
        # the measured escape economics hold: escapes are rare
        assert len(w.sig_esc_idx) < 0.05 * c.n_samples
        assert len(w.dur_esc_idx) < 0.1 * c.n_bases


def test_roundtrip_chained_reads(unitest_fast5_files):
    """Two reads chained through prev_last/pos_base decode exactly (the
    batch-assembly contract)."""
    c1 = compact_read_numpy(get_read_data(str(unitest_fast5_files[0])))
    c2 = compact_read_numpy(get_read_data(str(unitest_fast5_files[1])))
    w1, w2 = encode_read(c1), encode_read(c2)
    csig1, pos1, _, _ = _np_decode(w1)
    # chain read 2 after read 1: decode with read 1's tail as the base;
    # _np_decode returns read-local pos0 (it subtracts g back out)
    csig2, pos2, _, _ = _np_decode(
        w2, prev_last=w1.last_val, g=len(c1.csig), pos_prev=int(pos1[-1]))
    np.testing.assert_array_equal(csig2, c2.csig)
    np.testing.assert_array_equal(pos2, c2.pos0.astype(np.int64))


def _synthetic_compact(csig, pos0, vlen=None, bases=None):
    n = len(pos0)
    # normalize to the chain-bounds contract: the compacted signal ends
    # exactly 50 samples after the last window start (validate_chain_bounds)
    m = int(pos0[-1]) + 50
    csig = np.asarray(csig, np.int16)
    if len(csig) < m:
        csig = np.concatenate([csig, np.zeros(m - len(csig), np.int16)])
    csig = csig[:m]
    feats = np.zeros((n, 6), np.float16)
    feats[:, 3] = DUR_TABLE_F16[
        np.clip(np.concatenate([np.diff(pos0), [7]]), 0, 255)]
    if bases is None:
        bases = "A" * n
    bcodes = np.frombuffer(bases.encode(), np.uint8)
    tab = np.zeros(256, np.float64)
    for ch, v in zip(b"AGTC", (250.0, 180.0, 100.0, 30.0)):
        tab[ch] = v
    feats[:, 0] = tab[bcodes] * (1.0 / 300.0)
    return CompactRead(
        bases=bases, csig=np.asarray(csig, np.int16),
        pos0=np.asarray(pos0, np.int32),
        vlen=np.full(n, 50, np.uint8) if vlen is None else vlen,
        feats=feats, shift=450.0, scale=30.0,
    )


def test_escape_heavy_signal():
    """Large sample jumps (beyond the 8-bit zig-zag range) ride escapes."""
    rng = np.random.default_rng(0)
    sig = np.cumsum(rng.integers(-500, 500, 4000)).clip(-30000, 30000)
    pos0 = np.arange(0, 80 * 49, 49, dtype=np.int32)[:78]
    c = _synthetic_compact(sig, pos0)
    w = _assert_roundtrip(c)
    assert len(w.sig_esc_idx) > 100      # escapes genuinely exercised


def test_non_acgt_bases_and_vlen_edges():
    sig = np.arange(300, dtype=np.int16)
    pos0 = np.array([-20, 10, 40, 70, 100], np.int32)
    vlen = np.array([30, 50, 50, 49, 20], np.uint8)
    c = _synthetic_compact(sig, pos0, vlen=vlen, bases="ANGTC")
    w = _assert_roundtrip(c)
    assert list(w.col_esc_idx) == [1]
    assert set(w.vlen_esc_idx) == {0, 3, 4}


def test_duration_mismatch_escapes():
    """Rows where the true duration differs from the pos0 delta (stall
    boundaries in the reference pipeline) must be escaped."""
    sig = np.arange(500, dtype=np.int16)
    pos0 = np.array([0, 10, 20, 30, 40], np.int32)
    c = _synthetic_compact(sig, pos0)
    c.feats[:, 3] = np.float16(np.float64([10, 10, 999, 10, 3]) * 0.1)
    w = encode_read(c)
    _, _, _, feats = _np_decode(w)
    np.testing.assert_array_equal(feats[:, 3], c.feats[:, 3].astype(np.float32))
    assert 2 in w.dur_esc_idx            # the 999-sample stall row
    assert (len(w.posd) - 1) in w.dur_esc_idx   # last row always escaped


def test_pathological_pos_delta_rejected():
    sig = np.zeros(10000, np.int16)
    pos0 = np.arange(5, dtype=np.int32) * 200     # gap 200 >> 50
    with pytest.raises(WireEncodeError, match="span"):
        encode_read(_synthetic_compact(sig, pos0))


def test_pack_codes2():
    codes = np.array([0, 1, 2, 3, 3, 2, 1, 0], np.uint8)
    packed = pack_codes2(codes)
    got = np.stack([(packed >> s) & 3 for s in (0, 2, 4, 6)], 1).reshape(-1)
    np.testing.assert_array_equal(got, codes)


def test_tables_match_host_rounding():
    """The device tables must equal the host feature pipeline's f64 -> f16
    single rounding exactly (signal/host_prep feats columns 0 and 3)."""
    for d in (0, 1, 3, 5, 7, 50, 123, 255):
        assert DUR_TABLE_F16[d] == np.float16(np.float64(d) * 0.1)
    from nanoreviser_tpu.signal.features import BASE_COLOR_TABLE, _ascii_codes

    for k, b in enumerate("AGTC"):
        host = np.float16(
            BASE_COLOR_TABLE[_ascii_codes(b)][0] * (1.0 / 300.0))
        assert COLOR_TABLE_F16[k] == host


def test_chain_bounds_reject_trailing_signal():
    """A read whose signal extends past its last window would impose an
    unbounded boundary delta on whatever read is packed after it — it must
    degrade ITSELF at encode time (round-5 review: the old guard fired on
    the NEXT read and poisoned the rest of the stream)."""
    n = 40
    pos0 = np.arange(n, dtype=np.int32) * 9
    c = _synthetic_compact(np.zeros(10, np.int16), pos0)
    # manufacture 300 samples of trailing signal past the last window
    c = CompactRead(
        bases=c.bases, csig=np.concatenate(
            [c.csig, np.zeros(300, np.int16)]),
        pos0=c.pos0, vlen=c.vlen, feats=c.feats,
        shift=c.shift, scale=c.scale,
    )
    with pytest.raises(WireEncodeError, match="slack"):
        encode_read(c)
