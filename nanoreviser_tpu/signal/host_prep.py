"""Host-side per-read preparation for the compacted upload format.

Production flow: each read's raw int16 signal is COMPACTED to the union of
its per-base window intervals (gaps larger than the 50-sample window —
translocation stalls — are dropped), giving ~10 samples/base plus per-base
gather starts, valid lengths and f16 features; infer.wire then byte-packs
the result (~22 B/base total) for the upload that ops/window_gather
consumes after an XLA decode. Two properties matter:

* the tunnel-attached chip's h2d link (~26-66 MB/s measured) is the
  pipeline bottleneck — every stage of this file exists to shrink and
  cheapen that upload;
* after compaction consecutive window starts differ by <= 50 samples, so a
  128-row device block's signal span is hard-bounded — the invariant the
  on-device Pallas gather's chunk DMA depends on
  (tests/test_window_gather.py pins it).

Three implementations, all bit-exact with each other (tests/test_native.py):
nr_fast5_compact (C++: direct HDF5 decode + compaction in ONE call — the
hostpipe worker fast path), nr_compact_read (C++ from a decoded ReadData),
and compact_read_numpy (pure numpy fallback).

Behavioral contract is identical to signal.segmentation.segment_signal /
signal.features.assemble_features (reference preprocessing.py:85-170,
nanorevtrainutils.py:160-169):

* window [st-25, st+25) clamped to the signal tail, zero-padded with the
  reference's quirky symmetric split (left = ceil(pad/2)) — the zeroing
  happens on device after normalization (a raw 0 DAC value is NOT signal
  zero), via the shipped per-row valid length;
* event moments are exact int64 prefix-sum population moments over
  [st, next_st) (last base: the 3/5-rule duration), in f64;
* the 6 feature columns are [color/300, ev_mean/shift, ev_std/scale,
  duration/10, ab_mean, ab_std], rounded ONCE from f64 to f16 (all paths).

The legacy windowed prep (PreppedRead/prep_read*) remains as the host-side
reference for parity tests of the device gather semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io.fast5 import ReadData
from .features import BASE_COLOR_TABLE, _ascii_codes
from .segmentation import mad_normalizers_int16

QUERY_LEN = 50


@dataclass
class PreppedRead:
    """Everything the device batch needs from one read, host-precomputed."""

    bases: str
    win: np.ndarray        # [N, QUERY_LEN] int16 raw DAC (garbage cols masked on device)
    vlen: np.ndarray       # [N] uint8 valid window length (left pad derived)
    feats: np.ndarray      # [N, 6] float16 final per-base features
    shift: float           # per-read median (raw DAC units)
    scale: float           # per-read MAD

    @property
    def n_bases(self) -> int:
        return len(self.vlen)


_warned_native_fallback = False


def _warn_native_fallback(exc: Exception) -> None:
    """Loud (once-per-process) degradation notice: a broken libnanorev.so
    silently costing ~10x host prep contradicts the repo's loud-degradation
    policy (round-3 advisor finding)."""
    global _warned_native_fallback
    if not _warned_native_fallback:
        _warned_native_fallback = True
        import logging

        logging.getLogger("nanoreviser_tpu").warning(
            "native prep path failed (%s: %s) — falling back to the slower "
            "numpy prep for this process", type(exc).__name__, exc,
        )


def prep_read(
    rd: ReadData, query_len: int = QUERY_LEN, out: tuple | None = None
) -> PreppedRead:
    """ReadData -> PreppedRead.

    Dispatches to the native C++ path (native.prep_read_native_arrays,
    ~0.3 ms/read, GIL released) when libnanorev.so is available, else the
    vectorized numpy path (~3.4 ms/read). Both are exact; parity is
    asserted in tests/test_native.py. ``out``: optional (win, vlen, feats)
    arrays to fill in place (native path only — e.g. hostpipe shm slots).
    """
    try:
        from ..native import available, prep_read_native_arrays

        if available():
            tail = rd.signal[rd.read_start_rel_to_raw :]
            win, vlen, feats, shift, scale = prep_read_native_arrays(
                tail, rd.starts, rd.bases, rd.lengths,
                rd.ab_mean, rd.ab_std, query_len, mad=rd.mad, out=out,
            )
            return PreppedRead(
                bases=rd.bases, win=win, vlen=vlen, feats=feats,
                shift=shift, scale=scale,
            )
    except Exception as exc:  # noqa: BLE001 — numpy fallback is always correct
        _warn_native_fallback(exc)
    return prep_read_numpy(rd, query_len)


def prep_read_numpy(rd: ReadData, query_len: int = QUERY_LEN) -> PreppedRead:
    """ReadData -> PreppedRead, fully vectorized numpy (int32 index math;
    the tail is edge-padded so the window gather needs no clip)."""
    tail = rd.signal[rd.read_start_rel_to_raw :]
    if not tail.flags.c_contiguous:
        tail = np.ascontiguousarray(tail)
    if rd.mad is not None:
        shift, scale = rd.mad
    else:
        shift, scale = mad_normalizers_int16(tail)
    n_samples = len(tail)
    starts = np.asarray(rd.starts, np.int32)
    n = len(starts)

    ahead = query_len // 2
    win_st = np.maximum(starts - ahead, 0)
    win_en = np.minimum(starts + (query_len - ahead), n_samples)
    vlen = win_en - win_st
    left = (query_len - vlen + 1) // 2

    # gather positions range over [-q, n_samples + q); pad the tail by q on
    # both sides so no clip pass is needed (out-of-range cols are masked on
    # device via vlen anyway)
    padded = np.empty(n_samples + 2 * query_len, np.int16)
    padded[:query_len] = 0
    padded[query_len : query_len + n_samples] = tail
    padded[query_len + n_samples :] = 0
    cols = np.arange(query_len, dtype=np.int32)
    pos = (win_st - left + query_len)[:, None] + cols[None, :]
    win = padded[pos]

    # exact prefix-sum event moments over [st, next_st); squares fit int32
    # (|DAC| < 2^15 -> x^2 < 2^30), accumulation in int64 via cumsum dtype
    last_dur = int(rd.lengths[-1])
    ends = np.empty(n, np.int32)
    ends[:-1] = starts[1:]
    # clamp like the C++ twin (native/src/nanorev.cpp): a barely-long-enough
    # or truncated tail must not index csum out of bounds
    ends[-1] = min(starts[-1] + last_dur, n_samples)
    sig_i32 = tail.astype(np.int32)
    csum = np.empty(n_samples + 1, np.int64)
    csum[0] = 0
    np.cumsum(sig_i32, dtype=np.int64, out=csum[1:])
    csum2 = np.empty(n_samples + 1, np.int64)
    csum2[0] = 0
    np.cumsum(sig_i32 * sig_i32, dtype=np.int64, out=csum2[1:])
    cnt = np.maximum((ends - starts).astype(np.float64), 1.0)
    ssum = (csum[ends] - csum[starts]).astype(np.float64)
    ssum2 = (csum2[ends] - csum2[starts]).astype(np.float64)
    mean = ssum / cnt
    std = np.sqrt(np.maximum(ssum2 / cnt - mean * mean, 0.0))

    feats = np.empty((n, 6), np.float16)
    feats[:, 0] = BASE_COLOR_TABLE[_ascii_codes(rd.bases)] * (1.0 / 300.0)
    feats[:, 1] = mean / shift
    feats[:, 2] = std / scale
    feats[:, 3] = np.asarray(rd.lengths, np.float64) * 0.1
    feats[:, 4] = rd.ab_mean
    feats[:, 5] = rd.ab_std

    return PreppedRead(
        bases=rd.bases,
        win=np.ascontiguousarray(win, dtype=np.int16),
        vlen=vlen.astype(np.uint8),
        feats=feats,
        shift=float(shift),
        scale=float(scale),
    )


def prep_fast5(
    path: str,
    basecall_group: str = "Basecall_1D_000",
    basecall_subgroup: str = "BaseCalled_template",
) -> PreppedRead:
    """Decode + prep one fast5 (the hostpipe worker entrypoint)."""
    from ..io.fast5 import get_read_data

    return prep_read(get_read_data(path, basecall_group, basecall_subgroup))


# ---- compacted prep (the production upload format) -------------------------
# The engine no longer uploads pre-gathered 50-sample windows (100 B/base,
# 5.9x duplicated signal — ruinous on the ~60 MB/s tunnel h2d); it uploads
# the raw int16 signal COMPACTED to the union of window intervals plus
# per-base metadata, and ops.window_gather re-gathers on device. Compaction
# drops signal in gaps > the window size (translocation stalls), which both
# shrinks the upload and gives the device kernel a hard per-block span bound
# (consecutive window starts differ by <= 50 samples after compaction).


@dataclass
class CompactRead:
    """Everything the device batch needs from one read, compacted."""

    bases: str
    csig: np.ndarray       # [M] int16 compacted signal (window-interval union)
    pos0: np.ndarray       # [N] int32 window gather start in csig space
                           #     (= window start - left pad; may be -25..)
    vlen: np.ndarray       # [N] uint8 valid window length
    feats: np.ndarray      # [N, 6] float16 final per-base features
    shift: float           # per-read median (raw DAC units)
    scale: float           # per-read MAD

    @property
    def n_bases(self) -> int:
        return len(self.vlen)

    @property
    def n_samples(self) -> int:
        return len(self.csig)


def compact_read(
    rd: ReadData, query_len: int = QUERY_LEN, out: tuple | None = None
) -> CompactRead:
    """ReadData -> CompactRead. Native C++ fast path (nr_compact_read) when
    available, else vectorized numpy; exact parity asserted in
    tests/test_native.py. ``out``: optional (csig, pos0, vlen, feats) arrays
    to fill in place (hostpipe shm slots)."""
    try:
        from ..native import available, compact_read_native_arrays
    except ImportError:          # native build predates compaction — quiet
        available = None
    if available is not None:
        try:
            if available():
                tail = rd.signal[rd.read_start_rel_to_raw :]
                csig, pos0, vlen, feats, shift, scale = (
                    compact_read_native_arrays(
                        tail, rd.starts, rd.bases, rd.lengths,
                        rd.ab_mean, rd.ab_std, query_len, mad=rd.mad, out=out,
                    )
                )
                return CompactRead(
                    bases=rd.bases, csig=csig, pos0=pos0, vlen=vlen,
                    feats=feats, shift=shift, scale=scale,
                )
        except Exception as exc:  # noqa: BLE001 — numpy is always correct
            _warn_native_fallback(exc)
    return compact_read_numpy(rd, query_len)


def compact_read_numpy(rd: ReadData, query_len: int = QUERY_LEN) -> CompactRead:
    """Vectorized numpy compaction + exact f64 moments + f16 features.

    Window semantics identical to signal.segmentation.segment_signal
    (reference preprocessing.py:111-118): window [st-25, st+25) clamped to
    the tail, symmetric zero pad with left = ceil(pad/2). The compacted
    buffer concatenates the maximal merged runs of overlapping window
    intervals; every window maps to a contiguous [cst, cst+vlen) slice of it.
    """
    tail = rd.signal[rd.read_start_rel_to_raw :]
    if not tail.flags.c_contiguous:
        tail = np.ascontiguousarray(tail)
    if rd.mad is not None:
        shift, scale = rd.mad
    else:
        shift, scale = mad_normalizers_int16(tail)
    n_samples = len(tail)
    starts = np.asarray(rd.starts, np.int32)
    n = len(starts)

    ahead = query_len // 2
    win_st = np.maximum(starts - ahead, 0)
    win_en = np.minimum(starts + (query_len - ahead), n_samples)
    vlen = (win_en - win_st).astype(np.uint8)
    left = (query_len - vlen.astype(np.int32) + 1) // 2

    # maximal merged interval runs (window starts/ends are non-decreasing)
    brk = np.flatnonzero(win_st[1:] > win_en[:-1])
    first_idx = np.concatenate([[0], brk + 1])
    last_idx = np.concatenate([brk, [n - 1]])
    ist = win_st[first_idx]
    ien = win_en[last_idx]
    clen = ien - ist
    coff = np.concatenate([[0], np.cumsum(clen[:-1], dtype=np.int64)])
    m_total = int(coff[-1] + clen[-1])

    iid = np.zeros(n, np.int64)
    iid[brk + 1] = 1
    np.cumsum(iid, out=iid)
    cst = win_st.astype(np.int64) - ist[iid] + coff[iid]
    pos0 = (cst - left).astype(np.int32)

    csig = np.empty(m_total, np.int16)
    for k in range(len(first_idx)):
        o = coff[k]
        csig[o : o + clen[k]] = tail[ist[k] : ien[k]]

    # exact prefix-sum event moments (same math as prep_read_numpy)
    last_dur = int(rd.lengths[-1])
    ends = np.empty(n, np.int32)
    ends[:-1] = starts[1:]
    ends[-1] = min(starts[-1] + last_dur, n_samples)
    sig_i32 = tail.astype(np.int32)
    csum = np.empty(n_samples + 1, np.int64)
    csum[0] = 0
    np.cumsum(sig_i32, dtype=np.int64, out=csum[1:])
    csum2 = np.empty(n_samples + 1, np.int64)
    csum2[0] = 0
    np.cumsum(sig_i32 * sig_i32, dtype=np.int64, out=csum2[1:])
    cnt = np.maximum((ends - starts).astype(np.float64), 1.0)
    ssum = (csum[ends] - csum[starts]).astype(np.float64)
    ssum2 = (csum2[ends] - csum2[starts]).astype(np.float64)
    mean = ssum / cnt
    std = np.sqrt(np.maximum(ssum2 / cnt - mean * mean, 0.0))

    feats = np.empty((n, 6), np.float16)
    feats[:, 0] = BASE_COLOR_TABLE[_ascii_codes(rd.bases)] * (1.0 / 300.0)
    feats[:, 1] = mean / shift
    feats[:, 2] = std / scale
    feats[:, 3] = np.asarray(rd.lengths, np.float64) * 0.1
    feats[:, 4] = rd.ab_mean
    feats[:, 5] = rd.ab_std

    return CompactRead(
        bases=rd.bases, csig=csig, pos0=pos0, vlen=vlen, feats=feats,
        shift=float(shift), scale=float(scale),
    )


def compact_fast5(
    path: str,
    basecall_group: str = "Basecall_1D_000",
    basecall_subgroup: str = "BaseCalled_template",
    out: tuple | None = None,
) -> CompactRead:
    """Decode + compact one fast5 (the hostpipe worker entrypoint).

    Fast path: ONE native call (nr_fast5_compact — direct HDF5 decode +
    compaction in C++, ~3.3 ms/read vs ~5 ms via h5py + numpy). Any native
    failure falls back to the h5py path, which raises the reference's
    Fast5Error degradation messages for genuinely bad files."""
    try:
        from ..native import fast5_compact_native, hdf5_available
    except ImportError:
        hdf5_available = None
    if hdf5_available is not None and hdf5_available():
        try:
            bases, csig, pos0, vlen, feats, shift, scale = (
                fast5_compact_native(
                    path, basecall_group, basecall_subgroup, out=out)
            )
            return CompactRead(
                bases=bases, csig=csig, pos0=pos0, vlen=vlen, feats=feats,
                shift=shift, scale=scale,
            )
        except Exception:  # noqa: BLE001 — h5py path raises proper errors
            pass
    from ..io.fast5 import get_read_data

    return compact_read(
        get_read_data(path, basecall_group, basecall_subgroup), out=out
    )


# ---- multiprocessing worker entrypoints (infer.hostpipe) -------------------
# These live HERE, not in infer.hostpipe, so that spawn workers unpickling
# them import only numpy/h5py modules — never jax (whose TPU client must not
# be initialized in a second process). infer.wire is numpy-only at import.

_WORKER_GROUP = "Basecall_1D_000"
_WORKER_SUBGROUP = "BaseCalled_template"
_WORKER_SLOTS: dict = {}
_WORKER_SCRATCH: dict = {}


def _pool_init(group: str, subgroup: str) -> None:
    global _WORKER_GROUP, _WORKER_SUBGROUP
    _WORKER_GROUP = group
    _WORKER_SUBGROUP = subgroup


def _compact_scratch(cap_bases: int, cap_samples: int) -> tuple:
    """Per-process reusable compact-stage output arrays: without these the
    native one-call ingest would allocate its (huge) default-capacity
    buffers for every read."""
    key = (cap_bases, cap_samples)
    s = _WORKER_SCRATCH.get(key)
    if s is None:
        s = (
            np.empty(cap_samples, np.int16),       # csig
            np.empty(cap_bases, np.int32),         # pos0
            np.empty(cap_bases, np.uint8),         # vlen
            np.empty((cap_bases, 6), np.float16),  # feats
        )
        _WORKER_SCRATCH[key] = s
    return s


def _compact_bounded(path: str, cap_bases: int, cap_samples: int):
    """compact_fast5 into reused scratch; falls back to unbounded buffers
    ONLY for reads beyond the scratch capacity (then pickle-transported).
    Genuine decode failures propagate — retrying a corrupt fast5 with
    huge buffers would double every failure's latency for nothing."""
    scratch = _compact_scratch(cap_bases, cap_samples)
    try:
        return compact_fast5(
            path, _WORKER_GROUP, _WORKER_SUBGROUP,
            out=(scratch[0], scratch[1], scratch[2], scratch[3]))
    except (ValueError, IndexError):
        # numpy path outgrew the provided views
        return compact_fast5(path, _WORKER_GROUP, _WORKER_SUBGROUP)
    except RuntimeError as exc:
        if "rc=-2" in str(exc):        # native capacity-exceeded code
            return compact_fast5(path, _WORKER_GROUP, _WORKER_SUBGROUP)
        raise


def _pool_prep_one(path: str, cap_bases: int = 425984,
                   cap_samples: int = 8 * 1024 * 1024):
    """Inline (n_workers=0) path: decode + compact + wire-encode."""
    from ..infer.wire import encode_read

    try:
        c = _compact_bounded(path, cap_bases, cap_samples)
        return encode_read(c), None
    except Exception as exc:  # noqa: BLE001 — per-read degradation
        return None, str(exc)


def slot_layout(cap_bases: int, cap_samples: int | None = None) -> dict:
    """Byte offsets of one /dev/shm prep slot (see infer.hostpipe).

    v2 layout carries the WIRE-encoded read (infer.wire): u8 signal delta
    stream | u8 pos deltas | f16 evf[.,4] | u8 codes | signal/dur/vlen/col
    escape arrays. ``cap_samples`` defaults to the worst legal compaction
    (50/base)."""
    if cap_samples is None:
        cap_samples = QUERY_LEN * cap_bases
    esc_cap = cap_samples // 64          # 1.56% of samples (avg 0.86%)
    dur_cap = cap_bases // 16
    vl_cap = 4096
    col_cap = 4096
    off = {}
    pos = 0
    for name, nbytes in (
        ("sig8", cap_samples),
        ("posd", cap_bases),
        ("evf", 2 * 4 * cap_bases),
        ("codes", cap_bases),
        ("sig_esc_idx", 4 * esc_cap),
        ("sig_esc_delta", 4 * esc_cap),
        ("dur_esc_idx", 4 * dur_cap),
        ("dur_esc_f32", 4 * dur_cap),
        ("vlen_esc_idx", 4 * vl_cap),
        ("vlen_esc_val", 4 * vl_cap),
        ("col_esc_idx", 4 * col_cap),
    ):
        off[name] = pos
        pos += nbytes
    off["total"] = pos
    off["cap_samples"] = cap_samples
    off["esc_cap"] = esc_cap
    off["dur_cap"] = dur_cap
    off["vl_cap"] = vl_cap
    off["col_cap"] = col_cap
    return off


def _worker_slot(slot_path: str):
    m = _WORKER_SLOTS.get(slot_path)
    if m is None:
        m = np.memmap(slot_path, dtype=np.uint8, mode="r+")
        _WORKER_SLOTS[slot_path] = m
    return m


def _slot_views(buf, layout, n_bases: int, m_samples: int, counts=None):
    """Numpy views of one slot's wire arrays. ``counts``: (ne, nd, nv, nc)
    escape-entry counts (full capacity when None, for the writer side)."""
    ne, nd, nv, nc = counts or (
        layout["esc_cap"], layout["dur_cap"], layout["vl_cap"],
        layout["col_cap"])
    return {
        "sig8": np.frombuffer(buf, np.uint8, m_samples, layout["sig8"]),
        "posd": np.frombuffer(buf, np.uint8, n_bases, layout["posd"]),
        "evf": np.frombuffer(
            buf, np.float16, n_bases * 4, layout["evf"]).reshape(n_bases, 4),
        "codes": np.frombuffer(buf, np.uint8, n_bases, layout["codes"]),
        "sig_esc_idx": np.frombuffer(buf, np.int32, ne, layout["sig_esc_idx"]),
        "sig_esc_delta": np.frombuffer(
            buf, np.int32, ne, layout["sig_esc_delta"]),
        "dur_esc_idx": np.frombuffer(buf, np.int32, nd, layout["dur_esc_idx"]),
        "dur_esc_f32": np.frombuffer(
            buf, np.float32, nd, layout["dur_esc_f32"]),
        "vlen_esc_idx": np.frombuffer(
            buf, np.int32, nv, layout["vlen_esc_idx"]),
        "vlen_esc_val": np.frombuffer(
            buf, np.int32, nv, layout["vlen_esc_val"]),
        "col_esc_idx": np.frombuffer(buf, np.int32, nc, layout["col_esc_idx"]),
    }


def _pool_prep_chunk(paths: list, slot_paths: list, cap_bases: int,
                     cap_samples: int):
    """Decode + compact + wire-encode a CHUNK of fast5s (one IPC round trip
    amortizes the Pool's per-task pickle/dispatch overhead over several
    reads)."""
    return [
        _pool_prep_to_slot(p, s, cap_bases, cap_samples)
        for p, s in zip(paths, slot_paths)
    ]


def _pool_prep_to_slot(path: str, slot_path: str | None, cap_bases: int,
                       cap_samples: int):
    """Decode + compact + wire-encode one fast5, writing the arrays into a
    shared-memory slot. Returns ((n, m, shift, scale, bases, first_val,
    last_val, pos0_first, pos0_last, ne, nd, nv, nc), None) on the slot path,
    (WireRead, None) when no slot is available or the read exceeds a slot
    capacity (pickle-transport fallback), or (None, error_str)."""
    from ..infer.wire import encode_read

    try:
        c = _compact_bounded(path, cap_bases, cap_samples)
        n, m = c.n_bases, c.n_samples
        if slot_path is None or n > cap_bases or m > cap_samples:
            return encode_read(c), None    # pickle-transport fallback
        # the native encoder skips the python-side chain-bounds check —
        # enforce it here so a malformed read degrades itself (the numpy
        # fallback re-checks inside encode_read)
        from ..infer.wire import validate_chain_bounds

        validate_chain_bounds(int(c.pos0[0]), int(c.pos0[n - 1]), m)
        layout = slot_layout(cap_bases, cap_samples)
        buf = _worker_slot(slot_path)
        v = _slot_views(buf, layout, n, m)
        try:
            from ..native import available, encode_wire_native

            if not available():
                raise RuntimeError("native unavailable")
            ne, nd, nv, nc = encode_wire_native(c, v)
        except Exception:  # noqa: BLE001 — numpy encoder is always correct
            w = encode_read(
                c, out=(v["sig8"], v["posd"], v["evf"], v["codes"]))
            ne, nd = len(w.sig_esc_idx), len(w.dur_esc_idx)
            nv, nc = len(w.vlen_esc_idx), len(w.col_esc_idx)
            if (ne > layout["esc_cap"] or nd > layout["dur_cap"]
                    or nv > layout["vl_cap"] or nc > layout["col_cap"]):
                return w, None             # pickle-transport fallback
            v["sig_esc_idx"][:ne] = w.sig_esc_idx
            v["sig_esc_delta"][:ne] = w.sig_esc_delta
            v["dur_esc_idx"][:nd] = w.dur_esc_idx
            v["dur_esc_f32"][:nd] = w.dur_esc_f32
            v["vlen_esc_idx"][:nv] = w.vlen_esc_idx
            v["vlen_esc_val"][:nv] = w.vlen_esc_val
            v["col_esc_idx"][:nc] = w.col_esc_idx
        return (n, m, c.shift, c.scale, c.bases, int(c.csig[0]),
                int(c.csig[m - 1]), int(c.pos0[0]), int(c.pos0[n - 1]),
                ne, nd, nv, nc), None
    except Exception as exc:  # noqa: BLE001 — per-read degradation
        return None, str(exc)
