"""Native (C++) runtime components, loaded via ctypes.

The reference delegates its performance-critical non-NN work to native
binaries (GraphMap for alignment, Guppy for basecalling — SURVEY.md §2.2).
This package holds our own native equivalents, compiled from
``src/nanorev.cpp`` into ``libnanorev.so``:

* ``banded_sw_native`` — banded affine-gap glocal aligner, semantically
  identical to align/sw.py's JAX path (same band geometry, tie-breaking,
  traceback) but running on the host CPU with zero device round-trips.
  Training preprocessing uses it when available; ctypes releases the GIL for
  the call so host threads scale it across cores.

Build: ``python -m nanoreviser_tpu.native.build`` (or automatic on first
import when a compiler is present). Everything degrades gracefully to the
pure JAX/numpy paths when the library is missing: ``available()`` gates all
callers.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False
_HDF5_OK: bool | None = None

ABI_VERSION = 6

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
LIB_PATH = os.path.join(_PKG_DIR, "libnanorev.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("NANOREV_NATIVE", "1") == "0":
        return None
    if not os.path.exists(LIB_PATH):
        try:
            from .build import build

            build()
        except Exception:  # noqa: BLE001 — fall back to pure JAX/numpy
            return None
    try:
        lib = ctypes.CDLL(LIB_PATH)
        if lib.nr_abi_version() != ABI_VERSION:
            from .build import build

            build(force=True)
            lib = ctypes.CDLL(LIB_PATH)
            if lib.nr_abi_version() != ABI_VERSION:
                return None
        lib.nr_banded_sw.restype = ctypes.c_int
        lib.nr_banded_sw.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,      # q, m
            ctypes.c_void_p, ctypes.c_int64,      # t, n
            ctypes.c_int, ctypes.c_int64, ctypes.c_int64,  # band, lead, tail
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_void_p, ctypes.c_int64,      # ops_out, cap
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ]
        lib.nr_prep_read.restype = ctypes.c_int
        lib.nr_prep_read.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,      # tail, n_samples
            ctypes.c_void_p, ctypes.c_int64,      # starts, n_bases
            ctypes.c_void_p,                      # bases (ascii)
            ctypes.c_void_p,                      # durations f32
            ctypes.c_void_p, ctypes.c_void_p,     # ab_mean, ab_std f32
            ctypes.c_int,                         # qlen
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # win, vlen, feats
        ]
        lib.nr_compact_read.restype = ctypes.c_int64
        lib.nr_compact_read.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,      # tail, n_samples
            ctypes.c_void_p, ctypes.c_int64,      # starts, n_bases
            ctypes.c_void_p,                      # bases (ascii)
            ctypes.c_void_p,                      # durations f32
            ctypes.c_void_p, ctypes.c_void_p,     # ab_mean, ab_std f32
            ctypes.c_int,                         # qlen
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_void_p, ctypes.c_int64,      # csig_out, cap
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # pos0, vlen, feats
        ]
        lib.nr_encode_wire.restype = ctypes.c_int64
        lib.nr_encode_wire.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,      # csig, m
            ctypes.c_void_p, ctypes.c_void_p,     # pos0, vlen
            ctypes.c_void_p, ctypes.c_void_p,     # feats, bases
            ctypes.c_int64,                       # n
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # sig8, eidx, edel
            ctypes.c_int64,                       # esc_cap
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # posd, evf, codes
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,   # dur esc
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,   # vlen esc
            ctypes.c_void_p, ctypes.c_int64,                    # col esc
            ctypes.c_void_p,                                    # counts_out
        ]
        lib.nr_hdf5_init.restype = ctypes.c_int
        lib.nr_hdf5_init.argtypes = [ctypes.c_char_p]
        lib.nr_fast5_compact.restype = ctypes.c_int64
        lib.nr_fast5_compact.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,  # paths
            ctypes.c_int,                                       # qlen
            ctypes.c_void_p, ctypes.c_int64,                    # bases, cap
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_void_p, ctypes.c_int64,                    # csig, cap
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # pos0/vlen/feats
            ctypes.POINTER(ctypes.c_int64),                     # m_out
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def banded_sw_native(
    q_codes: np.ndarray,
    t_codes: np.ndarray,
    band: int = 512,
    t_lead: int = 0,
    t_tail: int = 0,
    match: float = 2.0,
    mismatch: float = -3.0,
    gap_open: float = -5.0,
    gap_extend: float = -2.0,
) -> tuple[np.ndarray, int, float]:
    """(ops, j_start, score) — drop-in for align.sw.align_banded's DP core."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libnanorev.so not available")
    q = np.ascontiguousarray(q_codes, np.int8)
    t = np.ascontiguousarray(t_codes, np.int8)
    ops = np.empty(len(q) + len(t) + 4, np.int8)
    j_start = ctypes.c_int64()
    score = ctypes.c_float()
    n_ops = lib.nr_banded_sw(
        q.ctypes.data, len(q), t.ctypes.data, len(t),
        band, t_lead, t_tail,
        match, mismatch, gap_open, gap_extend,
        ops.ctypes.data, len(ops),
        ctypes.byref(j_start), ctypes.byref(score),
    )
    if n_ops < 0:
        raise RuntimeError("nr_banded_sw failed")
    return ops[:n_ops].copy(), int(j_start.value), float(score.value)


def prep_read_native_arrays(
    tail: np.ndarray,
    starts: np.ndarray,
    bases: str,
    durations: np.ndarray,
    ab_mean: np.ndarray,
    ab_std: np.ndarray,
    query_len: int,
    mad: tuple | None = None,
    out: tuple | None = None,
):
    """(win i16 [N,Q], vlen u8 [N], feats f16 [N,6], shift, scale) via
    nr_prep_read — the GIL is released for the whole call.

    ``out``: optional (win, vlen, feats) C-contiguous arrays to fill in
    place (e.g. shared-memory slot views) instead of allocating.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("libnanorev.so not available")
    tail = np.ascontiguousarray(tail, np.int16)
    starts32 = np.ascontiguousarray(starts, np.int32)
    base_bytes = bases.encode("ascii")
    dur32 = np.ascontiguousarray(durations, np.float32)
    abm = np.ascontiguousarray(ab_mean, np.float32)
    abs_ = np.ascontiguousarray(ab_std, np.float32)
    n = len(starts32)
    if out is not None:
        win, vlen, feats = out
        assert win.shape == (n, query_len) and win.dtype == np.int16
        assert vlen.shape == (n,) and vlen.dtype == np.uint8
        assert feats.shape == (n, 6) and feats.dtype == np.float16
    else:
        win = np.empty((n, query_len), np.int16)
        vlen = np.empty(n, np.uint8)
        feats = np.empty((n, 6), np.float16)
    shift = ctypes.c_double(mad[0] if mad else -1e31)
    scale = ctypes.c_double(mad[1] if mad else -1e31)
    rc = lib.nr_prep_read(
        tail.ctypes.data, len(tail),
        starts32.ctypes.data, n,
        base_bytes,
        dur32.ctypes.data,
        abm.ctypes.data, abs_.ctypes.data,
        query_len,
        ctypes.byref(shift), ctypes.byref(scale),
        win.ctypes.data, vlen.ctypes.data, feats.ctypes.data,
    )
    if rc != 0:
        raise RuntimeError("nr_prep_read failed")
    return win, vlen, feats, float(shift.value), float(scale.value)


def compact_read_native_arrays(
    tail: np.ndarray,
    starts: np.ndarray,
    bases: str,
    durations: np.ndarray,
    ab_mean: np.ndarray,
    ab_std: np.ndarray,
    query_len: int,
    mad: tuple | None = None,
    out: tuple | None = None,
):
    """(csig i16 [M], pos0 i32 [N], vlen u8 [N], feats f16 [N,6], shift,
    scale) via nr_compact_read — the production compacted upload format
    (signal.host_prep.compact_read_numpy semantics, bit-exact incl. the
    single-rounded f64->f16 features). ``out``: optional (csig, pos0, vlen,
    feats) C-contiguous arrays to fill in place (csig gives the capacity;
    the returned csig is its filled prefix)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libnanorev.so not available")
    tail = np.ascontiguousarray(tail, np.int16)
    starts32 = np.ascontiguousarray(starts, np.int32)
    base_bytes = bases.encode("ascii")
    dur32 = np.ascontiguousarray(durations, np.float32)
    abm = np.ascontiguousarray(ab_mean, np.float32)
    abs_ = np.ascontiguousarray(ab_std, np.float32)
    n = len(starts32)
    if out is not None:
        csig, pos0, vlen, feats = out
        assert csig.dtype == np.int16 and csig.flags.c_contiguous
        assert len(pos0) >= n and pos0.dtype == np.int32
        assert len(vlen) >= n and vlen.dtype == np.uint8
        assert feats.shape[0] >= n and feats.dtype == np.float16
    else:
        csig = np.empty(min(n * query_len + query_len, len(tail) + query_len),
                        np.int16)
        pos0 = np.empty(n, np.int32)
        vlen = np.empty(n, np.uint8)
        feats = np.empty((n, 6), np.float16)
    shift = ctypes.c_double(mad[0] if mad else -1e31)
    scale = ctypes.c_double(mad[1] if mad else -1e31)
    m = lib.nr_compact_read(
        tail.ctypes.data, len(tail),
        starts32.ctypes.data, n,
        base_bytes,
        dur32.ctypes.data,
        abm.ctypes.data, abs_.ctypes.data,
        query_len,
        ctypes.byref(shift), ctypes.byref(scale),
        csig.ctypes.data, len(csig),
        pos0.ctypes.data, vlen.ctypes.data, feats.ctypes.data,
    )
    if m < 0:
        raise RuntimeError(f"nr_compact_read failed (rc={m})")
    return (csig[:m], pos0[:n], vlen[:n], feats[:n],
            float(shift.value), float(scale.value))


def _find_libhdf5() -> str | None:
    """Path of h5py's bundled libhdf5 (no system HDF5 headers/libs exist)."""
    try:
        import glob

        import h5py

        libs_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(h5py.__file__))),
            "h5py.libs",
        )
        hits = sorted(glob.glob(os.path.join(libs_dir, "libhdf5-*.so*")))
        return hits[0] if hits else None
    except Exception:  # noqa: BLE001 — ingest is a fast path only
        return None


def hdf5_available() -> bool:
    """True when the native fast5 ingest path is usable (lazy dlopen)."""
    global _HDF5_OK
    if _HDF5_OK is None:
        lib = _load()
        path = _find_libhdf5()
        _HDF5_OK = bool(
            lib is not None and path is not None
            and lib.nr_hdf5_init(path.encode()) == 0
        )
    return _HDF5_OK


def fast5_compact_native(
    path: str,
    basecall_group: str,
    basecall_subgroup: str,
    query_len: int = 50,
    out: tuple | None = None,
    bases_cap: int = 2 * 1024 * 1024,
):
    """Decode + compact one fast5 entirely in C++ (nr_fast5_compact): one
    ctypes call replaces h5py decode + numpy prep on the worker hot path.
    Returns (bases_str, csig, pos0, vlen, feats, shift, scale) with array
    semantics identical to signal.host_prep.compact_read_numpy(get_read_data())
    (parity asserted in tests/test_native.py). Raises RuntimeError on any
    native failure — callers fall back to the h5py path, which produces the
    reference's degradation errors for genuinely bad files."""
    lib = _load()
    if lib is None or not hdf5_available():
        raise RuntimeError("native hdf5 ingest not available")
    events = f"/Analyses/{basecall_group}/{basecall_subgroup}/Events"
    group = f"/Analyses/{basecall_group}"
    if out is not None:
        csig, pos0, vlen, feats = out
        bases_cap = len(pos0)
    else:
        csig = np.empty(bases_cap * query_len, np.int16)
        pos0 = np.empty(bases_cap, np.int32)
        vlen = np.empty(bases_cap, np.uint8)
        feats = np.empty((bases_cap, 6), np.float16)
    bases = np.empty(bases_cap, np.uint8)
    shift = ctypes.c_double(-1e31)
    scale = ctypes.c_double(-1e31)
    m_out = ctypes.c_int64(0)
    n = lib.nr_fast5_compact(
        os.fsencode(path), events.encode(), group.encode(), query_len,
        bases.ctypes.data, bases_cap,
        ctypes.byref(shift), ctypes.byref(scale),
        csig.ctypes.data, len(csig),
        pos0.ctypes.data, vlen.ctypes.data, feats.ctypes.data,
        ctypes.byref(m_out),
    )
    if n < 0:
        raise RuntimeError(f"nr_fast5_compact failed (rc={n})")
    m = int(m_out.value)
    return (
        bases[:n].tobytes().decode("ascii"),
        csig[:m], pos0[:n], vlen[:n], feats[:n],
        float(shift.value), float(scale.value),
    )


def encode_wire_native(c, out: dict, ascii_bases: np.ndarray | None = None):
    """Wire-encode a CompactRead into caller arrays (nr_encode_wire; exact
    parity with infer.wire.encode_read asserted in tests/test_native.py).

    ``out``: dict with sig8/posd/evf/codes views sized >= the read plus
    sig_esc_idx/sig_esc_delta/dur_esc_idx/dur_esc_f32/vlen_esc_idx/
    vlen_esc_val/col_esc_idx capacity arrays. Returns (ne, nd, nv, nc)
    escape counts. Raises RuntimeError on capacity overflow or invariant
    violations (caller falls back to the numpy encoder which raises the
    user-facing WireEncodeError)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    n, m = c.n_bases, c.n_samples
    if ascii_bases is None:
        ascii_bases = np.frombuffer(c.bases.encode("ascii"), np.uint8)
    counts = np.zeros(4, np.int64)
    rc = lib.nr_encode_wire(
        c.csig.ctypes.data, m,
        c.pos0.ctypes.data, c.vlen.ctypes.data,
        c.feats.ctypes.data, ascii_bases.ctypes.data, n,
        out["sig8"].ctypes.data, out["sig_esc_idx"].ctypes.data,
        out["sig_esc_delta"].ctypes.data, len(out["sig_esc_idx"]),
        out["posd"].ctypes.data, out["evf"].ctypes.data,
        out["codes"].ctypes.data,
        out["dur_esc_idx"].ctypes.data, out["dur_esc_f32"].ctypes.data,
        len(out["dur_esc_idx"]),
        out["vlen_esc_idx"].ctypes.data, out["vlen_esc_val"].ctypes.data,
        len(out["vlen_esc_idx"]),
        out["col_esc_idx"].ctypes.data, len(out["col_esc_idx"]),
        counts.ctypes.data,
    )
    if rc != 0:
        raise RuntimeError(f"nr_encode_wire failed (rc={rc})")
    return int(counts[0]), int(counts[1]), int(counts[2]), int(counts[3])
