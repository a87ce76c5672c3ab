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

ABI_VERSION = 1

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
