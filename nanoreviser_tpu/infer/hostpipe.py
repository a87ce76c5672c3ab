"""Host ingestion pipeline: fast5 decode + per-read compaction on workers.

The 2-core host is the pipeline's second bottleneck after the tunnel: fast5
decode is ~4 ms/read of h5py/HDF5 work that does NOT release the GIL, so
host threads cannot scale it — worker *processes* can. Each worker runs
signal.host_prep.compact_fast5 (decode -> window-interval compaction ->
exact moments -> f16 features) plus infer.wire.encode_read (zig-zag signal
deltas, pos deltas, escape lists); the big wire arrays (~20 B/base) travel
back through a ring of /dev/shm slots as zero-copy numpy views — pickling
them through the Pool's result pipe cost a measured ~1.5 ms/read of
main-process unpickle, more than the prep itself. Only the small fields
(bases string, normalizers, chain values, escape counts) ride the result
pickle.

Slot lifetime contract: stream() yields a WireRead whose arrays VIEW the
slot; the view is valid until the caller requests the NEXT item (the engine
packs the arrays into its batch buffer immediately, so this is free). The
slot is recycled on resumption.

Workers use the "spawn" start method: the parent holds a live TPU client
whose runtime threads and locks do not survive fork. Spawn costs ~1-2 s per
worker once at startup, amortized over the stream; the worker entrypoints
live in signal.host_prep so unpickling them never imports jax. Slots are
plain mmap'd files under /dev/shm (no multiprocessing.SharedMemory — its
per-process resource tracker unlinks segments on worker exit). Slot paths
carry a per-instance token so two PrepPools in one process cannot alias.

Submission is bounded (``prefetch``): a plain Pool.imap would buffer every
result in an unbounded queue whenever the consumer is slower.

Contract: results yield in input order as (name, compact_or_None,
error_or_None) — per-read failures carry the exception message so the
caller can apply the reference's degradation contract
(NanoReviser.py:146-154).
"""

from __future__ import annotations

import collections
import itertools
import multiprocessing as mp
import os

import numpy as np

from ..infer.wire import WireRead
from ..signal.host_prep import (
    _pool_init,
    _pool_prep_chunk,
    _pool_prep_one,
    _slot_views,
    slot_layout,
)

DEFAULT_SLOT_BASES = 425984          # > the engine's default n_rows budget;
DEFAULT_SLOT_SAMPLES = 8 * 1024 * 1024   # bigger reads fall back to pickle
_instance_counter = itertools.count()


def _gc_stale_slots() -> None:
    """Unlink /dev/shm slots left by processes that died before close()
    (SIGKILL, OOM, test timeouts) — slot names embed the creating PID, so
    any slot whose process is gone is garbage. Keeps long-lived hosts from
    accumulating dead 14 MB files."""
    import glob

    for path in glob.glob("/dev/shm/nanorev_prep_*"):
        try:
            pid = int(os.path.basename(path).split("_")[2])
        except (IndexError, ValueError):
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            try:
                os.unlink(path)
            except OSError:
                pass
        except PermissionError:
            pass                       # someone else's live process


class PrepPool:
    """Ordered, bounded fan-out of compact_fast5 over worker processes.

    n_workers=0 preps inline on the calling thread (tests, chipless CI).
    """

    def __init__(
        self,
        n_workers: int | None = None,
        basecall_group: str = "Basecall_1D_000",
        basecall_subgroup: str = "BaseCalled_template",
        slot_bases: int = DEFAULT_SLOT_BASES,
        slot_samples: int = DEFAULT_SLOT_SAMPLES,
        n_slots: int = 16,
        chunk: int = 2,
    ):
        if n_workers is None:
            n_workers = max(1, os.cpu_count() or 1)
        self.n_workers = n_workers
        self.group = basecall_group
        self.subgroup = basecall_subgroup
        self.slot_bases = slot_bases
        self.slot_samples = slot_samples
        self.chunk = chunk
        self._pool = None
        self._slot_paths: list[str] = []
        self._slot_maps: list[np.ndarray] = []
        if n_workers > 0:
            _gc_stale_slots()
            layout = slot_layout(slot_bases, slot_samples)
            token = next(_instance_counter)
            for i in range(n_slots):
                path = f"/dev/shm/nanorev_prep_{os.getpid()}_{token}_{i}"
                with open(path, "wb") as fp:
                    fp.truncate(layout["total"])
                self._slot_paths.append(path)
                self._slot_maps.append(
                    np.memmap(path, dtype=np.uint8, mode="r+")
                )
            # single-thread worker BLAS/OMP pools: must be set in the PARENT
            # before spawn — workers import numpy while unpickling the
            # initializer, after which the env is already read
            env_keys = ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                        "MKL_NUM_THREADS")
            saved = {k: os.environ.get(k) for k in env_keys}
            for k in env_keys:
                os.environ[k] = "1"
            try:
                ctx = mp.get_context("spawn")
                self._pool = ctx.Pool(
                    n_workers, initializer=_pool_init,
                    initargs=(basecall_group, basecall_subgroup),
                )
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v

    def stream(self, base_dir: str, fns, prefetch: int = 24):
        """Yields (fn, wire_read_or_None, error_str_or_None) in input order.

        The yielded WireRead's arrays may view a shared-memory slot that
        is recycled when the next item is requested — consume (pack/copy)
        each item before advancing, as StreamingReviser does.
        """
        if self._pool is None:
            _pool_init(self.group, self.subgroup)
            for fn in fns:
                prepped, err = _pool_prep_one(os.path.join(base_dir, fn))
                yield fn, prepped, err
            return
        layout = slot_layout(self.slot_bases, self.slot_samples)
        free = collections.deque(range(len(self._slot_paths)))
        queue: collections.deque = collections.deque()

        def submit(chunk_fns):
            slots, paths = [], []
            for _ in chunk_fns:
                s = free.popleft() if free else -1
                slots.append(s)
                paths.append(self._slot_paths[s] if s >= 0 else None)
            fut = self._pool.apply_async(
                _pool_prep_chunk,
                ([os.path.join(base_dir, fn) for fn in chunk_fns], paths,
                 self.slot_bases, self.slot_samples),
            )
            queue.append((chunk_fns, slots, fut))

        def emit(chunk_fns, slots, fut):
            for (fn, slot, (small, err)) in zip(chunk_fns, slots, fut.get()):
                if err is not None:
                    prepped = None
                elif isinstance(small, WireRead):
                    prepped = small        # pickle-transport fallback
                else:
                    (n, m, shift, scale, bases, first_val, last_val,
                     pos0_first, pos0_last, ne, nd, nv, nc) = small
                    v = _slot_views(
                        self._slot_maps[slot], layout, n, m,
                        counts=(ne, nd, nv, nc))
                    prepped = WireRead(
                        bases=bases, sig8=v["sig8"],
                        sig_esc_idx=v["sig_esc_idx"],
                        sig_esc_delta=v["sig_esc_delta"],
                        posd=v["posd"],
                        vlen_esc_idx=v["vlen_esc_idx"],
                        vlen_esc_val=v["vlen_esc_val"],
                        dur_esc_idx=v["dur_esc_idx"],
                        dur_esc_f32=v["dur_esc_f32"],
                        col_esc_idx=v["col_esc_idx"],
                        codes=v["codes"], evf=v["evf"],
                        first_val=first_val, last_val=last_val,
                        pos0_first=pos0_first, pos0_last=pos0_last,
                        shift=shift, scale=scale,
                    )
                yield fn, prepped, err
                if slot >= 0:
                    free.append(slot)      # recycled once the caller advances

        pending_fns: list = []
        max_chunks = max(2, prefetch // max(self.chunk, 1))
        for fn in fns:
            pending_fns.append(fn)
            if len(pending_fns) >= self.chunk:
                submit(pending_fns)
                pending_fns = []
            if len(queue) >= max_chunks or len(free) < self.chunk:
                yield from emit(*queue.popleft())
        if pending_fns:
            submit(pending_fns)
        while queue:
            yield from emit(*queue.popleft())

    def close(self) -> None:
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None
        self._slot_maps = []
        for path in self._slot_paths:
            try:
                os.unlink(path)
            except OSError:
                pass
        self._slot_paths = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
