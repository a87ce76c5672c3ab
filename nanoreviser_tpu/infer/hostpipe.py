"""Host ingestion pipeline: fast5 decode + per-read prep on worker processes.

The 2-core host is the pipeline's second bottleneck after the device: fast5
decode is ~4 ms/read of h5py/HDF5 work that does NOT release the GIL, so
host threads cannot scale it — worker *processes* can. Each worker runs
signal.host_prep.prep_fast5 (decode -> int16 window gather -> exact f64
moments -> f16 features) and ships the compact PreppedRead (~1.5 MB) back;
the main process only packs batch buffers, merges revisions, and writes.

Workers use the "spawn" start method: the parent holds a live TPU client
whose runtime threads and locks do not survive fork. Spawn costs ~1-2 s per
worker once at startup, amortized over the stream; the worker entrypoints
live in signal.host_prep so unpickling them never imports jax.

Submission is bounded (``prefetch``): a plain Pool.imap would buffer every
result in an unbounded queue whenever the consumer is slower, holding
gigabytes of prepped reads for large directories.

Contract: results yield in input order as (name, prepped_or_None,
error_or_None) — per-read failures carry the exception message so the
caller can apply the reference's degradation contract
(NanoReviser.py:146-154).
"""

from __future__ import annotations

import collections
import multiprocessing as mp
import os

from ..signal.host_prep import _pool_init, _pool_prep_one


class PrepPool:
    """Ordered, bounded fan-out of prep_fast5 over worker processes.

    n_workers=0 preps inline on the calling thread (tests, chipless CI).
    """

    def __init__(
        self,
        n_workers: int | None = None,
        basecall_group: str = "Basecall_1D_000",
        basecall_subgroup: str = "BaseCalled_template",
    ):
        if n_workers is None:
            n_workers = max(1, os.cpu_count() or 1)
        self.n_workers = n_workers
        self.group = basecall_group
        self.subgroup = basecall_subgroup
        self._pool = None
        if n_workers > 0:
            ctx = mp.get_context("spawn")
            self._pool = ctx.Pool(
                n_workers, initializer=_pool_init,
                initargs=(basecall_group, basecall_subgroup),
            )

    def stream(self, base_dir: str, fns, prefetch: int = 48):
        """Yields (fn, prepped_or_None, error_str_or_None) in input order."""
        if self._pool is None:
            _pool_init(self.group, self.subgroup)
            for fn in fns:
                prepped, err = _pool_prep_one(os.path.join(base_dir, fn))
                yield fn, prepped, err
            return
        queue: collections.deque = collections.deque()
        for fn in fns:
            queue.append(
                (fn, self._pool.apply_async(
                    _pool_prep_one, (os.path.join(base_dir, fn),)
                ))
            )
            if len(queue) >= prefetch:
                name, fut = queue.popleft()
                prepped, err = fut.get()
                yield name, prepped, err
        while queue:
            name, fut = queue.popleft()
            prepped, err = fut.get()
            yield name, prepped, err

    def close(self) -> None:
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
