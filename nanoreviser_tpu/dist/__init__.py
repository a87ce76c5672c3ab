"""Multi-host distribution: jax.distributed + deterministic work sharding.

The reference has no distribution story at all — its only parallelism is a
single-host multiprocessing.Pool (reference NanoReviser.py:203-223). Here:

* ``initialize(...)`` wires ``jax.distributed`` so N host processes (each
  owning its local TPU chips) form one global device mesh; gradients ride
  ICI within a slice and DCN across hosts via ordinary sharding propagation.
* inference work is sharded by FILE: ``shard_files`` gives every process a
  deterministic, disjoint, size-balanced subset; per-read outputs never
  collide, and the optional single-file merge (``write_merged_part`` +
  ``merge_parts``) is shard-ordered and therefore byte-deterministic
  regardless of completion order.
* training batches are built identically on every process (same corpus,
  same seed); ``distribute_batch`` donates each process's slice of the
  global batch via ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import os
import time


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when multi-process flags/env are present.

    Returns True when running multi-process. Arguments fall back to
    NANOREV_COORDINATOR / NANOREV_NUM_PROCESSES / NANOREV_PROCESS_ID, then
    to JAX's own auto-detection env (JAX_COORDINATOR_ADDRESS etc.).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "NANOREV_COORDINATOR"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("NANOREV_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("NANOREV_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if not coordinator_address or not num_processes or num_processes <= 1:
        return False

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) when not distributed."""
    import jax

    return jax.process_index(), jax.process_count()


def barrier(name: str) -> None:
    """Block until every process reaches this point (no-op single-process).

    Used between rank-sharded host work (e.g. preprocessing writes to a
    shared FS) and the phase that consumes every rank's output."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def shard_files(
    fns: list[str], process_index: int, process_count: int
) -> list[str]:
    """Deterministic disjoint shard of a sorted file list.

    CONTIGUOUS slices of the sorted order (extra files go to the first
    shards), so concatenating per-shard outputs in shard order reproduces
    the global sorted order — merge_parts output is then byte-identical to
    a single-process run. Every file is assigned to exactly one process
    (unlike the reference, which silently drops the n mod pool_size
    remainder, NanoReviser.py:212-219).
    """
    fns = sorted(fns)
    n, w, k = len(fns), process_count, process_index
    base, extra = divmod(n, w)
    start = k * base + min(k, extra)
    return fns[start : start + base + (1 if k < extra else 0)]


# ----------------------------------------------------- ordered output merge


def write_merged_part(
    out_dir: str, process_index: int, records: list[tuple[str, str]]
) -> str:
    """Write this shard's (header, body)s as ``merged.part<k>`` + done marker.

    ``records`` must be in this shard's deterministic (sorted-name) order;
    the global merge is then independent of host completion order.
    """
    part_fn = os.path.join(out_dir, f"merged.part{process_index:05d}")
    tmp = part_fn + ".tmp"
    with open(tmp, "w") as fp:
        for header, body in records:
            fp.write(header + "\n" + body + "\n")
    os.replace(tmp, part_fn)
    with open(part_fn + ".done", "w") as fp:
        fp.write("ok\n")
    return part_fn


def merge_parts(
    out_dir: str, merged_fn: str, process_count: int, timeout_s: float = 600.0
) -> str:
    """Process 0: await every shard's part over the shared FS, concatenate
    in shard order, remove the parts. Deterministic: shard k's records come
    from the k-th CONTIGUOUS slice of the sorted file list (shard_files), so
    the merged output is byte-identical to a single-process run."""
    parts = [
        os.path.join(out_dir, f"merged.part{k:05d}")
        for k in range(process_count)
    ]
    deadline = time.time() + timeout_s
    for part in parts:
        while not os.path.exists(part + ".done"):
            if time.time() > deadline:
                raise TimeoutError(f"missing shard output {part}")
            time.sleep(0.2)
    tmp = merged_fn + ".tmp"
    with open(tmp, "w") as out:
        for part in parts:
            with open(part) as fp:
                out.write(fp.read())
    os.replace(tmp, merged_fn)
    for part in parts:
        os.remove(part)
        os.remove(part + ".done")
    return merged_fn


# ------------------------------------------------------- batch distribution


def distribute_batch(mesh, batch: dict):
    """Host-local numpy batch dict -> global dp-sharded jax.Arrays.

    Single-process: a plain device_put with the dp sharding. Multi-process:
    every process passes ITS slice of the global batch (batch size =
    global_batch / process_count per process) and the result is one global
    array spanning all hosts' devices.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("dp"))
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }


def local_batch_slice(batch: dict, process_index: int, process_count: int):
    """The slice of a globally-constructed batch owned by this process."""
    out = {}
    for k, v in batch.items():
        n = len(v)
        per = n // process_count
        out[k] = v[process_index * per : (process_index + 1) * per]
    return out
