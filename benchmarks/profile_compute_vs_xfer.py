#!/usr/bin/env python
"""Split per-batch fetch-wait into device-compute vs d2h-transfer on axon."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_DIR = "/root/reference/unitest/training_data/fast5"
MODEL1 = "/root/reference/model/ecoli/ecoli_win13_50ep_model1.h5"
MODEL2 = "/root/reference/model/ecoli/ecoli_win13_50ep_model2.h5"

P = lambda *a: print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.io import get_read_data, list_fast5_files

    engine = StreamingReviser(MODEL1, MODEL2)
    fns = list_fast5_files(TRAIN_DIR)[:20]
    reads = [(fn, get_read_data(os.path.join(TRAIN_DIR, fn))) for fn in fns]
    b = engine._new_batch()
    for name, rd in reads:
        if not engine._add_read(b, name, rd):
            break
    engine._finalize(b)
    P(f"batch: {len(b.meta)} reads, {b.rows} rows")
    bufs = np.stack([b.buf])

    db = jax.device_put(bufs, engine._buf_sharding)
    _ = np.asarray(engine._fn(engine._ws, db))   # compile + warm
    P("warm")

    # full pipeline per batch: upload + dispatch + fetch
    for rep in range(4):
        t0 = time.perf_counter()
        db = jax.device_put(bufs, engine._buf_sharding)
        t1 = time.perf_counter()
        out = engine._fn(engine._ws, db)
        t2 = time.perf_counter()
        host = np.asarray(out)
        t3 = time.perf_counter()
        P(f"rep{rep}: h2d={1e3*(t1-t0):.1f} dispatch={1e3*(t2-t1):.1f} "
          f"fetch={1e3*(t3-t2):.1f} total={1e3*(t3-t0):.1f} ms "
          f"out={host.nbytes//1024}KB")

    # transfer-only: fetch a precomputed same-spec array repeatedly
    out = engine._fn(engine._ws, db)
    _ = np.asarray(out)
    for rep in range(3):
        t0 = time.perf_counter()
        host = np.asarray(jnp.add(out, np.uint8(0)))  # force fresh buffer, ~0 compute
        P(f"xfer-only rep{rep}: {1e3*(time.perf_counter()-t0):.1f} ms")

    # compute-only: same program but fetch a 1-element reduction
    def reduced(ws, bufs):
        return engine._device_fn(ws, bufs[0]).sum()

    rfn = jax.jit(reduced)
    _ = np.asarray(rfn(engine._ws, db))
    for rep in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(rfn(engine._ws, db))
        P(f"compute-only rep{rep}: {1e3*(time.perf_counter()-t0):.1f} ms")


if __name__ == "__main__":
    main()
