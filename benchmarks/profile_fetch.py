#!/usr/bin/env python
"""Isolate device-execution and d2h-fetch timing on the axon tunnel."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

UNITEST_DIR = "/root/reference/unitest/test_data/fast5"
MODEL1 = "/root/reference/model/ecoli/ecoli_win13_50ep_model1.h5"
MODEL2 = "/root/reference/model/ecoli/ecoli_win13_50ep_model2.h5"


def main():
    import jax

    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.io import get_read_data, list_fast5_files

    engine = StreamingReviser(MODEL1, MODEL2)
    fns = list_fast5_files(UNITEST_DIR)
    reads = [(fn, get_read_data(os.path.join(UNITEST_DIR, fn))) for fn in fns]

    b = engine._new_batch()
    for name, rd in reads:
        assert engine._add_read(b, name, rd)
    engine._finalize(b)
    bufs = np.stack([b.buf])

    db = jax.device_put(bufs, engine._buf_sharding)
    jax.block_until_ready(db)

    # warm-up (compile)
    t0 = time.time()
    out = engine._fn(engine._ws, db)
    print(f"dispatch(cold): {time.time()-t0:.3f}s")
    t0 = time.time()
    jax.block_until_ready(out)
    print(f"block(cold): {time.time()-t0:.3f}s")

    for rep in range(3):
        t0 = time.time()
        out = engine._fn(engine._ws, db)
        t_disp = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(out)
        t_block = time.time() - t0
        t0 = time.time()
        out.copy_to_host_async()
        t_async = time.time() - t0
        t0 = time.time()
        host = np.asarray(out)
        t_np = time.time() - t0
        print(f"rep{rep}: dispatch={t_disp*1e3:.1f}ms block={t_block*1e3:.1f}ms "
              f"copy_async={t_async*1e3:.1f}ms np.asarray={t_np*1e3:.1f}ms "
              f"out={host.nbytes/1e3:.0f}KB")

    # fetch WITHOUT block_until_ready first (engine's fetch-thread pattern)
    for rep in range(3):
        t0 = time.time()
        out = engine._fn(engine._ws, db)
        out.copy_to_host_async()
        host = np.asarray(out)
        print(f"pipelined rep{rep}: dispatch+fetch={1e3*(time.time()-t0):.1f}ms")


if __name__ == "__main__":
    main()
