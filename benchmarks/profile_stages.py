#!/usr/bin/env python
"""Stage-level profile of the streaming inference pipeline.

Times each stage of the production path independently on the 100-read
training set so optimization effort goes at the actual bottleneck:
  decode    host fast5 -> ReadData (1 and 2 threads)
  mad       host int16-histogram medians
  assemble  packing reads into fixed-shape batch buffers
  h2d       device_put of the batch buffers
  device    the jitted preprocess+kernel program, warm (block_until_ready)
  d2h       fetching the packed labels
  merge     vectorized revision merge per read
  e2e       engine.revise_stream end to end
"""

import concurrent.futures as cf
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_DIR = "/root/reference/unitest/training_data/fast5"
MODEL1 = "/root/reference/model/ecoli/ecoli_win13_50ep_model1.h5"
MODEL2 = "/root/reference/model/ecoli/ecoli_win13_50ep_model2.h5"


def main():
    import jax

    from nanoreviser_tpu.infer import StreamingReviser
    from nanoreviser_tpu.infer.merge import merge_revision
    from nanoreviser_tpu.io import get_read_data, list_fast5_files

    fns = list_fast5_files(TRAIN_DIR)
    print(f"{len(fns)} reads")

    t0 = time.time()
    reads = [(fn, get_read_data(os.path.join(TRAIN_DIR, fn))) for fn in fns]
    t_decode1 = time.time() - t0
    print(f"decode 1-thread: {t_decode1:.3f}s  ({t_decode1/len(fns)*1e3:.1f} ms/read)")

    with cf.ThreadPoolExecutor(max_workers=2) as pool:
        t0 = time.time()
        list(pool.map(lambda fn: get_read_data(os.path.join(TRAIN_DIR, fn)), fns))
        t_decode2 = time.time() - t0
    print(f"decode 2-thread: {t_decode2:.3f}s")

    engine = StreamingReviser(MODEL1, MODEL2)

    # assemble all batches up front
    t0 = time.time()
    batches = []
    b = engine._new_batch()
    for name, rd in reads:
        if not engine._add_read(b, name, rd):
            engine._finalize(b)
            batches.append(b)
            b = engine._new_batch()
            assert engine._add_read(b, name, rd)
    if b.meta:
        engine._finalize(b)
        batches.append(b)
    t_asm = time.time() - t0
    print(f"assemble: {t_asm:.3f}s  ({len(batches)} batches)")

    bufs = [np.stack([bt.buf]) for bt in batches]

    # h2d
    for _ in range(2):
        t0 = time.time()
        dev_bufs = [
            jax.device_put(bf, engine._buf_sharding) for bf in bufs
        ]
        jax.block_until_ready(dev_bufs)
        t_h2d = time.time() - t0
    mb = sum(bf.nbytes for bf in bufs) / 1e6
    print(f"h2d: {t_h2d:.3f}s  ({mb:.1f} MB, {mb/t_h2d:.0f} MB/s)")

    # device compute, warm
    outs = [engine._fn(engine._ws, db) for db in dev_bufs]
    jax.block_until_ready(outs)
    t0 = time.time()
    outs = [engine._fn(engine._ws, db) for db in dev_bufs]
    jax.block_until_ready(outs)
    t_dev = time.time() - t0
    print(f"device (warm): {t_dev:.3f}s  ({t_dev/len(batches)*1e3:.1f} ms/batch)")

    # d2h
    t0 = time.time()
    host_outs = [np.asarray(o) for o in outs]
    t_d2h = time.time() - t0
    mb_out = sum(h.nbytes for h in host_outs) / 1e6
    print(f"d2h: {t_d2h:.3f}s  ({mb_out:.2f} MB)")

    # merge
    t = engine.window
    t0 = time.time()
    n_m = 0
    for bt, packed_all in zip(batches, host_outs):
        packed = packed_all[0]
        for name, rd, r0 in bt.meta:
            wr = max(rd.n_bases - t, 0)
            pk = packed[r0 : r0 + wr]
            y1 = (pk >> 3).astype(np.int32)
            y2 = (pk & 7).astype(np.int32)
            merge_revision(rd.bases, y1, y2, align=engine.align, window=t)
            n_m += 1
    t_merge = time.time() - t0
    print(f"merge: {t_merge:.3f}s  ({t_merge/n_m*1e3:.1f} ms/read)")

    # end-to-end warm (reads pre-decoded => isolates engine pipeline)
    for rep in range(2):
        t0 = time.time()
        errors = []
        n = sum(1 for _ in engine.revise_stream(iter(reads), errors=errors))
        t_e2e = time.time() - t0
        assert not errors, errors[:2]
    print(f"e2e (pre-decoded reads): {t_e2e:.3f}s  "
          f"({len(fns)/t_e2e:.1f} reads/s)")

    print(json.dumps({
        "decode1_s": round(t_decode1, 3), "decode2_s": round(t_decode2, 3),
        "assemble_s": round(t_asm, 3), "h2d_s": round(t_h2d, 3),
        "device_s": round(t_dev, 3), "d2h_s": round(t_d2h, 3),
        "merge_s": round(t_merge, 3), "e2e_s": round(t_e2e, 3),
        "n_batches": len(batches),
    }))


if __name__ == "__main__":
    main()
